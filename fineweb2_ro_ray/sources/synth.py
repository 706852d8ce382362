"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Emits a Parquet table of multi-turn transcripts ``(conv_id, turn_idx,
role, text, tool, ts)`` whose every value derives from ``(seed, conv
index, turn index)`` — regeneration is byte-stable.  The text mixture
exercises every engine rule: Romanian-like stopword-rich text (keep
path), English (LID negative), gibberish / high-symbol lines, repeated
line blocks (dup-line rule), very long turns (wide-row path), planted
checksum-valid AND near-miss-invalid PII (emails, RO phones, IBANs,
CNPs) and toxicity terms.

Mirrors the reference's test-data philosophy — deterministic,
index-designated slices, no external data (``/root/reference/training/
shard_loader.py:8-10``, ``fineweb/small_dataset_gen.py:13-78``) — but as
a seeded generator rather than frozen downloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.pii import cnp_control_digit, iban_make_valid
from ..schema import TRANSCRIPT_SCHEMA

# Romanian-ish vocabulary: heavy on genuine Romanian stopwords so the
# stopword-ratio rule and LID profiles have signal.
RO_WORDS = (
    "și de la cu pentru este sunt care nu se în pe un o ce mai din ale "
    "acest aceasta dar fi fost avea face timp zi an oameni lume țară oraș "
    "casă apă foc munte carte limbă frumos mare mic bun rău repede încet "
    "astăzi mâine ieri noi voi ei ele eu tu el ea datele modelul sistemul "
    "procesul rezultatul întrebarea răspunsul conversația agentul utilizatorul"
).split()

EN_WORDS = (
    "the of and a to in is you that it he was for on are as with his they "
    "I at be this have from or one had by word but not what all were we "
    "when your can said there use an each which she do how their if will"
).split()

TOX_TERMS = ["prostule", "idiotule", "naibii", "dracului", "tâmpitule"]

GIBBERISH_CHARS = list("qwxzkjv#$%^&*()[]{}<>|\\~`@!?;:")

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["search", "calculator", "browser", "code_exec", "db_query"]

BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

# Turn-type mixture (cumulative probabilities).
_TYPES = [
    ("clean_ro", 0.46),
    ("clean_ro_pii", 0.10),
    ("clean_ro_tox", 0.05),
    ("english", 0.10),
    ("gibberish", 0.08),
    ("dup_lines", 0.08),
    ("short", 0.06),
    ("mixed", 0.06),
    ("long", 0.01),
]
_CUM = np.cumsum([p for _, p in _TYPES])


def _word_list(rng: np.random.Generator, vocab: list[str], n: int) -> list[str]:
    idx = rng.integers(0, len(vocab), size=n)
    return [vocab[i] for i in idx]


def _words(rng: np.random.Generator, vocab: list[str], n: int) -> str:
    return " ".join(_word_list(rng, vocab, n))


def _sentenceize_words(rng: np.random.Generator, words: list[str]) -> str:
    out, i = [], 0
    while i < len(words):
        n = int(rng.integers(5, 14))
        chunk = words[i : i + n]
        if chunk:
            chunk[0] = chunk[0].capitalize()
            out.append(" ".join(chunk) + ".")
        i += n
    return " ".join(out)


def _sentenceize(rng: np.random.Generator, body: str) -> str:
    return _sentenceize_words(rng, body.split())


def _gen_pii(rng: np.random.Generator) -> str:
    """One planted PII sentence; ~1/4 of identifiers are near-miss invalid."""
    kind = int(rng.integers(0, 4))
    invalid = rng.random() < 0.25
    if kind == 0:
        user = _words(rng, RO_WORDS, 1).replace(" ", "")
        dom = ["example.com", "mail.ro", "firma.ro", "test.org"][int(rng.integers(0, 4))]
        return f"Contact email: {user}{int(rng.integers(0, 999))}@{dom}"
    if kind == 1:
        num = rng.integers(0, 10, size=8)
        digits = "".join(str(d) for d in num)
        fmt = int(rng.integers(0, 3))
        if fmt == 0:
            p = f"+40 7{digits[0]}{digits[1]} {digits[2:5]} {digits[5:8]}"
        elif fmt == 1:
            p = f"07{digits[0]}{digits[1]}{digits[2:8]}"
        else:
            p = f"0040 7{digits[0]}{digits[1]} {digits[2:5]} {digits[5:8]}"
        if invalid:
            p = p.replace("7", "5", 1)  # not a mobile prefix -> no match
        return f"Telefon: {p}"
    if kind == 2:
        bank = "".join("ABCDEFGHIJKLMNOP"[i] for i in rng.integers(0, 16, size=4))
        acct = "".join(str(d) for d in rng.integers(0, 10, size=16))
        iban = iban_make_valid(bank, acct)
        if invalid:
            # break the check digits -> regex matches, checksum fails
            bad = (int(iban[2:4]) + 1) % 100
            iban = f"RO{bad:02d}{iban[4:]}"
        return f"Cont bancar: {iban}"
    first12 = "1" + "".join(str(d) for d in rng.integers(0, 10, size=11))
    cnp = first12 + cnp_control_digit(first12)
    if invalid:
        cnp = first12 + str((int(cnp[12]) + 1) % 10)
    return f"CNP: {cnp}"


def _turn_text(rng: np.random.Generator, ttype: str) -> str:
    if ttype in ("clean_ro", "clean_ro_pii", "clean_ro_tox"):
        body = _sentenceize_words(rng, _word_list(rng, RO_WORDS, int(rng.integers(20, 80))))
        if ttype == "clean_ro_pii":
            parts = [body] + [_gen_pii(rng) for _ in range(int(rng.integers(1, 4)))]
            body = " ".join(parts)
        elif ttype == "clean_ro_tox":
            tox = TOX_TERMS[int(rng.integers(0, len(TOX_TERMS)))]
            words = body.split()
            pos = int(rng.integers(0, len(words)))
            body = " ".join(words[:pos] + [tox] + words[pos:])
        return body
    if ttype == "english":
        return _sentenceize_words(rng, _word_list(rng, EN_WORDS, int(rng.integers(20, 60))))
    if ttype == "gibberish":
        n = int(rng.integers(30, 120))
        chars = rng.integers(0, len(GIBBERISH_CHARS), size=n)
        return "".join(GIBBERISH_CHARS[c] for c in chars)
    if ttype == "dup_lines":
        line = _sentenceize_words(rng, _word_list(rng, RO_WORDS, int(rng.integers(4, 9))))
        uniq = _sentenceize_words(rng, _word_list(rng, RO_WORDS, int(rng.integers(4, 9))))
        reps = int(rng.integers(3, 8))
        return "\n".join([uniq] + [line] * reps)
    if ttype == "short":
        return _words(rng, RO_WORDS, int(rng.integers(1, 3)))
    if ttype == "mixed":
        ro = _words(rng, RO_WORDS, int(rng.integers(10, 25)))
        en = _words(rng, EN_WORDS, int(rng.integers(10, 25)))
        return _sentenceize(rng, ro + " " + en)
    if ttype == "long":
        # wide-row path: >=32k chars in one turn
        body = _sentenceize_words(rng, _word_list(rng, RO_WORDS, 6000))
        return body
    raise ValueError(ttype)


def _conv_sizes(rng: np.random.Generator, n_convs: int) -> np.ndarray:
    """Skewed (Zipf-like) turn counts; first few conversations are hot
    (100-1000x the median) to exercise salting / block-size handling."""
    sizes = 2 + rng.geometric(0.25, size=n_convs)
    if n_convs >= 50:
        hot = [1000, 2500, 600]
        for i, h in enumerate(hot[: max(1, n_convs // 100)]):
            sizes[i] = h
    return sizes.astype(np.int64)


def _gen_range(
    seed: int, sizes: np.ndarray, ci_start: int, ci_end: int
) -> dict[str, list]:
    """Generate conversations [ci_start, ci_end). One rng stream per
    CONVERSATION (seeded ``[seed, ci]``) with a fixed per-turn draw
    order — every value still derives deterministically from
    (seed, conv index, turn index) but without the per-turn
    SeedSequence cost (~30x faster generation)."""
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []
    for ci in range(ci_start, ci_end):
        cid = f"conv-{ci:08d}"
        rng = np.random.default_rng([seed, ci])
        n_turns = int(sizes[ci])
        for ti in range(n_turns):
            if ti == 0 and rng.random() < 0.3:
                role = "system"
            elif rng.random() < 0.08:
                role = "tool"
            else:
                role = "user" if ti % 2 == 0 else "assistant"
            u = rng.random()
            ttype = _TYPES[int(np.searchsorted(_CUM, u))][0]
            text = _turn_text(rng, ttype)
            conv_ids.append(cid)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(text)
            tools.append(TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else "")
            tss.append(BASE_TS_US + ci * 3_600_000_000 + ti * 7_000_000)
    return {
        "conv_id": conv_ids,
        "turn_idx": turn_idxs,
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": tss,
    }


def gen_transcripts(n_convs: int, seed: int = 42, shuffle: bool = True) -> pa.Table:
    """Generate a deterministic transcript table. Row order is shuffled
    (seeded) so stable ``(conv_id, turn_idx)`` re-ordering is actually
    exercised downstream."""
    top = np.random.default_rng(seed)
    sizes = _conv_sizes(top, n_convs)
    cols = _gen_range(seed, sizes, 0, n_convs)
    conv_ids, turn_idxs, roles = cols["conv_id"], cols["turn_idx"], cols["role"]
    texts, tools, tss = cols["text"], cols["tool"], cols["ts"]

    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    if shuffle:
        perm = np.random.default_rng(seed + 1).permutation(table.num_rows)
        table = table.take(pa.array(perm))
    return table


def _write_chunk(args: tuple) -> int:
    """Generate + write one chunk file (top-level → picklable for
    ProcessPoolExecutor). Deterministic given (seed, chunk bounds)."""
    import os

    import pyarrow.parquet as pq

    seed, n_convs, ci_start, ci_end, file_idx, path = args
    sizes = _conv_sizes(np.random.default_rng(seed), n_convs)
    cols = _gen_range(seed, sizes, ci_start, ci_end)
    table = pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    perm = np.random.default_rng(seed + 1 + file_idx).permutation(table.num_rows)
    table = table.take(pa.array(perm))
    # small row groups => Ray's parquet reader can split each file
    # into many blocks (read parallelism at any file count)
    pq.write_table(
        table, os.path.join(path, f"part-{file_idx:05d}.parquet"), row_group_size=4096
    )
    return table.num_rows


def write_transcripts(
    path: str,
    n_convs: int,
    seed: int = 42,
    rows_per_file: int = 50_000,
    procs: int = 1,
) -> int:
    """Write the synthetic table as a multi-file Parquet dataset (so Ray
    gets file-level read parallelism). Conversations are generated in
    bounded chunks (memory stays flat at any corpus size); rows are
    shuffled within each chunk; ``procs > 1`` generates chunks in
    parallel processes (byte-identical output regardless of ``procs``).
    Returns total rows."""
    import os

    os.makedirs(path, exist_ok=True)
    sizes = _conv_sizes(np.random.default_rng(seed), n_convs)
    # chunk conversations so each file lands near rows_per_file rows
    mean_sz = max(1.0, float(sizes.mean()))
    convs_per_chunk = max(1, int(rows_per_file / mean_sz))
    jobs = []
    file_idx = 0
    for ci in range(0, n_convs, convs_per_chunk):
        jobs.append((seed, n_convs, ci, min(n_convs, ci + convs_per_chunk), file_idx, path))
        file_idx += 1
    if procs <= 1 or len(jobs) < 2:
        return sum(_write_chunk(j) for j in jobs)
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(max_workers=procs) as ex:
        return sum(ex.map(_write_chunk, jobs))
