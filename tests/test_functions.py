"""Unit tests for the per-turn scalar functions — hand-computed
expectations (SURVEY.md §7.3 step 2) plus oracle parity on the frozen
unit fixture."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fineweb2_ro_ray.functions.decide import FilterConfig, decide_batch
from fineweb2_ro_ray.functions.lid import lang_id_batch
from fineweb2_ro_ray.functions.perplexity import perplexity_batch
from fineweb2_ro_ray.functions.pii import (
    cnp_control_digit,
    cnp_valid,
    iban_make_valid,
    iban_valid,
)
from fineweb2_ro_ray.functions.scrub import Scrubber, scrub_text
from fineweb2_ro_ray.functions.textstats import compute_text_stats
from fineweb2_ro_ray.oracle import label_table

PARITY_EXACT = [
    "n_chars",
    "n_words",
    "n_lines",
    "mean_word_len",
    "max_word_len",
    "stopword_ratio",
    "symbol_ratio",
    "dup_line_frac",
    "lang",
    "lang_score",
    "scrubbed_text",
    "pii_hits",
    "tox_hits",
    "keep",
    "drop_reason",
]


def _mini(texts, roles=None):
    n = len(texts)
    return pa.table(
        {
            "conv_id": ["c"] * n,
            "turn_idx": pa.array(range(n), pa.int32()),
            "role": roles or ["user"] * n,
            "text": texts,
            "tool": [""] * n,
            "ts": pa.array([0] * n, pa.timestamp("us")),
        }
    )


def test_textstats_hand_computed():
    t = compute_text_stats(_mini(["ana are mere.", "", "a\nb b\nb\n", "x!y?z"]))
    assert t["n_chars"].to_pylist() == [13, 0, 8, 5]
    assert t["n_words"].to_pylist() == [3, 0, 4, 1]
    assert t["n_lines"].to_pylist() == [1, 1, 4, 1]
    assert t["max_word_len"].to_pylist() == [5, 0, 1, 5]
    assert t["mean_word_len"].to_pylist() == [11 / 3, 0.0, 1.0, 5.0]
    # "a\nb b\nb\n" -> lines [a, b b, b] distinct 3 of 3 -> 0.0
    assert t["dup_line_frac"].to_pylist() == [0.0, 0.0, 0.0, 0.0]
    assert t["symbol_ratio"].to_pylist() == [1 / 13, 0.0, 0.0, 2 / 5]


def test_dup_lines():
    txt = "unu doi\nunu doi\nunu doi\ntrei"
    t = compute_text_stats(_mini([txt]))
    assert t["dup_line_frac"].to_pylist() == [(4 - 2) / 4]


def test_stopword_ratio_punct_stripping():
    # "și," strips to stopword; "Și." lowercases+strips
    t = compute_text_stats(_mini(["și, Și. carte"]))
    assert t["stopword_ratio"].to_pylist() == [2 / 3]


def test_lid_basic():
    t = lang_id_batch(
        _mini(
            [
                "și de la cu pentru este cartof",
                "the of and to in is you that",
                "#### $$$$ %%%%",
                "",
            ]
        )
    )
    assert t["lang"].to_pylist() == ["ro", "en", "und", "und"]
    assert t["lang_score"].to_pylist()[0] == 6 / 7
    assert t["lang_score"].to_pylist()[2:] == [0.0, 0.0]


def test_perplexity_ro_lower_than_gibberish():
    t = perplexity_batch(
        _mini(["și de la cu pentru este sunt care nu se în pe", "#@!~|\\^qzx#@!~|\\^qzx", "a", ""])
    )
    ppl = t["ppl"].to_pylist()
    assert ppl[0] < ppl[1]
    assert ppl[2] == 0.0 and ppl[3] == 0.0


def test_perplexity_deterministic_across_batching():
    texts = ["și de la cu", "the of and", "#@!", "ab", "", "casă apă foc munte"]
    one = perplexity_batch(_mini(texts))["ppl"].to_pylist()
    parts = []
    for i in range(len(texts)):
        parts += perplexity_batch(_mini(texts[i : i + 1]))["ppl"].to_pylist()
    assert one == parts  # bit-identical regardless of batch boundaries


def test_cnp_checksum():
    first12 = "193010112345"
    cnp = first12 + cnp_control_digit(first12)
    assert cnp_valid(cnp)
    bad = first12 + str((int(cnp[12]) + 1) % 10)
    assert not cnp_valid(bad)
    assert not cnp_valid("0930101123456")  # leading zero
    assert not cnp_valid("123")


def test_iban_checksum():
    iban = iban_make_valid("ABCD", "1234567890123456")
    assert iban_valid(iban)
    bad = "RO" + f"{(int(iban[2:4]) + 1) % 100:02d}" + iban[4:]
    assert not iban_valid(bad)


def test_scrub_exact():
    iban = iban_make_valid("BANK", "0000111122223333")
    first12 = "193010112345"
    cnp = first12 + cnp_control_digit(first12)
    bad_cnp = first12 + str((int(cnp[12]) + 1) % 10)
    s, pii, tox = scrub_text(
        f"mail a@b.ro tel +40 712 345 678 iban {iban} cnp {cnp} rau {bad_cnp} prostule"
    )
    assert s == "mail <EMAIL> tel <PHONE> iban <IBAN> cnp <CNP> rau " + bad_cnp + " <TOX>"
    assert pii == 4 and tox == 1


def test_scrub_invalid_iban_survives():
    iban = iban_make_valid("BANK", "0000111122223333")
    bad = "RO" + f"{(int(iban[2:4]) + 1) % 100:02d}" + iban[4:]
    s, pii, tox = scrub_text(f"cont {bad} ok")
    assert s == f"cont {bad} ok" and pii == 0


def test_scrub_phone_formats():
    for p in ["+40 712 345 678", "0712345678", "0040 712 345 678", "+40712345678"]:
        s, pii, _ = scrub_text(f"suna la {p} acum")
        assert s == "suna la <PHONE> acum", p
        assert pii == 1
    # non-mobile prefix is not scrubbed
    s, pii, _ = scrub_text("fix 0212345678 x")
    assert pii == 0


def test_decide_first_failure_order():
    cfg = FilterConfig()
    t = _mini(["x"])  # too short AND too few words -> min_chars wins
    t = compute_text_stats(t)
    t = lang_id_batch(t)
    t = perplexity_batch(t)
    t = Scrubber()(t)
    t = decide_batch(t, cfg)
    assert t["keep"].to_pylist() == [False]
    assert t["drop_reason"].to_pylist() == ["min_chars"]


def test_decide_tool_role_lang_exempt():
    cfg = FilterConfig()
    txt = "the of and to in is you that it he was for on are as with his they"
    t = _mini([txt, txt], roles=["user", "tool"])
    t = compute_text_stats(t)
    t = lang_id_batch(t)
    t = perplexity_batch(t)
    t = Scrubber()(t)
    t = decide_batch(t, cfg)
    assert t["drop_reason"].to_pylist()[0] == "lang"
    assert t["keep"].to_pylist()[1] is True


def test_oracle_parity_unit_fixture(unit_table):
    t = compute_text_stats(unit_table)
    t = lang_id_batch(t)
    t = perplexity_batch(t)
    t = Scrubber()(t)
    t = decide_batch(t, FilterConfig())
    eng = t.to_pylist()
    orc = label_table(unit_table.to_pylist())
    assert len(eng) == len(orc)
    for e, o in zip(eng, orc):
        for c in PARITY_EXACT:
            assert e[c] == o[c], (c, e["conv_id"], e["turn_idx"])
        assert np.isclose(e["ppl"], o["ppl"], rtol=1e-9), (e["ppl"], o["ppl"])


def test_phone_trigger_consistency():
    """ADVICE r1: every text scrub_text would alter MUST match the RE2
    fast-path trigger, or the Scrubber actor silently skips it. The
    'bare 0 + space' format ('0 722 ...') is the case that used to slip
    through: PHONE_RE is now tightened so it does not match either, and
    the batched Scrubber agrees byte-for-byte with scrub_text on every
    format."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fineweb2_ro_ray.functions.scrub import _TRIGGER_RE2, Scrubber, scrub_text

    cases = [
        "Suna-ma la 0 722 333 444 acum",   # bare 0 + space: NOT a phone
        "tel +40 722 333 444 ok",
        "tel +40722333444 ok",
        "tel 0040 722 333 444 ok",
        "tel 0040722333444 ok",
        "tel 0722 333 444 ok",
        "tel 0722.333.444 ok",
        "tel 0722-333-444 ok",
        "tel 0722333444 ok",
        "fara telefon deloc",
    ]
    batch = pa.table({"text": pa.array(cases, pa.string())})
    out = Scrubber()(batch)
    for i, t in enumerate(cases):
        exp_s, exp_p, exp_x = scrub_text(t)
        assert out["scrubbed_text"][i].as_py() == exp_s, t
        assert out["pii_hits"][i].as_py() == exp_p, t
        # any row the scrub would change must have fired the trigger
        if (exp_s, exp_p, exp_x) != (t, 0, 0):
            assert pc.match_substring_regex(
                pa.array([t]), _TRIGGER_RE2
            )[0].as_py(), t
    assert out["scrubbed_text"][0].as_py() == cases[0]  # untouched


def test_bpe_tokenizer_deterministic_and_consistent():
    """Vendored mini-BPE: training is deterministic, encode is stable,
    and token counts shrink (never grow) as merges apply."""
    from fineweb2_ro_ray.functions.bpe import BPETokenizer, load_merges, train_bpe

    texts = ["ana are mere", "ana are pere si mere", "merele anei"] * 5
    m1 = train_bpe(texts, 32)
    m2 = train_bpe(texts, 32)
    assert m1 == m2 and len(m1) > 0
    tok = BPETokenizer(m1)
    for t in texts:
        ids = tok.encode(t)
        assert tok.count(t) == len(ids)
        n_bytes = sum(len(w.encode()) for w in t.split())
        assert 0 < len(ids) <= n_bytes  # merges only compress
        assert tok.encode(t) == ids  # cache-stable

    # the committed merge table loads and is non-trivial
    committed = load_merges()
    assert len(committed) >= 256
    ct = BPETokenizer(committed)
    assert 0 < ct.count("salut ce mai faci") <= len("salutcemaifaci".encode())


def test_bpe_batch_stage_matches_scalar():
    """Actor batch path (dictionary-encode + bincount) must equal the
    scalar count for every row, at any batch size."""
    import ray.data as rd

    from fineweb2_ro_ray.functions.bpe import BPETokenizer
    from fineweb2_ro_ray.stages.tokenize import bpe_token_counts

    rng = __import__("numpy").random.default_rng(3)
    words = ["ana", "are", "mere", "pere", "salut", "lume", "buna", "ziua"]
    texts = [" ".join(rng.choice(words, size=rng.integers(0, 12))) for _ in range(500)]
    texts += ["", "   ", "un  dublu  spatiu", "diacritice țâșnit înșelător"]
    import pandas as pd

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    tok = BPETokenizer()
    expected = [tok.count(t) for t in texts]
    for bs in (7, 64, 4096):
        out = (
            bpe_token_counts(rd.from_pandas(df), batch_size=bs)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["n_bpe_tokens"].tolist() == expected, bs


def test_url_parse_edges():
    """URL parser: absent port/query, multi-label public suffix,
    unknown TLD (no regdom), and fully unparseable rows (all-null)."""
    import pyarrow as pa

    from fineweb2_ro_ray.functions.url import blocklist_mask, parse_urls

    t = parse_urls(
        pa.array(
            [
                "https://www.a-b.src3.co.uk:8443/x/y?q=1&r=2",
                "http://plain.com/",
                "https://noport.src.ro",
                "https://host.weirdtld/x",
                "not a url",
                None,
            ]
        )
    )
    assert t["scheme"].to_pylist() == ["https", "http", "https", "https", None, None]
    assert t["host"].to_pylist() == [
        "www.a-b.src3.co.uk", "plain.com", "noport.src.ro",
        "host.weirdtld", None, None,
    ]
    # absent port -> 0 (non-null int64 column, unparseable rows included)
    assert t["port"].to_pylist() == [8443, 0, 0, 0, 0, 0]
    assert t["path"].to_pylist() == ["/x/y", "/", None, "/x", None, None]
    assert t["qstring"].to_pylist() == ["q=1&r=2", None, None, None, None, None]
    # registered domain: label left of the LONGEST matching suffix;
    # unknown TLD and unparseable rows -> null
    assert t["regdom"].to_pylist() == [
        "src3.co.uk", "plain.com", "src.ro", None, None, None,
    ]

    # blocklist: hit dropped, miss kept, null regdom KEPT
    mask = blocklist_mask(t["regdom"], frozenset({"src3.co.uk"}))
    assert mask.to_pylist() == [False, True, True, True, True, True]


def test_html_extract_rules():
    """Each extraction rule against Python's own html.unescape +
    hand-computed expectations: block strips (script body containing
    quotes and a fake close tag), comment strip, tag strip, entity
    decode order (&amp; last), whitespace collapse + trim, NULLs."""
    from fineweb2_ro_ray.functions.html import (
        extract_text,
        extract_title,
    )

    html = pa.array(
        [
            "<p>a  b</p>",
            "<script>var q = '</p>'; if (1<2) {}</script>rest",
            "<style>p { x: 1; }</style>kept",
            "pre<!-- hidden\nlines -->post",
            "&amp;lt; stays &lt;literal&gt;",
            "  \t\n x \r ",
            None,
            "<div class='a' data-x='1>'>deep <b>bold</b></div>",
            "a&nbsp;b",
        ]
    )
    got = extract_text(html).to_pylist()
    assert got == [
        "a b",
        "rest",
        "kept",
        "pre post",
        "&lt; stays <literal>",
        "x",
        None,
        # RE2 <[^>]*> stops at the FIRST '>' (inside data-x) — the
        # documented literal-regex contract, same on the oracle side
        "'>deep bold",
        "a b",
    ]
    t = extract_title(
        pa.array(["<html><title>T1</title></html>", "<html>no title</html>", None])
    ).to_pylist()
    assert t == ["T1", None, None]


def test_html_build_roundtrip_multibyte():
    """Derived html → extraction recovers the body text (with the
    template's fixed prefix/suffix), incl. multibyte Romanian text and
    tab/newline collapse."""
    from fineweb2_ro_ray.functions.html import build_html, extract_docs

    b = pa.table(
        {
            "doc_id": [7],
            "lang": ["ro"],
            "source": ["cc"],
            "text": ["ară\tși\n\nmănâncă"],
        }
    )
    out = extract_docs(b.append_column("html", build_html(b))).to_pylist()[0]
    assert out["title"] == "doc 7"
    assert out["text_clean"] == "doc 7 ro & cc ară și mănâncă <tag> \"q\" 'a'"
    assert out["n_clean"] == len(out["text_clean"])


def test_extract_links_edges():
    from fineweb2_ro_ray.functions.html import extract_links

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "html": [
                '<a href="u1">x</a><a href="u2">y</a>',  # two links
                '<a href="unclosed',                      # no closing quote
                "no links here",
                None,
            ],
        }
    )
    got = extract_links(t).to_pylist()
    assert got == [
        {"doc_id": 1, "href": "u1"},
        {"doc_id": 1, "href": "u2"},
    ]
    # all-empty batch
    empty = extract_links(
        pa.table({"doc_id": pa.array([], pa.int64()), "html": pa.array([], pa.string())})
    )
    assert empty.num_rows == 0 and empty.schema.names == ["doc_id", "href"]


def test_script_census_multiscript():
    """Cyrillic/Greek/CJK counting, argmax first-wins ties, no-signal
    and NULL rows, and the consistency mask — plus a DuckDB re-run of
    the oracle expressions on the same multiscript rows (the sf corpus
    is ASCII-only, so the gate never exercises these ranges)."""
    import duckdb

    from fineweb2_ro_ray.functions.script import (
        script_census,
        script_consistent_mask,
    )

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "ară și mănâncă bine",   # Romanian diacritics -> latin
                "привет мир hello",       # cyrillic-dominant
                "αβγ abc",                # 3 vs 3 tie -> latin (first)
                "你好世界",                # cjk
                "123 .,!?",               # no scripted letters
                None,
            ],
        }
    )
    out = script_census(t)
    rows = out.to_pylist()
    assert [r["main_script"] for r in rows] == [
        "latin", "cyrillic", "latin", "cjk", None, None,
    ]
    assert rows[0]["n_latin"] == sum(ch.isalpha() for ch in t["text"][0].as_py())
    assert rows[1]["n_cyrillic"] == 9 and rows[1]["n_latin"] == 5
    assert rows[1]["script_ratio"] == 9 / 14
    assert rows[2]["script_ratio"] == 0.5
    assert rows[4]["script_ratio"] is None and rows[5]["n_latin"] is None
    mask = script_consistent_mask(out, expect="latin", min_ratio=0.8).to_pylist()
    assert mask == [True, False, False, False, False, False]
    # DuckDB runs the oracle's range classes over the same rows
    con = duckdb.connect()
    con.register("docs", t)
    want = con.sql(
        """SELECT CAST(len(regexp_extract_all(text, '[A-Za-zÀ-ɏ]')) AS BIGINT),
                  CAST(len(regexp_extract_all(text, '[Ѐ-ӿ]')) AS BIGINT),
                  CAST(len(regexp_extract_all(text, '[一-鿿]')) AS BIGINT)
           FROM docs ORDER BY doc_id"""
    ).fetchall()
    got = [(r["n_latin"], r["n_cyrillic"], r["n_cjk"]) for r in rows]
    assert [tuple(w) for w in want] == got


def test_canonicalize_urls_rules():
    from fineweb2_ro_ray.functions.url import canonicalize_urls

    got = canonicalize_urls(
        pa.array(
            [
                "https://www.a.com:443/x/?utm=1",
                "http://a.com/x",
                "http://a.com:80/x",
                "https://a.com:8080/x",   # non-default port KEPT
                "http://wwwx.com/y",       # www. only as a label prefix
                "https://a.com///",
                None,
            ]
        )
    ).to_pylist()
    assert got == [
        "a.com/x",
        "a.com/x",
        "a.com/x",
        "a.com:8080/x",
        "wwwx.com/y",
        "a.com",
        None,
    ]


def test_code_switch_fold():
    """Per-line LID fold: dominant language, agreement fraction, flag,
    and the (count desc, lang asc) tie-break — on hand-built docs with
    known per-line languages (the frozen LID is golden-tested
    elsewhere; this pins the fold)."""
    from fineweb2_ro_ray.functions.lid import lang_id_batch
    from fineweb2_ro_ray.pipelines.parity import q_doc_code_switch  # noqa: F401

    ro = "ana are mere și pere în grădină"
    en = "the quick brown fox jumps over the dog"
    # sanity: the frozen LID actually labels these ro / en
    langs = lang_id_batch(pa.table({"text": [ro, en]}))["lang"].to_pylist()
    assert langs == ["ro", "en"]

    import numpy as np
    import ray.data

    tbl = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["\n".join([ro, ro, en]), "\n".join([en, ro]), None],
        }
    )
    # run the same per-batch kernel the query uses, via a tiny inline ds
    import fineweb2_ro_ray.pipelines.parity as P

    # reuse the closure by calling the query path on a temp parquet dir
    import tempfile, os
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            tbl.append_column("lang", pa.array(["ro", "ro", "ro"]))
               .append_column("source", pa.array(["s", "s", "s"]))
               .append_column("n_chars", pa.array([1, 1, 1], pa.int64())),
            os.path.join(td, "documents.parquet"),
        )
        out = (
            P.q_doc_code_switch(td)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
    assert out.main_line_lang.tolist() == ["ro", "en", None]
    assert abs(out.line_agreement[0] - 2 / 3) < 1e-12
    # doc 2: 1 en vs 1 ro -> tie, lang asc picks 'en'; agreement 0.5
    assert out.line_agreement[1] == 0.5
    assert out.code_switch.tolist() == [True, True, None]
