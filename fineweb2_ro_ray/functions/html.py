"""HTML → text extraction — the FIRST step of a web-corpus pipeline.

The reference corpus starts from FineWeb-2, whose documents are the
OUTPUT of CommonCrawl WARC → text extraction (trafilatura in the
published FineWeb recipe, arXiv:2406.17557 §3.1); the reference repo
consumes that text directly (`/root/reference/fineweb/
fineweb2_download.py`). A standalone engine that claims the full
pipeline needs the extraction stage itself: strip script/style/comment
blocks, drop markup, decode entities, normalize whitespace — as
zero-shuffle vectorized Arrow RE2 kernels so the stage runs at scan
speed.

Design constraints (scale-first):

- ONE ``map_batches`` pass, no shuffle, no per-row Python: each step is
  a single ``pyarrow.compute`` kernel over the whole batch
  (``replace_substring_regex`` / ``replace_substring`` /
  ``extract_regex``), all RE2.
- The regex chain is a FIXED, documented order (block strips → tag
  strip → entity decode with ``&amp;`` LAST → whitespace collapse →
  trim), each step expressible as one DuckDB ``regexp_replace(..,
  'g')`` / ``replace()`` — so the whole stage is value-exact checkable
  against a SQL oracle running the identical chain (both engines are
  RE2 underneath).
- This is deliberately the *deterministic-core* subset of a production
  extractor (no DOM parse, no boilerplate ML): the DOM-aware variant
  would slot into the same ``map_batches`` stage as an actor pool; the
  corpus-level boilerplate pass already exists (``stages.boilerplate``).

The test tables carry no html column, so ``build_html`` derives one
deterministically from (doc_id, lang, source, text) — mirrored in the
oracle CTE, exactly like the url column in ``functions.url``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _s(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def build_html(b: pa.Table) -> pa.Array:
    """Deterministic derived html document (test-table stand-in for a
    real crawled payload; construction mirrored in the SQL oracle CTE).
    Exercises every extraction rule: a <style> block, a <script> block
    whose body contains ``<`` and quotes, an HTML comment, nested
    tags with attributes, and all six decoded entities."""
    did = pc.cast(_s(b["doc_id"]), pa.string())
    parts = [
        pa.array(["<html><head><title>doc "] * len(b), pa.string()),
        did,
        pa.array(["</title><style>p { color: #333; }</style></head>"] * len(b), pa.string()),
        pa.array(["<body><script>if (1 < 2) { var q = \"</p>\"; }</script>"] * len(b), pa.string()),
        pa.array(["<h1>"] * len(b), pa.string()),
        _s(b["lang"]),
        pa.array([" &amp; "] * len(b), pa.string()),
        _s(b["source"]),
        pa.array(["</h1><!-- crawl "] * len(b), pa.string()),
        did,
        pa.array([" --><p>"] * len(b), pa.string()),
        _s(b["text"]),
        pa.array(
            ['</p><div class="f">&lt;tag&gt;&nbsp;&quot;q&quot; &#39;a&#39;</div>'] * len(b),
            pa.string(),
        ),
        pa.array(["</body></html>"] * len(b), pa.string()),
    ]
    return pc.binary_join_element_wise(*parts, "")


# the fixed extraction chain — (pattern, replacement) applied IN ORDER
# with global substitution; mirrored verbatim in the SQL oracle. RE2:
# (?s) makes . span newlines; .*? is non-greedy so back-to-back blocks
# don't merge.
STRIP_REGEXES: list[tuple[str, str]] = [
    (r"(?s)<script[^>]*>.*?</script>", " "),
    (r"(?s)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
]

# literal entity decodes, &amp; LAST (the html-unescape order: decoding
# it first would re-activate entity-looking text like "&amp;lt;").
ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_WS = r"[ \t\r\n]+"


def extract_text(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Markup → clean text: block strips, tag strip, entity decode,
    whitespace collapse, trim. One RE2 kernel per step, whole batch at
    a time. NULL html propagates to NULL text."""
    x = _s(html)
    for pat, rep in STRIP_REGEXES:
        x = pc.replace_substring_regex(x, pattern=pat, replacement=rep)
    for lit, rep in ENTITIES:
        x = pc.replace_substring(x, pattern=lit, replacement=rep)
    x = pc.replace_substring_regex(x, pattern=_WS, replacement=" ")
    return pc.utf8_trim(x, characters=" ")


def extract_title(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    """First <title> body (no nested tags), or NULL when absent."""
    st = pc.extract_regex(_s(html), r"<title>(?P<t>[^<]*)</title>")
    return pc.struct_field(st, "t")


def extract_docs(b: pa.Table, html_col: str = "html") -> pa.Table:
    """The full extraction batch kernel: doc_id + title + clean text +
    its codepoint length (the downstream quality-filter input)."""
    clean = extract_text(b[html_col])
    return pa.table(
        {
            "doc_id": b["doc_id"],
            "title": extract_title(b[html_col]),
            "text_clean": clean,
            "n_clean": pc.cast(pc.utf8_length(clean), pa.int64()),
        }
    )


def build_nav(b: pa.Table) -> pa.Array:
    """Deterministic link section appended AFTER the document (link
    queries only; keeps build_html and its oracle CTE frozen): one
    absolute link, one mailto, and — every 3rd doc — a second absolute
    link, else an UNCLOSED href (no closing quote ⇒ extracted by
    neither engine; the malformed-markup case)."""
    did = pc.cast(_s(b["doc_id"]), pa.string())
    n = len(b)
    base = pc.binary_join_element_wise(
        pa.array(['<nav><a href="https://'] * n, pa.string()),
        _s(b["source"]),
        pa.array([".example.com/"] * n, pa.string()),
        _s(b["lang"]),
        pa.array(["/"] * n, pa.string()),
        did,
        pa.array(['">next</a><a href="mailto:x@y">m</a>'] * n, pa.string()),
        "",
    )
    ref = pc.binary_join_element_wise(
        pa.array(['<a href="http://ref.'] * n, pa.string()),
        _s(b["lang"]),
        pa.array([".org/p?id="] * n, pa.string()),
        did,
        pa.array(['">ref</a>'] * n, pa.string()),
        "",
    )
    broken = pa.array(['<a href="broken'] * n, pa.string())
    is3 = pc.equal(
        pc.subtract(_s(b["doc_id"]), pc.multiply(pc.divide(_s(b["doc_id"]), 3), 3)),
        0,
    )
    tail = pc.if_else(is3, ref, broken)
    return pc.binary_join_element_wise(
        base, tail, pa.array(["</nav>"] * n, pa.string()), ""
    )


def extract_links(
    b: pa.Table, html_col: str = "html", id_col: str = "doc_id"
) -> pa.Table:
    """ALL ``href="..."`` values per document, in document order —
    the all-matches extraction Arrow has no single kernel for,
    vectorized as split + offset-mask + prefix-to-quote (equivalent to
    SQL ``regexp_extract_all(html, 'href="([^"]*)"', 1)``): an href
    with no closing quote is extracted by neither. Output
    ``(doc_id, href)`` rows.

    Known non-equivalence outside well-formed markup: a literal
    ``href="`` INSIDE an attribute value (``href="x href="y"``) makes
    the regex capture ``x href=`` while the split form captures ``y``
    — pathological double-quoting no HTML serializer emits; the
    split form is the sane reading."""
    import numpy as np

    html = _s(b[html_col])
    parts = pc.split_pattern(html, 'href="')
    flat = pc.list_flatten(parts)
    if len(flat) == 0:
        return pa.table(
            {id_col: pa.array([], b[id_col].type), "href": pa.array([], pa.string())}
        )
    parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    # drop each list's FIRST element (text before the first href):
    # positions where the flat index equals its list's start offset
    pos = np.arange(len(flat), dtype=np.int64)
    starts = np.zeros(len(parts) + 1, dtype=np.int64)
    np.add.at(starts, parent + 1, 1)
    starts = np.cumsum(starts)  # starts[i] = first flat index of list i
    keep = pos != starts[parent]
    # ... and entries with no closing quote (malformed; regexp needs ")
    has_quote = pc.not_equal(pc.find_substring(flat, '"'), -1).to_numpy(
        zero_copy_only=False
    )
    keep &= has_quote
    idx = pa.array(pos[keep], pa.int64())
    kept = pc.take(flat, idx)
    kept_parent = parent[keep]
    # prefix up to the first quote
    href = pc.list_element(pc.split_pattern(kept, '"', max_splits=1), 0)
    ids = _s(b[id_col])
    return pa.table({id_col: pc.take(ids, pa.array(kept_parent, pa.int64())), "href": href})
