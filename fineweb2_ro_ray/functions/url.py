"""URL parsing / registered-domain extraction / blocklist filtering.

The FineWeb-family pipelines filter and aggregate by URL before any
content rule runs (URL blocklists, per-domain caps, TLD statistics);
the reference corpus inherits that curation. These are the Ray-native
kernels: one ``pyarrow.compute.extract_regex`` pass per batch (RE2,
zero Python per row), so URL work streams at scan speed with zero
shuffle.

The test tables carry no URL column, so queries DERIVE one
deterministically from (doc_id, lang, source) — the construction is
mirrored expression-for-expression in the DuckDB oracle (a CTE), and
the PARSE on each side is independent (one combined RE2 regex here,
per-field ``regexp_extract`` there), so the oracle genuinely checks
the parser, not the builder.

Registered-domain extraction uses an explicit public-suffix set (the
real Mozilla PSL is a data file of the same shape — swap ``SUFFIXES``
for it): the registered domain is the label immediately left of the
longest matching public suffix, found with one anchored RE2
alternation over the host.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# longest-match-first (RE2 alternation is leftmost-first; multi-label
# suffixes must precede their own last label)
SUFFIXES = ("co.uk", "com.ro", "com", "org", "net", "ro", "uk")

_URL_RE = (
    r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?P<host>[^:/?#]+)"
    r"(?::(?P<port>\d+))?(?P<path>/[^?#]*)?(?:\?(?P<qstring>[^#]*))?"
)
_REGDOM_RE = (
    "(?P<regdom>[^.]+\\.(?:"
    + "|".join(s.replace(".", "\\.") for s in SUFFIXES)
    + "))$"
)


def _nullif_empty(arr: pa.Array) -> pa.Array:
    """'' -> null: RE2's non-participating optional groups extract as
    empty strings (same convention as SQL ``regexp_extract``)."""
    return pc.if_else(pc.equal(arr, ""), pa.nulls(len(arr), pa.string()), arr)


def parse_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Parse a URL column into (scheme, host, port, path, qstring,
    regdom) with ONE RE2 pass + one anchored suffix pass on the host.
    Unparseable rows (no scheme://host) come back all-null; absent
    port/path/query are null; ``port`` is int64."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    st = pc.extract_regex(urls, _URL_RE)
    # extract_regex nulls the WHOLE struct for non-matching rows
    scheme = _nullif_empty(pc.struct_field(st, "scheme"))
    host = _nullif_empty(pc.struct_field(st, "host"))
    # absent port -> 0 (never a valid TCP port), keeping the column
    # non-null int64 — a nullable int round-trips through pandas as
    # float64 + NaN, which breaks exact comparison downstream
    port = pc.fill_null(
        pc.cast(_nullif_empty(pc.struct_field(st, "port")), pa.int64()), 0
    )
    path = _nullif_empty(pc.struct_field(st, "path"))
    qstring = _nullif_empty(pc.struct_field(st, "qstring"))
    rd = pc.extract_regex(host, _REGDOM_RE)
    regdom = pc.struct_field(rd, "regdom")
    return pa.table(
        {
            "scheme": scheme,
            "host": host,
            "port": port,
            "path": path,
            "qstring": qstring,
            "regdom": regdom,
        }
    )


def build_urls(t: pa.Table) -> pa.Array:
    """Deterministic URL per document from (doc_id, lang, source) —
    the test-table stand-in for a real url column, varied across
    scheme / subdomain / host / multi-label TLD / port / query so the
    parser earns its oracle. Mirrored verbatim in the SQL oracle CTE
    (``__ray_entry__._URL_CTE``)."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lang = np.asarray(t["lang"].to_pylist(), dtype=object)
    source = np.asarray(t["source"].to_pylist(), dtype=object)
    ids_s = ids.astype("U20").astype(object)

    scheme = np.where(ids % 3 == 0, "http", "https").astype(object)
    m5 = ids % 5
    sub = np.where(m5 == 0, "www.", np.where(m5 == 1, "blog.", "")).astype(object)
    tld = np.select(
        [ids % 4 == 0, ids % 4 == 1, ids % 4 == 2],
        ["com", "ro", "co.uk"],
        default="org",
    ).astype(object)
    port = np.where(ids % 11 == 0, ":8080", "").astype(object)
    q = np.where(ids % 2 == 0, "?ref=" + source, "").astype(object)
    host7 = (ids % 7).astype("U1").astype(object)
    url = (
        scheme
        + "://"
        + sub
        + source
        + host7
        + "."
        + tld
        + port
        + "/"
        + lang
        + "/doc/"
        + ids_s
        + q
    )
    return pa.array(url, type=pa.string())


def blocklist_mask(regdom: pa.Array, blocked: frozenset[str]) -> pa.Array:
    """Keep-mask: True where the registered domain is NOT blocked
    (null regdom rows are kept — unparseable URLs fall through to the
    content rules, they are not silently dropped here)."""
    hit = pc.is_in(regdom, value_set=pa.array(sorted(blocked), pa.string()))
    return pc.if_else(pc.is_valid(regdom), pc.invert(hit), pa.scalar(True))


# fixed canonicalization chain (pattern, replacement), applied IN ORDER
# with global substitution — mirrored verbatim in the SQL oracle. RE2
# has no lookahead, so default ports use two patterns (mid / end).
CANON_REGEXES: list[tuple[str, str]] = [
    (r"^[a-z][a-z0-9+.-]*://", ""),   # scheme off (http ≡ https)
    (r"^www\.", ""),                   # leading www.
    (r":(80|443)/", "/"),              # default port, path follows
    (r":(80|443)$", ""),               # default port at end
    (r"\?.*$", ""),                    # query string (tracking params)
    (r"/+$", ""),                      # trailing slash(es)
]


def canonicalize_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """URL → canonical dedup key (the FineWeb URL-dedup normalize):
    scheme/www/default-port/query/trailing-slash insensitive. One RE2
    kernel per step over the whole batch; NULL propagates."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    x = urls
    for pat, rep in CANON_REGEXES:
        x = pc.replace_substring_regex(x, pattern=pat, replacement=rep)
    return x


def build_colliding_urls(t: pa.Table) -> pa.Array:
    """Derived URL set DESIGNED to collide after canonicalization
    (scheme / www / default-port / query / trailing-slash variants of
    a doc_id%50-bucketed path) — the url_canonical_dedup test input;
    mirrored in the SQL oracle CTE."""
    ids = t["doc_id"]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()

    def mod(k: int) -> pa.Array:
        return pc.subtract(ids, pc.multiply(pc.divide(ids, k), k))

    n = len(ids)
    scheme = pc.if_else(
        pc.equal(mod(2), 0), pa.array(["http://"] * n, pa.string()), pa.array(["https://"] * n, pa.string())
    )
    www = pc.if_else(
        pc.equal(mod(3), 0), pa.array(["www."] * n, pa.string()), pa.array([""] * n, pa.string())
    )
    port = pc.if_else(
        pc.equal(mod(5), 0), pa.array([":443"] * n, pa.string()), pa.array([""] * n, pa.string())
    )
    bucket = pc.cast(mod(50), pa.string())
    q = pc.if_else(
        pc.equal(mod(7), 0),
        pc.binary_join_element_wise(
            pa.array(["?utm="] * n, pa.string()), pc.cast(ids, pa.string()), ""
        ),
        pa.array([""] * n, pa.string()),
    )
    slash = pc.if_else(
        pc.equal(mod(11), 0), pa.array(["/"] * n, pa.string()), pa.array([""] * n, pa.string())
    )
    src = t["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    return pc.binary_join_element_wise(
        scheme, www, src, pa.array([".example.com"] * n, pa.string()), port,
        pa.array(["/page/"] * n, pa.string()), bucket, slash, q, "",
    )
