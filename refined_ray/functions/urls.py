"""URL canonicalization for web-corpus dedup (engine addition).

Common-Crawl-style pipelines dedup pages by canonical URL before any
content hashing: the same page is crawled under dozens of surface
forms (tracking parameters, fragments, case-insensitive scheme/host,
default ports, doubled or trailing slashes).  ``canonicalize_urls``
normalizes those — and ONLY those — so the mapping is deterministic
and replayable in SQL:

1. strip the ``#fragment``
2. lowercase the scheme://host[:port] prefix (path/query case is
   significant per RFC 3986 and is preserved)
3. drop default ports (``http://…:80``, ``https://…:443``)
4. collapse ``//+`` runs in the path and strip trailing slashes
5. remove tracking query parameters (``utm_*``, ``fbclid``, ``gclid``),
   dropping the ``?`` when nothing else remains

Everything is pyarrow-compute RE2 kernels — zero Python per row — and
every pattern is mirrored verbatim in the DuckDB oracle (also RE2), so
the contract is testable bit-exactly.  Deliberately NOT done here:
percent-decoding and query-parameter re-ordering (both change
semantics for some sites; a corpus that wants them layers another
projection on top).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# tracking parameters removed from query strings (the widely-used
# ad/analytics set; extend per corpus)
TRACK_RE = r"(utm_[A-Za-z0-9_]+|fbclid|gclid)"

_HEAD_RE = r"^(?P<head>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<rest>.*)$"


def canonicalize_urls(arr) -> pa.Array:
    """Vectorized canonicalization of a string array of absolute URLs.

    Rows that do not look like ``scheme://authority…`` pass through
    with only the fragment stripped (a relative URL has no host to
    normalize).  Nulls stay null.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nofrag = pc.replace_substring_regex(arr, pattern=r"#.*$", replacement="")
    ex = pc.extract_regex(nofrag, pattern=_HEAD_RE)
    head = pc.utf8_lower(pc.struct_field(ex, "head"))
    rest = pc.struct_field(ex, "rest")

    head = pc.replace_substring_regex(
        head, pattern=r"^(http://[^:/?#]*):80$", replacement=r"\1")
    head = pc.replace_substring_regex(
        head, pattern=r"^(https://[^:/?#]*):443$", replacement=r"\1")

    pex = pc.extract_regex(rest, pattern=r"^(?P<path>[^?]*)(?P<query>.*)$")
    path = pc.struct_field(pex, "path")
    query = pc.struct_field(pex, "query")
    path = pc.replace_substring_regex(path, pattern=r"/{2,}", replacement="/")
    path = pc.replace_substring_regex(path, pattern=r"/+$", replacement="")
    query = pc.replace_substring_regex(
        query, pattern=rf"&{TRACK_RE}=[^&]*", replacement="")
    query = pc.replace_substring_regex(
        query, pattern=rf"\?{TRACK_RE}=[^&]*&", replacement="?")
    query = pc.replace_substring_regex(
        query, pattern=rf"\?{TRACK_RE}=[^&]*$", replacement="")

    canon = pc.binary_join_element_wise(head, path, query, "")
    # non-absolute rows: extract_regex yielded null -> keep nofrag
    return pc.if_else(pc.is_valid(head), canon, nofrag)


# The same five steps as DuckDB expressions over a column {col} (both
# engines run RE2, so the patterns are shared verbatim).  Used by unit
# tests for chain parity; the catalog oracle checks the stronger
# end-to-end contract (messy synth -> closed-form canonical).
def canonical_sql(col: str) -> str:
    nofrag = f"regexp_replace({col}, '#.*$', '')"
    head = (f"lower(regexp_extract({nofrag}, "
            f"'^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))")
    head = (f"regexp_replace(regexp_replace({head}, "
            f"'^(http://[^:/?#]*):80$', '\\1'), "
            f"'^(https://[^:/?#]*):443$', '\\1')")
    rest = f"regexp_replace({nofrag}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')"
    path = f"regexp_extract({rest}, '^([^?]*)', 1)"
    path = (f"regexp_replace(regexp_replace({path}, '/{{2,}}', '/', 'g'), "
            f"'/+$', '')")
    query = f"regexp_replace({rest}, '^[^?]*', '')"
    query = f"regexp_replace({query}, '&{TRACK_RE}=[^&]*', '', 'g')"
    query = f"regexp_replace({query}, '\\?{TRACK_RE}=[^&]*&', '?', 'g')"
    query = f"regexp_replace({query}, '\\?{TRACK_RE}=[^&]*$', '')"
    return (f"CASE WHEN regexp_matches({nofrag}, "
            f"'^[A-Za-z][A-Za-z0-9+.-]*://') "
            f"THEN {head} || {path} || {query} ELSE {nofrag} END")
