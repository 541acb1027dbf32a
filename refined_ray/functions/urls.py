"""URL canonicalization for web-corpus dedup (engine addition).

Common-Crawl-style pipelines dedup pages by canonical URL before any
content hashing: the same page is crawled under dozens of surface
forms (tracking parameters, fragments, case-insensitive scheme/host,
default ports, doubled or trailing slashes).  ``canonicalize_urls``
normalizes those — and ONLY those — so the mapping is deterministic
and replayable in SQL:

1. strip the ``#fragment``
2. lowercase the scheme and host[:port] (RFC 3986: scheme and host are
   case-insensitive; userinfo, path and query are case-SIGNIFICANT and
   are preserved)
3. drop default ports (``http://…:80``, ``https://…:443``), including
   behind userinfo
4. collapse ``//+`` runs in the path and strip trailing slashes
5. remove tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   matched case-insensitively — real crawls carry ``UTM_Source``
   variants), dropping the ``?`` when nothing else remains

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
# ad/analytics set, case-insensitive; extend per corpus)
TRACK_RE = r"(?i:utm_[a-z0-9_]+|fbclid|gclid)"

_HEAD_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
            r"(?P<user>[^/?#]*@)?(?P<hostport>[^/?#@]*)(?P<rest>.*)$")


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
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    user = pc.struct_field(ex, "user")  # case-significant, preserved
    hostport = pc.utf8_lower(pc.struct_field(ex, "hostport"))
    rest = pc.struct_field(ex, "rest")

    # default ports are scheme-conditional; a non-default port survives
    hostport = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(hostport, pattern=r":80$", replacement=""),
        pc.if_else(
            pc.equal(scheme, "https"),
            pc.replace_substring_regex(hostport, pattern=r":443$", replacement=""),
            hostport))

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

    canon = pc.binary_join_element_wise(
        scheme, "://", user, hostport, path, query, "")
    # non-absolute rows: extract_regex yielded null -> keep nofrag
    return pc.if_else(pc.is_valid(scheme), canon, nofrag)


# The same five steps as DuckDB expressions over a column {col} (both
# engines run RE2, so the patterns are shared verbatim).  Used by unit
# tests for chain parity; the catalog oracle checks the stronger
# end-to-end contract (messy synth -> closed-form canonical).
def canonical_sql(col: str) -> str:
    nofrag = f"regexp_replace({col}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nofrag}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    auth = f"regexp_extract({nofrag}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)"
    # greedy [^/?#]*@ pairs with arrow's _HEAD_RE user group (to LAST @)
    user = f"regexp_extract({auth}, '^([^/?#]*@)?', 1)"  # '' when absent
    # greedy .*@ strips userinfo up to the LAST @ (RE2, same as arrow)
    hostport = f"lower(regexp_replace({auth}, '^[^/?#]*@', ''))"
    hostport = (f"CASE WHEN {scheme} = 'http' "
                f"THEN regexp_replace({hostport}, ':80$', '') "
                f"WHEN {scheme} = 'https' "
                f"THEN regexp_replace({hostport}, ':443$', '') "
                f"ELSE {hostport} END")
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
            f"THEN {scheme} || '://' || {user} || {hostport} || {path} || {query} "
            f"ELSE {nofrag} END")
