"""Surface-form normalization — the deterministic blocking key.

Re-expresses the reference's ``normalize_surface_form``
(/root/reference/src/refined/resource_management/loaders.py:137-148:
lowercase, strip a leading "the ", ASCII-fold, strip ``. ' " ` 's``)
as a vectorized pyarrow.compute chain.  The exact operation order is
part of the contract: the DuckDB oracle replicates it 1:1 (see
``NORMALIZE_SQL``), so any edit here must be mirrored there.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

# DuckDB expression computing the identical normalization of column {col}.
# Replacement order matters: "'s" must go before "'".
NORMALIZE_SQL = (
    "trim(replace(replace(replace(replace(replace("
    "strip_accents(CASE WHEN lower({col}) LIKE 'the %' "
    "THEN substr(lower({col}), 5) ELSE lower({col}) END),"
    " '.', ''), '''s', ''), '\"', ''), '''', ''), '`', ''))"
)


def _strip_accents_py(s: str) -> str:
    return "".join(c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c))


def normalize_surface_array(arr: pa.Array) -> pa.Array:
    """Vectorized normalization of a string array.

    Hot path is pure pyarrow kernels; the accent fold falls back to
    Python only for the (rare in web text we ingest) non-ASCII rows.
    """
    s = pc.utf8_lower(arr)
    s = pc.if_else(pc.starts_with(s, pattern="the "), pc.utf8_slice_codeunits(s, 4), s)
    if not pc.all(pc.string_is_ascii(s)).as_py():
        # NFKD fold matches DuckDB's strip_accents on Latin script.
        s = pa.array(
            [None if v is None else (v if v.isascii() else _strip_accents_py(v)) for v in s.to_pylist()],
            type=pa.string(),
        )
    for pat in (".", "'s", '"', "'", "`"):
        s = pc.replace_substring(s, pattern=pat, replacement="")
    return pc.utf8_trim_whitespace(s)


def normalize_surface_form(s: str) -> str:
    """Scalar convenience wrapper (tests, driver-side use)."""
    return normalize_surface_array(pa.array([s])).to_pylist()[0]


def remove_wiki_brackets(arr: pa.Array) -> pa.Array:
    """Strip one trailing " (...)" qualifier from titles.

    ≙ reference loaders.py:207-215.  Vectorized RE2 replace.
    """
    return pc.replace_substring_regex(arr, pattern=r" \([^()]*\)$", replacement="")
