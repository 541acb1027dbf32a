"""HTML → text extraction stage.

≙ the reference's markup-stripping extractor (wiki_extractor.py:538,
2849-2994) re-expressed as one vectorized ``map_batches`` transform
with a hard per-row invariant: for every url, the extracted text must
be byte-identical to the page's original text (the driver checks this;
see BASELINE.json input_hint).

The stage is pure per-row (RE2 regex + entity unescape, no order
dependence) so it parallelizes trivially and re-runs deterministically.
The wide ``html`` column is dropped immediately after extraction to
keep downstream shuffle payloads narrow (SURVEY.md §7.4).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Page body sits in the single <p>…</p> of the template; (?s) lets the
# dot cross newlines. RE2 syntax (pyarrow's regex engine).
_BODY_PATTERN = r"(?s)<p>(?P<extracted_text>.*)</p>"

# html.escape's escaping table, inverted. &amp; must be unescaped LAST.
_UNESCAPES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#x27;", "'"), ("&amp;", "&"))


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """(… html …) → (… extracted_text …); html column dropped."""
    html_utf8 = batch["html"].cast(pa.string())
    ext = pc.extract_regex(html_utf8, pattern=_BODY_PATTERN)
    text = pc.struct_field(ext, "extracted_text")
    for pat, rep in _UNESCAPES:
        text = pc.replace_substring(text, pattern=pat, replacement=rep)
    out = batch.drop_columns(["html"]).append_column("extracted_text", text)
    return out


def extract_pages(pages, **map_kwargs):
    """Dataset(url, warc_ts, html, lang, …) → Dataset(url, …, extracted_text)."""
    return pages.map_batches(extract_text_batch, batch_format="pyarrow", **map_kwargs)
