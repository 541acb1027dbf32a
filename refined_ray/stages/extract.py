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


# ---------------------------------------------------------------------
# M4: anchor-tag extraction + offset re-alignment (≙ reference
# process_line, merge_files_and_extract_links.py:52-88: regex-find
# <a href> anchors, then locate each surface in the CLEANED text with a
# forward-moving cursor so offsets index the extracted text, not the
# raw html).
# ---------------------------------------------------------------------

import re as _re

_ANCHOR_RE = _re.compile(r'<a\s+href="([^"]*)"[^>]*>(.*?)</a>', _re.DOTALL)


def _unescape(s: str) -> str:
    for pat, rep in _UNESCAPES:
        s = s.replace(pat, rep)
    return s


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """(url, html, …) → one row per anchor: (url, href, surface,
    start, end) with char offsets into the page's EXTRACTED text.

    Anchors whose surface cannot be located in the extracted text
    (e.g. outside the body) are dropped, matching the reference's
    skip-on-miss behavior.  Multi-match regex with offsets has no Arrow
    kernel, so this runs per row — link extraction is a one-time
    ingest-side pass, not a per-query hot path.
    """
    urls = batch["url"].to_pylist()
    htmls = [h.decode("utf-8", "ignore") if isinstance(h, (bytes, bytearray)) else h
             for h in batch["html"].to_pylist()]
    extracted = extract_text_batch(batch.select(["url", "html"]))["extracted_text"].to_pylist()
    out = {"url": [], "href": [], "surface": [], "start": [], "end": []}
    for url, html, text in zip(urls, htmls, extracted):
        if text is None:
            continue
        cursor = 0
        for m in _ANCHOR_RE.finditer(html):
            href = m.group(1)
            surface = _unescape(_re.sub(r"<[^>]+>", "", m.group(2)))
            if not surface:
                continue
            idx = text.find(surface, cursor)
            if idx < 0:
                continue
            cursor = idx + len(surface)
            out["url"].append(url)
            out["href"].append(href)
            out["surface"].append(surface)
            out["start"].append(idx)
            out["end"].append(idx + len(surface))
    return pa.table({
        "url": pa.array(out["url"], type=pa.string()),
        "href": pa.array(out["href"], type=pa.string()),
        "surface": pa.array(out["surface"], type=pa.string()),
        "start": pa.array(out["start"], type=pa.int64()),
        "end": pa.array(out["end"], type=pa.int64()),
    })
