"""Streamed MediaWiki-style XML dump reader — S2's ORIGINAL form.

≙ the reference's ``pages_from`` page scanner
(wiki_extractor.py:2779-2846) plus the ``process_dump`` bz2 streaming
outer loop (wiki_extractor.py:2849-2994), re-expressed Ray-Data-first:
``ray.data.read_binary_files`` over the dump shards → ``flat_map``
parse — each shard decompresses AND parses as one streaming pass
inside a task (pages never all in memory at once), and pages flow out
as Arrow rows under the executor's backpressure.  The reference's
jobs/output queue machinery and ordered reducer (wiki_extractor.py:
2920-2994, 3064-3092) are exactly what SURVEY §4 marks "free" on Ray:
rows are keyed by page id, so no order restoration is needed.

Scanner semantics kept from ``pages_from`` (the observable contract,
not the code):
- the FIRST ``<id>`` inside a page is the page id, the SECOND is the
  revision id (wiki_extractor.py:2812-2816);
- ``<redirect .../>`` pages are skipped (yield gate at :2843);
- a page whose id equals the previously yielded id is skipped — the
  dump's duplicate guard (:2843-2845);
- ``<text .../>`` self-closing means an empty text (:2825-2827);
  ``<text>`` may open, span raw lines (lines without ``<`` are
  appended verbatim, :2799-2801), and close mid-line;
- pages reset state at ``<page>`` (:2809-2811).

XML entity unescape (``&lt; &gt; &amp;`` …) is folded into the parse
(M3's unescape chain, ≙ generate_pem.py:31-37) so the emitted text is
the original page text byte-identically — the writer below escapes
with the inverse mapping.
"""

from __future__ import annotations

import bz2
import gzip
import io
import re
from typing import Iterable, Iterator
from xml.sax.saxutils import escape, unescape

_TITLE = re.compile(r"<title>(.*?)</title>")
_NS = re.compile(r"<ns>(.*?)</ns>")
_ID = re.compile(r"<id>(\d+)</id>")
_TEXT_OPEN = re.compile(r"<text[^>]*?(/?)>")


def iter_pages(lines: Iterable[str], *, unescape_entities: bool = True
               ) -> Iterator[dict]:
    """Scan decoded dump lines → one dict per kept page:
    ``{page_id:int, revid:int|None, title:str, ns:str, text:str}``.

    Redirect pages and consecutive duplicate-id pages are skipped (the
    ``pages_from`` yield gate).  Text segments keep their newlines so
    the reconstruction is byte-identical to what the writer emitted.
    """
    segs: list[str] = []
    page_id = revid = title = None
    ns = "0"
    redirect = False
    in_text = False
    last_id = None

    def _u(s: str) -> str:
        return unescape(s) if unescape_entities else s

    for line in lines:
        if in_text:
            close = line.find("</text>")
            if close >= 0:
                segs.append(line[:close])
                in_text = False
            else:
                segs.append(line)
            continue
        if "<" not in line:
            continue
        if "<page" in line:
            segs = []
            page_id = revid = title = None
            ns = "0"
            redirect = False
            in_text = False
            continue
        if "</page" in line:
            if page_id is not None and page_id != last_id and not redirect:
                yield {
                    "page_id": int(page_id),
                    "revid": int(revid) if revid is not None else None,
                    "title": _u(title or ""),
                    "ns": ns,
                    "text": _u("".join(segs)),
                }
                last_id = page_id
            continue
        if "<redirect" in line:
            redirect = True
            continue
        m = _TITLE.search(line)
        if m:
            title = m.group(1)
            continue
        m = _NS.search(line)
        if m:
            ns = m.group(1)
            continue
        m = _ID.search(line)
        if m:
            if page_id is None:
                page_id = m.group(1)
            else:
                # reference parity: every subsequent <id> (revision id,
                # then <contributor><id> on real dumps) overwrites revid
                # — last-id-wins, matching wiki_extractor's pages_from
                revid = m.group(1)
            continue
        m = _TEXT_OPEN.search(line)
        if m:
            if m.group(1) == "/":  # self-closing <text ... /> → empty
                segs.append("")
                continue
            rest = line[m.end():]
            close = rest.find("</text>")
            if close >= 0:
                segs.append(rest[:close])
            else:
                segs.append(rest)
                in_text = True


def _open_stream(data: bytes) -> io.TextIOBase:
    """Wrap raw shard bytes in a STREAMING line reader, sniffing the
    compression by magic bytes (bz2 / gzip / plain).  Decompression is
    incremental — a task never holds the decompressed shard at once."""
    buf = io.BytesIO(data)
    if data[:3] == b"BZh":
        raw: io.BufferedIOBase = bz2.BZ2File(buf)
    elif data[:2] == b"\x1f\x8b":
        raw = gzip.GzipFile(fileobj=buf)
    else:
        raw = buf
    return io.TextIOWrapper(raw, encoding="utf-8", newline="")


def parse_dump_shard(data: bytes, *, unescape_entities: bool = True
                     ) -> Iterator[dict]:
    """bytes of one dump shard (bz2/gz/plain XML) → page dicts."""
    with _open_stream(data) as f:
        yield from iter_pages(f, unescape_entities=unescape_entities)


def read_xml_pages(path: str, *, unescape_entities: bool = True,
                   ns_filter: str | None = "0"):
    """``ray.data`` Dataset of pages from an XML dump file or shard
    directory: (page_id:int64, revid:int64, title, ns, text).

    One input file = one parse task (shards are the parallelism unit,
    like the reference's per-process dump slices, run_span_detection
    style); keep shards ≲ a few hundred MB compressed when writing.
    ``ns_filter`` keeps only that namespace (the reference's
    ``namespace == '0'`` keep, process_wiki.py:81); pass None for all.
    """
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(path)

    def parse(b: pa.Table) -> pa.Table:
        out = {"page_id": [], "revid": [], "title": [], "ns": [], "text": []}
        for data in b["bytes"].to_pylist():
            for p in parse_dump_shard(data,
                                      unescape_entities=unescape_entities):
                if ns_filter is not None and p["ns"] != ns_filter:
                    continue
                out["page_id"].append(p["page_id"])
                out["revid"].append(p["revid"])
                out["title"].append(p["title"])
                out["ns"].append(p["ns"])
                out["text"].append(p["text"])
        return pa.table({
            "page_id": pa.array(out["page_id"], type=pa.int64()),
            "revid": pa.array(out["revid"], type=pa.int64()),
            "title": pa.array(out["title"], type=pa.string()),
            "ns": pa.array(out["ns"], type=pa.string()),
            "text": pa.array(out["text"], type=pa.large_string()),
        })

    # batch_size=None: a task parses whole files; read_binary_files
    # already makes one block per file so tasks stay shard-granular
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)


def write_xml_shard(pages: Iterable[dict], path: str,
                    compression: str | None = "bz2") -> None:
    """Write pages as one MediaWiki-shaped XML shard (the writer is
    the test/staging inverse of the reader; atomic via .part→rename
    like every engine sink, ≙ S9).

    ``pages``: dicts with page_id, title, text, optional ns/revid,
    optional ``redirect`` (emits a ``<redirect/>`` page the reader
    must skip).  Text/title are entity-escaped (&amp; &lt; &gt;).
    """
    import os
    import uuid

    out = io.StringIO()
    out.write("<mediawiki>\n")
    for p in pages:
        out.write("  <page>\n")
        out.write(f"    <title>{escape(str(p.get('title', '')))}</title>\n")
        out.write(f"    <ns>{p.get('ns', '0')}</ns>\n")
        out.write(f"    <id>{int(p['page_id'])}</id>\n")
        if p.get("redirect"):
            out.write("    <redirect title=\"elsewhere\" />\n")
        out.write("    <revision>\n")
        out.write(f"      <id>{int(p.get('revid', p['page_id']) )}</id>\n")
        text = p.get("text", "")
        if text == "" and p.get("self_closing_text"):
            out.write("      <text xml:space=\"preserve\" />\n")
        else:
            out.write("      <text xml:space=\"preserve\">"
                      f"{escape(text)}</text>\n")
        out.write("    </revision>\n")
        out.write("  </page>\n")
    out.write("</mediawiki>\n")

    raw = out.getvalue().encode("utf-8")
    if compression == "bz2":
        raw = bz2.compress(raw)
    elif compression == "gz":
        raw = gzip.compress(raw)
    tmp = path + f".{uuid.uuid4().hex}.part"
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, path)
