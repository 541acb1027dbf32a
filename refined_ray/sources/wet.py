"""Streamed WET (WARC text-conversion) reader — the Common-Crawl
source format for web-text corpora (engine addition to the S-family
readers; the reference consumes pre-extracted corpora, a Common-Crawl
pipeline starts one step earlier at the .warc.wet.gz shards).

Ray-Data-first layout, same as ``sources/xmldump.py``:
``ray.data.read_binary_files`` over the shards → one streaming
parse task per shard (records never all in memory at once), rows flow
out as Arrow under the executor's backpressure.

Format contract (WARC/1.0, public spec; kept deliberately strict):
- a record = ``WARC/...`` version line, ``Name: value`` header lines,
  a blank line, then EXACTLY ``Content-Length`` bytes of payload,
  then blank separator lines;
- payload boundaries come from ``Content-Length`` ONLY — a payload
  may itself contain blank lines or the literal text ``WARC/1.0``
  (naive split-on-marker parsers corrupt there; the fixture plants
  exactly that decoy);
- header names match case-insensitively;
- only ``WARC-Type: conversion`` records carry extracted text;
  ``warcinfo`` / ``request`` / ``response`` / ``metadata`` records are
  skipped;
- shards may be plain or gzip — including MULTI-MEMBER gzip (Common
  Crawl gzips each record as its own member so readers can seek);
  Python's streaming GzipFile concatenates members transparently.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator


def iter_wet_records(raw: io.BufferedIOBase) -> Iterator[dict]:
    """Scan a decompressed WARC byte stream → one dict per record:
    ``{type:str, headers:dict[str,str], payload:bytes}``.

    Fails loudly on a malformed stream (missing version line,
    truncated payload) rather than resynchronizing — a corrupt shard
    should surface, not silently drop records."""
    while True:
        line = raw.readline()
        if not line:
            return
        if line.strip() == b"":
            continue  # inter-record separator blank lines
        if not line.startswith(b"WARC/"):
            raise ValueError(
                f"expected WARC version line, got {line[:60]!r} — "
                "corrupt shard or non-WARC input")
        headers: dict[str, str] = {}
        while True:
            h = raw.readline()
            if not h:
                raise ValueError("EOF inside WARC header block")
            if h.strip() == b"":
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower().decode("latin-1")] = \
                    v.strip().decode("utf-8", "replace")
        if "content-length" not in headers:
            # WARC/1.0 makes Content-Length mandatory; defaulting to 0
            # would make the parser read the real payload as the NEXT
            # record (silent fabrication) — fail loudly instead.
            raise ValueError(
                "WARC record missing mandatory Content-Length header — "
                f"headers: {sorted(headers)!r}")
        n = int(headers["content-length"])
        payload = raw.read(n)
        if len(payload) != n:
            raise ValueError(
                f"truncated WET payload: wanted {n} bytes, got {len(payload)}")
        yield {"type": headers.get("warc-type", ""),
               "headers": headers, "payload": payload}


def _open_stream(data: bytes) -> io.BufferedIOBase:
    """Raw shard bytes → streaming binary reader, sniffing gzip by
    magic bytes.  Decompression is incremental and multi-member-aware
    (one gzip member per record is the Common-Crawl layout)."""
    buf = io.BytesIO(data)
    if data[:2] == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=buf))  # type: ignore[arg-type]
    return buf


def parse_wet_shard(data: bytes) -> Iterator[dict]:
    """bytes of one .wet(.gz) shard → conversion-record dicts:
    ``{url, warc_date, n_bytes:int, text:str}``.

    Payload text decodes with ``errors="replace"``: real Common-Crawl
    conversion payloads carry occasional mojibake from mis-declared
    charsets, and one bad byte must not kill a 150 MB shard task.
    Valid UTF-8 round-trips byte-identically; ``n_bytes`` is taken
    from the RAW payload either way.  The loud-failure contract is
    for STRUCTURAL corruption (version line, truncated payload)."""
    with _open_stream(data) as f:
        for rec in iter_wet_records(f):
            if rec["type"].lower() != "conversion":
                continue
            yield {
                "url": rec["headers"].get("warc-target-uri", ""),
                "warc_date": rec["headers"].get("warc-date", ""),
                "n_bytes": len(rec["payload"]),
                "text": rec["payload"].decode("utf-8", "replace"),
            }


def read_wet_files(path: "str | list[str]", *, records_per_block: int = 2000):
    """``ray.data`` Dataset of extracted-text records from a WET file,
    shard directory, or explicit shard list: (url, warc_date,
    n_bytes:int64, text:large_string).

    One input file = one parse task (shards are the parallelism unit;
    Common-Crawl WET shards are ~150 MB gzipped, which is exactly the
    task granularity the streaming executor wants).  The parser YIELDS
    a block every ``records_per_block`` records, so a task's live set
    is the compressed shard + one block — never the whole decompressed
    shard — and downstream stages start before the shard finishes."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(path)

    def _block(rows: list[dict]) -> pa.Table:
        return pa.table({
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "warc_date": pa.array([r["warc_date"] for r in rows],
                                  type=pa.string()),
            "n_bytes": pa.array([r["n_bytes"] for r in rows],
                                type=pa.int64()),
            "text": pa.array([r["text"] for r in rows],
                             type=pa.large_string()),
        })

    def parse(b: pa.Table) -> Iterator[pa.Table]:
        rows: list[dict] = []
        flushed = False
        for data in b["bytes"].to_pylist():
            for r in parse_wet_shard(data):
                rows.append(r)
                if len(rows) >= records_per_block:
                    yield _block(rows)
                    rows, flushed = [], True
        if rows or not flushed:
            # the schema-pinning empty yield only when NOTHING was
            # emitted (stray empty blocks are a Ray 2.49 hazard —
            # cf. scrub_empty_blocks)
            yield _block(rows)

    # batch_size=None: one task parses whole files (read_binary_files
    # makes one block per file, keeping tasks shard-granular)
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)


def _record_bytes(rtype: str, headers: dict[str, str], payload: bytes) -> bytes:
    out = io.BytesIO()
    out.write(b"WARC/1.0\r\n")
    out.write(f"WARC-Type: {rtype}\r\n".encode())
    for k, v in headers.items():
        if "\r" in v or "\n" in v or "\r" in k or "\n" in k:
            # CR/LF in a header value breaks WARC framing (header
            # injection) — the reader would reject or misparse the
            # shard; reject at write time instead.
            raise ValueError(
                f"WARC header {k!r} contains CR/LF — refusing to write "
                "a malformed shard")
        out.write(f"{k}: {v}\r\n".encode())
    out.write(f"Content-Length: {len(payload)}\r\n".encode())
    out.write(b"\r\n")
    out.write(payload)
    out.write(b"\r\n\r\n")
    return out.getvalue()


def write_wet_shard(records: Iterable[dict], path: str, *,
                    compression: str | None = "gz",
                    per_record_gzip: bool = True) -> None:
    """Write one WET shard (the test/staging inverse of the reader;
    atomic .part→rename like every engine sink, ≙ S9).

    ``records``: dicts with ``url``, ``text``, optional ``date`` and
    ``type`` (default ``conversion``; pass ``metadata``/``request``
    to plant records the reader must skip).  A leading ``warcinfo``
    record is always emitted — real WET shards carry one.  With
    ``per_record_gzip`` (the Common-Crawl layout) each record becomes
    its own gzip member."""
    import os
    import uuid

    chunks: list[bytes] = [_record_bytes(
        "warcinfo", {"WARC-Filename": os.path.basename(path)},
        b"software: refined-ray-wet-writer\r\n")]
    for r in records:
        payload = r["text"].encode("utf-8")
        headers = {
            "WARC-Target-URI": r["url"],
            "WARC-Date": r.get("date", "2024-01-01T00:00:00Z"),
        }
        chunks.append(_record_bytes(r.get("type", "conversion"),
                                    headers, payload))

    if compression == "gz":
        if per_record_gzip:
            raw = b"".join(gzip.compress(c) for c in chunks)
        else:
            raw = gzip.compress(b"".join(chunks))
    else:
        raw = b"".join(chunks)
    tmp = path + f".{uuid.uuid4().hex}.part"
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, path)
