"""Unit tests for the WET (WARC conversion) shard reader: round-trip,
multi-member gzip, Content-Length payload math vs embedded fake
records, case-insensitive headers, loud failure on corrupt input."""

from __future__ import annotations

import gzip
import io

import pytest

from refined_ray.sources.wet import (_record_bytes, iter_wet_records,
                                     parse_wet_shard, write_wet_shard)

RECS = [
    {"url": "http://a.com/1", "date": "2024-03-05T00:00:00Z",
     "text": "hello world"},
    # payload with blank lines AND an embedded WARC marker: only
    # Content-Length counting parses past this correctly
    {"url": "http://a.com/2", "date": "2024-03-06T00:00:00Z",
     "text": "para one\r\n\r\nWARC/1.0\r\nWARC-Type: conversion\r\n\r\npara two"},
    {"url": "http://a.com/3", "date": "2024-03-07T00:00:00Z",
     "text": "unicode: éß中文"},
]


def _roundtrip(tmp_path, **kw):
    p = str(tmp_path / "shard.warc.wet.gz")
    write_wet_shard(RECS, p, **kw)
    with open(p, "rb") as f:
        got = list(parse_wet_shard(f.read()))
    assert [(r["url"], r["warc_date"], r["text"]) for r in got] == \
        [(r["url"], r["date"], r["text"]) for r in RECS]
    # n_bytes is the utf-8 OCTET length, not the char count
    assert got[2]["n_bytes"] == len(RECS[2]["text"].encode("utf-8"))


def test_roundtrip_per_record_gzip(tmp_path):
    """The Common-Crawl layout: one gzip member per record."""
    _roundtrip(tmp_path, compression="gz", per_record_gzip=True)


def test_roundtrip_single_member_gzip(tmp_path):
    _roundtrip(tmp_path, compression="gz", per_record_gzip=False)


def test_roundtrip_plain(tmp_path):
    _roundtrip(tmp_path, compression=None)


def test_skips_non_conversion_records(tmp_path):
    p = str(tmp_path / "s.wet")
    write_wet_shard(
        [{"type": "request", "url": "http://d/req", "text": "GET /"},
         RECS[0],
         {"type": "metadata", "url": "http://d/meta",
          "text": "WARC/1.0\r\nWARC-Type: conversion\r\n"
                  "Content-Length: 4\r\n\r\nBOOM"}],
        p, compression=None)
    with open(p, "rb") as f:
        got = list(parse_wet_shard(f.read()))
    # warcinfo + request + metadata (with its embedded fake) all skipped
    assert [r["url"] for r in got] == ["http://a.com/1"]


def test_header_names_case_insensitive():
    raw = (b"WARC/1.0\r\n"
           b"warc-type: Conversion\r\n"
           b"WARC-TARGET-URI: http://x/1\r\n"
           b"content-length: 2\r\n\r\nhi\r\n\r\n")
    got = list(parse_wet_shard(raw))
    assert len(got) == 1 and got[0]["text"] == "hi"


def test_truncated_payload_fails_loudly():
    raw = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
           b"Content-Length: 99\r\n\r\nshort")
    with pytest.raises(ValueError, match="truncated"):
        list(iter_wet_records(io.BytesIO(raw)))


def test_non_warc_input_fails_loudly():
    with pytest.raises(ValueError, match="version line"):
        list(iter_wet_records(io.BytesIO(b"not a warc stream\r\n")))


def test_multi_member_gzip_stream_concatenates():
    a = gzip.compress(_record_bytes(
        "conversion", {"WARC-Target-URI": "http://m/1"}, b"one"))
    b = gzip.compress(_record_bytes(
        "conversion", {"WARC-Target-URI": "http://m/2"}, b"two"))
    got = list(parse_wet_shard(a + b))
    assert [r["text"] for r in got] == ["one", "two"]


def test_mojibake_payload_does_not_kill_the_shard():
    """One invalid UTF-8 byte in a record must not abort the task:
    mojibake decodes with replacement; n_bytes stays the RAW octet
    count; neighbouring valid records are untouched."""
    raw = (_record_bytes("conversion",
                         {"WARC-Target-URI": "http://m/bad"}, b"a\xffb")
           + _record_bytes("conversion",
                           {"WARC-Target-URI": "http://m/ok"}, b"fine"))
    got = list(parse_wet_shard(raw))
    assert [r["url"] for r in got] == ["http://m/bad", "http://m/ok"]
    assert got[0]["text"] == "a�b" and got[0]["n_bytes"] == 3
    assert got[1]["text"] == "fine"
