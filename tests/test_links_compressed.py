"""Tests for anchor extraction with offset re-alignment (M4) and
compressed-JSONL reading (S1)."""

from __future__ import annotations

import bz2
import gzip
import json

import pyarrow as pa


def _page(body: str) -> bytes:
    return f"<html><body><p>{body}</p></body></html>".encode()


def test_extract_links_offsets_index_extracted_text():
    from refined_ray.stages.extract import extract_links_batch, extract_text_batch

    body = 'See <a href="https://a.example/x">Alpha</a> and <a href="https://b.example/y">Beta Corp</a>.'
    batch = pa.table({"url": ["u1"], "html": [_page(body)]})
    links = extract_links_batch(batch).to_pylist()
    text = extract_text_batch(batch)["extracted_text"][0].as_py()
    assert [l["href"] for l in links] == ["https://a.example/x", "https://b.example/y"]
    assert [l["surface"] for l in links] == ["Alpha", "Beta Corp"]
    for l in links:
        assert text[l["start"]:l["end"]] == l["surface"]


def test_extract_links_repeated_surface_cursor_moves_forward():
    from refined_ray.stages.extract import extract_links_batch

    body = '<a href="h1">Twin</a> mid <a href="h2">Twin</a>'
    links = extract_links_batch(
        pa.table({"url": ["u"], "html": [_page(body)]})).to_pylist()
    assert len(links) == 2
    assert links[0]["start"] < links[1]["start"]  # same surface, later offset


def test_extract_links_unescapes_entities():
    from refined_ray.stages.extract import extract_links_batch, extract_text_batch

    body = '<a href="h">A &amp; B</a>'
    batch = pa.table({"url": ["u"], "html": [_page(body)]})
    links = extract_links_batch(batch).to_pylist()
    assert links[0]["surface"] == "A & B"
    text = extract_text_batch(batch)["extracted_text"][0].as_py()
    assert text[links[0]["start"]:links[0]["end"]] == "A & B"


def test_read_jsonl_bz2_and_gzip_roundtrip(ray_session, tmp_path):
    from refined_ray.sources.jsonl import read_jsonl

    rows = [{"qcode": f"Q{i}", "values": [i, i + 1]} for i in range(50)]
    raw = "".join(json.dumps(r) + "\n" for r in rows).encode()
    p_bz2 = tmp_path / "rel.jsonl.bz2"
    p_bz2.write_bytes(bz2.compress(raw))
    p_gz = tmp_path / "rel.jsonl.gz"
    p_gz.write_bytes(gzip.compress(raw))

    for p in (p_bz2, p_gz):
        got = sorted(read_jsonl(str(p)).take_all(), key=lambda r: int(r["qcode"][1:]))
        assert len(got) == 50
        assert got[0]["qcode"] == "Q0" and list(got[0]["values"]) == [0, 1]
        assert got[49]["qcode"] == "Q49"
