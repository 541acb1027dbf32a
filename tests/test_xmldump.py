"""S2 original form: streamed XML dump reader (sources/xmldump.py) —
scanner gates ≙ the reference's pages_from (wiki_extractor.py:2779-2846)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from refined_ray.sources.xmldump import (
    iter_pages, parse_dump_shard, read_xml_pages, write_xml_shard)


def _roundtrip(pages, tmp_path, compression="bz2", **kw):
    p = os.path.join(tmp_path, f"shard.xml.{compression or 'xml'}")
    write_xml_shard(pages, p, compression=compression)
    with open(p, "rb") as f:
        return list(parse_dump_shard(f.read(), **kw))


def test_xml_roundtrip_multiline_and_entities(tmp_path):
    text = "line one & <tag> \"quoted\"\nline two\n\nlast <b>bold</b>"
    got = _roundtrip([{"page_id": 7, "title": "A & B <C>", "revid": 9,
                       "text": text}], tmp_path)
    assert len(got) == 1
    assert got[0]["page_id"] == 7
    assert got[0]["revid"] == 9
    assert got[0]["title"] == "A & B <C>"
    assert got[0]["text"] == text  # byte-identical through escape/unescape


def test_xml_redirect_and_duplicate_id_skipped(tmp_path):
    got = _roundtrip([
        {"page_id": 1, "title": "one", "text": "t1"},
        {"page_id": 2, "title": "redir", "text": "x", "redirect": True},
        {"page_id": 1, "title": "one dup", "text": "t1 dup"},
        {"page_id": 3, "title": "three", "text": "t3"},
    ], tmp_path)
    # redirect skipped; consecutive duplicate of the last YIELDED id
    # skipped (redirect page in between does not update last_id)
    assert [(p["page_id"], p["title"]) for p in got] == [(1, "one"),
                                                         (3, "three")]


def test_xml_self_closing_and_empty_text(tmp_path):
    got = _roundtrip([
        {"page_id": 1, "title": "sc", "text": "", "self_closing_text": True},
        {"page_id": 2, "title": "empty", "text": ""},
    ], tmp_path)
    assert [(p["page_id"], p["text"]) for p in got] == [(1, ""), (2, "")]


@pytest.mark.parametrize("compression", ["bz2", "gz", None])
def test_xml_compression_sniffing(tmp_path, compression):
    got = _roundtrip([{"page_id": 5, "title": "t", "text": "body"}],
                     tmp_path, compression=compression)
    assert got == [{"page_id": 5, "revid": 5, "title": "t", "ns": "0",
                    "text": "body"}]


def test_iter_pages_first_id_is_page_second_is_revid():
    lines = [
        "<page>\n", "  <title>X</title>\n", "  <ns>0</ns>\n",
        "  <id>11</id>\n", "  <revision>\n", "    <id>22</id>\n",
        "    <text>hello</text>\n", "  </revision>\n", "</page>\n",
    ]
    (p,) = iter_pages(lines)
    assert (p["page_id"], p["revid"]) == (11, 22)


def test_read_xml_pages_dataset_ns_filter(ray_session, tmp_path):
    d = str(tmp_path)
    write_xml_shard([
        {"page_id": 1, "title": "a", "text": "aa"},
        {"page_id": 2, "title": "Template:b", "ns": "10", "text": "tpl"},
    ], os.path.join(d, "s0.xml.bz2"))
    write_xml_shard([
        {"page_id": 3, "title": "c", "text": "cc\nmore"},
    ], os.path.join(d, "s1.xml.bz2"))

    rows = read_xml_pages(d).take_all()
    assert sorted((r["page_id"], r["text"]) for r in rows) == [
        (1, "aa"), (3, "cc\nmore")]
    rows_all = read_xml_pages(d, ns_filter=None).take_all()
    assert sorted(r["page_id"] for r in rows_all) == [1, 2, 3]
    # pinned schema
    t = read_xml_pages(d).schema()
    types = dict(zip(t.names, t.types))
    assert types["page_id"] == pa.int64()
    assert types["text"] == pa.large_string()


def test_iter_pages_revid_last_id_wins_contributor():
    # Round-3 ADVICE: real MediaWiki dumps carry <contributor><id>
    # after the revision id; the reference's pages_from assigns every
    # subsequent <id> to revid (last-id-wins), so ours must too.
    lines = [
        "<page>\n", "  <title>X</title>\n", "  <ns>0</ns>\n",
        "  <id>11</id>\n", "  <revision>\n", "    <id>22</id>\n",
        "    <contributor>\n", "      <id>33</id>\n",
        "    </contributor>\n",
        "    <text>hello</text>\n", "  </revision>\n", "</page>\n",
    ]
    (p,) = iter_pages(lines)
    assert (p["page_id"], p["revid"]) == (11, 33)
