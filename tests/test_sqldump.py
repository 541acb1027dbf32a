"""Unit tests for the enwiki SQL-dump parsers (sources/sqldump.py —
reference contract: process_wiki.py:61-113).  The distributed path is
oracle-gated by the ``wiki_redirects`` catalog query."""

import gzip

import pytest

from refined_ray.sources.sqldump import (_byte_lines, iter_insert_rows,
                                         iter_page_rows, iter_redirect_rows,
                                         page_tuple, redirect_tuple,
                                         write_sql_dump)


def _page_line(tuples):
    return ("INSERT INTO `page` VALUES "
            + ",".join(f"({t})" for t in tuples) + ";\n").encode()


def test_short_lines_skipped():
    # the 500-byte gate: headers/DDL never reach the regex
    lines = [b"-- MySQL dump 10.13\n",
             b"CREATE TABLE `page` (id int);\n",
             _page_line([page_tuple(1, 0, "Kept")])]
    assert len(lines[2]) < 500  # a real short INSERT line is ALSO dropped
    assert list(iter_page_rows(lines)) == []


def test_page_rows_parse_and_ns_filter():
    tuples = [page_tuple(10, 0, "Alpha"), page_tuple(11, 1, "Talk_Alpha"),
              page_tuple(12, 0, "Comma, Title")] * 10
    out = list(iter_page_rows([_page_line(tuples)]))
    # ns=1 dropped; comma title survives the greedy regex backtracking
    assert out[:2] == [(10, "Alpha"), (12, "Comma, Title")]
    assert len(out) == 20


def test_redirect_rows_parse():
    tuples = [redirect_tuple(10, 0, "Dest"), redirect_tuple(11, 1, "BadNs"),
              redirect_tuple(12, 0, "Has, Comma")] * 14
    out = list(iter_redirect_rows([("INSERT INTO `redirect` VALUES "
                                    + ",".join(f"({t})" for t in tuples)
                                    + ";\n").encode()]))
    assert out[:2] == [(10, "Dest"), (12, "Has, Comma")]
    assert len(out) == 28


def test_edge_paren_strip():
    # first tuple loses "(", last loses ");" — middle split on "),("
    tuples = [page_tuple(i, 0, f"T{i}") for i in range(10)]
    rows = list(iter_insert_rows([_page_line(tuples)], len("INSERT INTO `page` VALUES (")))
    assert rows[0].startswith("0,0,'T0'")
    assert rows[-1].startswith("9,0,'T9'") and not rows[-1].endswith(";")


def test_write_sql_dump_round_trip(tmp_path):
    rows = [page_tuple(i, i % 3, f"Page_{i}") for i in range(200)]
    p = str(tmp_path / "page.sql.gz")
    write_sql_dump(p, "page", rows)
    data = open(p, "rb").read()
    assert data[:2] == b"\x1f\x8b"
    # every INSERT line clears the 500-byte gate
    for line in gzip.decompress(data).splitlines():
        if line.startswith(b"INSERT"):
            assert len(line) + 1 >= 500
    got = list(iter_page_rows(_byte_lines(data)))
    assert got == [(i, f"Page_{i}") for i in range(200) if i % 3 == 0]


def test_write_sql_dump_merges_short_tail(tmp_path):
    # 21 tuples at ~95 bytes → the last greedy batch would be short;
    # it must merge into the previous line, not emit a sub-500 line
    rows = [page_tuple(i, 0, f"Page_{i}") for i in range(21)]
    p = str(tmp_path / "page.sql.gz")
    write_sql_dump(p, "page", rows, target_bytes=900)
    got = list(iter_page_rows(_byte_lines(open(p, "rb").read())))
    assert got == [(i, f"Page_{i}") for i in range(21)]


def test_write_sql_dump_too_small_fails_loudly(tmp_path):
    with pytest.raises(ValueError, match="500"):
        write_sql_dump(str(tmp_path / "p.sql.gz"), "page",
                       [page_tuple(1, 0, "OnlyOne")])


def test_round_trip_property_titles():
    """Property test: any title over the dump-safe alphabet (no quotes
    or backslashes — MySQL would escape those; the reference regex
    does not unescape) survives write → 500-byte gate → regex parse,
    including commas, spaces, parens and unicode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # the ONE dump-unsafe substring is "),(" — the reference splits
    # rows on it blindly (process_wiki.py:72), so a title containing it
    # breaks the reference parser too; everything else (commas, spaces,
    # parens, unicode) must round-trip
    title = st.text(
        alphabet="abcXYZ09 ,.()-_éß",
        min_size=1, max_size=30,
    ).filter(lambda t: t == t.strip() and "),(" not in t)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(title, min_size=8, max_size=40))
    def check(titles):
        import os
        import tempfile

        rows = [page_tuple(i, 0, t) for i, t in enumerate(titles)]
        fd, p = tempfile.mkstemp(suffix=".sql.gz")
        os.close(fd)
        try:
            write_sql_dump(p, "page", rows)
            got = list(iter_page_rows(_byte_lines(open(p, "rb").read())))
        finally:
            os.remove(p)
        assert got == list(enumerate(titles))

    check()
