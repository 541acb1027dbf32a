"""enwiki SQL-dump parsers — S3's ORIGINAL form.

≙ the reference's ``generate_wiki_id_to_title`` / ``generate_redirects``
(process_wiki.py:61-113), which regex-parse the multi-row
``INSERT INTO `page`/`redirect` VALUES (...),(...);`` lines of
``enwiki-latest-{page,redirect}.sql.gz``.  Re-expressed Ray-Data-first:
``read_binary_files`` over dump shards → one streaming parse task per
shard (the gz stream decompresses incrementally; tuples flow out as
Arrow rows under backpressure), then the page⋈redirect membership test
— a driver-side dict in the reference — becomes a distributed hash
join on page_id (the J2 join-chain shape).

Parsing contract kept from the reference (the observable behavior,
not the code):

- raw lines shorter than 500 bytes are skipped (process_wiki.py:68,
  96 — headers, CREATE TABLE, and lock statements never reach the
  regex);
- the ``INSERT INTO `page` VALUES (`` prefix is dropped by LENGTH
  (27 chars; 31 for redirect), rows split on ``),(``, and the edge
  rows lose their leading ``(`` / trailing ``);`` (:72-75, :100-103);
- page rows parse with the 13-group comma regex (:65) — the numeric
  groups anchor the backtracking, so the quoted title extracts
  intact even when it contains commas; only ``namespace == '0'``
  rows are kept and the title is stripped of its surrounding quotes
  (:80-84);
- redirect rows parse with the 5-group regex (:92), keep ns 0, and
  emit (source page's title, destination title) only when the source
  page_id exists in the ns-0 page table (:106-111).
"""

from __future__ import annotations

import gzip
import io
import re
from typing import Iterable, Iterator

_PAGE_PREFIX_LEN = len("INSERT INTO `page` VALUES (")          # 27
_REDIRECT_PREFIX_LEN = len("INSERT INTO `redirect` VALUES (")  # 31

_PAGE_RE = re.compile(
    "([0-9]+),([0-9]+),(.+),(.+),([0-9]+),([0-9]+),(.+),(.+),(.+),"
    "([0-9]+),([0-9]+),(.+),(.+)")
_REDIRECT_RE = re.compile("([0-9]+),([0-9]+),'(.+)','(.*)','(.*)'")

_MIN_INSERT_LINE = 500


def iter_insert_rows(lines: Iterable[bytes], prefix_len: int) -> Iterator[str]:
    """The reference's line→tuple split (process_wiki.py:68-75): skip
    short lines, drop the INSERT prefix by length, split on ``),(``
    and trim the edge parens."""
    for line in lines:
        if len(line) < _MIN_INSERT_LINE:
            continue
        parsed = line[prefix_len:].decode("utf-8")
        for x in parsed.split("),("):
            if not x:
                continue
            if x[0] == "(":
                x = x[1:]
            if x[-3:-1] == ");":
                x = x[:-3]
            yield x


def iter_page_rows(lines: Iterable[bytes]) -> Iterator[tuple[int, str]]:
    """(page_id, title) for every ns-0 row of a ``page`` dump shard."""
    for x in iter_insert_rows(lines, _PAGE_PREFIX_LEN):
        m = _PAGE_RE.match(x)
        if m is None:
            continue
        page_id, namespace, title = m.group(1), m.group(2), m.group(3)
        if namespace != "0":
            continue
        yield int(page_id), title[1:-1]


def iter_redirect_rows(lines: Iterable[bytes]) -> Iterator[tuple[int, str]]:
    """(source page_id, dest title) for every ns-0 row of a
    ``redirect`` dump shard."""
    for x in iter_insert_rows(lines, _REDIRECT_PREFIX_LEN):
        m = _REDIRECT_RE.match(x)
        if m is None:
            continue
        rd_from, namespace, dest = m.group(1), m.group(2), m.group(3)
        if namespace != "0":
            continue
        yield int(rd_from), dest


def _byte_lines(data: bytes) -> Iterator[bytes]:
    """Streaming raw lines of a (possibly gzipped) shard — incremental
    decompression, never the whole decompressed shard in memory."""
    buf = io.BytesIO(data)
    raw = gzip.GzipFile(fileobj=buf) if data[:2] == b"\x1f\x8b" else buf
    yield from raw


def _read_dump(path: str, row_iter, schema_cols):
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(path)
    (c0, t0), (c1, t1) = schema_cols

    def parse(b: pa.Table) -> pa.Table:
        a, bcol = [], []
        for data in b["bytes"].to_pylist():
            for v0, v1 in row_iter(_byte_lines(data)):
                a.append(v0)
                bcol.append(v1)
        return pa.table({c0: pa.array(a, type=t0), c1: pa.array(bcol, type=t1)})

    # one parse task per shard file (read_binary_files gives one block
    # per file); shards are the parallelism unit, like xmldump
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=None)


def read_page_sql(path: str):
    """Dataset(page_id:int64, title:string) from ``page.sql[.gz]``
    shard file(s) — ns-0 rows only (≙ wiki_id_to_title.json)."""
    import pyarrow as pa

    return _read_dump(path, iter_page_rows,
                      [("page_id", pa.int64()), ("title", pa.string())])


def read_redirect_sql(path: str):
    """Dataset(page_id:int64, dest_title:string) from
    ``redirect.sql[.gz]`` shard file(s) — ns-0 rows only."""
    import pyarrow as pa

    return _read_dump(path, iter_redirect_rows,
                      [("page_id", pa.int64()), ("dest_title", pa.string())])


def wiki_redirects(page_path: str, redirect_path: str,
                   num_partitions: int | None = None):
    """(wiki_title, dest_title) per resolvable ns-0 redirect — the
    reference's redirects.json (process_wiki.py:106-111), with the
    driver dict replaced by a distributed inner hash join on page_id."""
    from .. import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()
    pages = read_page_sql(page_path).rename_columns({"title": "wiki_title"})
    red = read_redirect_sql(redirect_path)
    return red.join(pages, join_type="inner", num_partitions=num_partitions,
                    on=("page_id",)).select_columns(["wiki_title", "dest_title"])


# ---------------------------------------------------------------------
# staging writer (test/fixture inverse of the readers)
# ---------------------------------------------------------------------


def write_sql_dump(path: str, table: str, rows: Iterable[str],
                   target_bytes: int = 900,
                   compression: str | None = "gz") -> None:
    """Write tuples (already-rendered ``v1,v2,...`` strings) as a
    MySQL-dump-shaped shard: header/DDL decoy lines (shorter than the
    500-byte gate, so the reader must skip them) followed by
    ``INSERT INTO `table` VALUES (...),(...);`` lines packed greedily
    to ~``target_bytes`` each; a short trailing batch merges into the
    previous line so every INSERT line clears the reference's 500-byte
    gate.  Atomic .part→rename (S9)."""
    import os
    import uuid

    prefix = f"INSERT INTO `{table}` VALUES "
    batches: list[list[str]] = []
    cur: list[str] = []
    cur_len = len(prefix)
    for r in rows:
        cur.append(f"({r})")
        cur_len += len(r) + 3
        if cur_len >= target_bytes:
            batches.append(cur)
            cur, cur_len = [], len(prefix)
    if cur:
        tail_len = len(prefix) + sum(len(t) + 1 for t in cur) + 1
        if batches and tail_len < _MIN_INSERT_LINE:
            batches[-1].extend(cur)
        else:
            batches.append(cur)

    out = io.StringIO()
    out.write("-- MySQL dump 10.13\n")
    out.write(f"DROP TABLE IF EXISTS `{table}`;\n")
    out.write(f"CREATE TABLE `{table}` (id int unsigned NOT NULL);\n")
    out.write("LOCK TABLES `" + table + "` WRITE;\n")
    for batch in batches:
        line = prefix + ",".join(batch) + ";"
        if len(line) + 1 < _MIN_INSERT_LINE:
            raise ValueError(
                f"INSERT line is {len(line)} bytes (< {_MIN_INSERT_LINE}); "
                f"the reference's short-line gate would drop it — stage "
                f"more rows per shard")
        out.write(line + "\n")
    out.write("UNLOCK TABLES;\n")

    raw = out.getvalue().encode("utf-8")
    if compression == "gz":
        raw = gzip.compress(raw)
    tmp = path + f".{uuid.uuid4().hex}.part"
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, path)


def page_tuple(page_id: int, ns: int, title: str, latest: int = 0,
               length: int = 100) -> str:
    """Render one 13-field ``page`` row in the dump's column order
    (page_id, namespace, title, restrictions, redirect, new, random,
    touched, links, latest, len, content_model, lang)."""
    return (f"{page_id},{ns},'{title}','',0,0,0.5,'20240101000000',"
            f"'20240101000001',{latest},{length},'wikitext',NULL")


def redirect_tuple(page_id: int, ns: int, dest_title: str) -> str:
    """Render one 5-field ``redirect`` row (rd_from, rd_namespace,
    rd_title, rd_interwiki, rd_fragment)."""
    return f"{page_id},{ns},'{dest_title}','',''"
