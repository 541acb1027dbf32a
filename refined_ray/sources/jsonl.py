"""JSONL sources/sinks — the reference's native record format.

≙ the reference's line-by-line JSONL loaders (loaders.py:17-288, one
``ujson.loads`` per line over 14 lookup files) and its ``.part`` →
atomic-rename JSONL writers (process_wikidata_dump.py:94-211), as Ray
Data equivalents:

- ``read_jsonl``   — `ray.data.read_json` with cluster-sized read
                     parallelism (lines parsed in Arrow, not python).
- ``write_jsonl``  — partitioned ``.jsonl`` files via map_batches
                     tasks, each written to a temp name then atomically
                     renamed (a torn run never leaves half a file).
- ``jsonl_to_parquet`` — one-pass converter (the first step any JSONL
                     corpus takes into this engine; parquet from then
                     on for column pruning).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa


# extension → Arrow CompressedInputStream codec (≙ the reference's
# bz2-streamed dump readers, process_wikidata_dump.py:51-215).  A
# compressed file is NOT splittable: it reads as one task — fine for
# side tables; for corpus-scale inputs convert once via
# ``jsonl_to_parquet`` (which also buys column pruning).
_COMPRESSION_BY_EXT = {".gz": "gzip", ".bz2": "bz2", ".zst": "zstd"}


def read_jsonl(path: str, **kwargs):
    import ray
    import ray.data as rd

    from .. import configure_data_context

    configure_data_context()
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    kwargs.setdefault("override_num_blocks", 2 * cpus)
    comp = _COMPRESSION_BY_EXT.get(os.path.splitext(path)[1])
    if comp:
        kwargs.setdefault("arrow_open_stream_args", {"compression": comp})
        kwargs.setdefault("file_extensions", None)
    return rd.read_json(path, **kwargs)


def write_jsonl(ds, out_dir: str) -> int:
    """Write a Dataset as a directory of .jsonl files (one per block),
    atomic per file.  Returns number of files written."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        name = uuid.uuid4().hex
        tmp = os.path.join(out_dir, f".{name}.part")
        with open(tmp, "w") as f:
            for row in batch.to_pylist():
                f.write(json.dumps(row, default=str) + "\n")
        os.rename(tmp, os.path.join(out_dir, f"{name}.jsonl"))
        return pa.table({"files": pa.array([1], type=pa.int64())})

    marker = ds.map_batches(write_block, batch_format="pyarrow", batch_size=None)
    return int(marker.count())


def jsonl_to_parquet(jsonl_path: str, parquet_dir: str):
    ds = read_jsonl(jsonl_path)
    ds.write_parquet(parquet_dir)
    return parquet_dir


def read_wikidata_dump(path: str, **kwargs):
    """Stream a Wikidata ``latest-all.json[.bz2]`` dump ARRAY into
    projected entity rows (S1+M5).

    ≙ the reference's parse loop (process_wikidata_dump.py:132-141):
    skip the ``[`` / ``]`` wrapper lines (len < 3), strip each line's
    trailing comma, JSON-parse, project with
    ``functions/wikidata.project_entity`` (non-Q items dropped, as the
    reference does for every lookup except its pcodes sidecar).

    One compressed file is unsplittable → one read task; point ``path``
    at a directory of pre-split shards (the reference pre-splits with
    line-range sharding) for parallel reads.  Output schema is pinned
    (``entity_schema``) so empty/filtered blocks cannot drift.
    """
    import ray.data as rd

    from ..functions.wikidata import entities_to_table, project_entity

    comp = _COMPRESSION_BY_EXT.get(os.path.splitext(path)[1])
    if comp:
        kwargs.setdefault("arrow_open_stream_args", {"compression": comp})
        kwargs.setdefault("file_extensions", None)
    ds = rd.read_text(path, **kwargs)

    def parse(b: pa.Table) -> pa.Table:
        rows = []
        for line in b["text"].to_pylist():
            if len(line) < 3:
                continue
            ent = json.loads(line.rstrip().rstrip(","))
            row = project_entity(ent)
            if row is not None:
                rows.append(row)
        return entities_to_table(rows)

    return ds.map_batches(parse, batch_format="pyarrow")


def write_wikidata_dump(entities, path: str) -> None:
    """Write raw entity dicts as one dump-ARRAY shard — the staging
    inverse of ``read_wikidata_dump`` (``[`` wrapper line, one JSON
    entity per line with a trailing comma, last entity bare, ``]``
    wrapper), bz2/gzip by extension, atomic .part→rename (S9)."""
    import bz2
    import gzip

    ext = os.path.splitext(path)[1]
    opener = {".bz2": bz2.open, ".gz": gzip.open}.get(ext, open)
    ents = list(entities)
    tmp = path + f".part-{uuid.uuid4().hex}"
    with opener(tmp, "wt", encoding="utf-8") as f:
        f.write("[\n")
        for i, ent in enumerate(ents):
            tail = "\n" if i == len(ents) - 1 else ",\n"
            f.write(json.dumps(ent, ensure_ascii=False) + tail)
        f.write("]\n")
    os.replace(tmp, path)
