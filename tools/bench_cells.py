"""Table-linking throughput in cells/s — directly comparable to the
reference fork's headline metric (124-419 cells/s on a consumer GPU,
~6 texts/s single-process CPU; my_tests/logs/
experimental_results_wiki_2026-03-07.csv, BASELINE.md).

Every token of every sf document becomes one cell (row_id=doc_id,
col=token position), linked against the sf PEM table via
pipelines/table_linking.link_cells.  The cell table is materialized
UNTIMED; the timed span is normalize -> candidate attach -> per-cell
top-k -> consume, i.e. the per-cell linking work the reference logs.

Usage: python tools/bench_cells.py [sf_dir] [num_cpus]
"""

import json
import os
import sys
import time

import pyarrow as pa
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else int(os.environ.get("RAY_GRAFT_CPUS", 32))

ray.init(address="local", num_cpus=CPUS, include_dashboard=False)
from refined_ray import configure_data_context, read_parquet_clean  # noqa: E402

configure_data_context()

from refined_ray.functions.tokenize import tokenize_batch  # noqa: E402
from refined_ray.pipelines.queries import q_pem_table  # noqa: E402
from refined_ray.pipelines.table_linking import link_cells  # noqa: E402


def to_cells(b: pa.Table) -> pa.Table:
    texts = b["text"].to_pylist()
    ids = b["doc_id"].to_pylist()
    flat, starts = tokenize_batch(texts)
    rid, col, surf = [], [], []
    for i, did in enumerate(ids):
        toks = flat[starts[i]:starts[i + 1]]
        rid.extend([did] * len(toks))
        col.extend(f"c{j}" for j in range(len(toks)))
        surf.extend(toks)
    return pa.table({"row_id": pa.array(rid, type=pa.int64()),
                     "col": pa.array(col, type=pa.string()),
                     "surface": pa.array(surf, type=pa.string())})


docs = read_parquet_clean(f"{SF}/documents.parquet", columns=["doc_id", "text"])
cells = docs.map_batches(to_cells, batch_format="pyarrow").materialize()
n_cells = cells.count()
pem = q_pem_table(SF).materialize()  # side table build untimed, like the
# reference's model/LMDB load before its timed loop

t0 = time.time()
linked = link_cells(cells, pem, k=3)
n_out = linked.count()
wall = time.time() - t0

print(json.dumps({"metric": "table-linking throughput", "cells": n_cells,
                  "linked_rows": n_out, "sec": round(wall, 2),
                  "cells_per_sec": round(n_cells / wall, 1),
                  "sf": SF, "num_cpus": CPUS}))
ray.shutdown()
