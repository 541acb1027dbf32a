"""Offline corpus-build DAG — the reference's third entry point.

≙ ``preprocess_all.py main()`` (/root/reference/src/refined/offline_data_generation/
preprocess_all.py:149-336): a multi-step artifact DAG — extract +
link-align pages (step 4, merge_files_and_extract_links.py:52-115) →
PEM build (step 5, generate_pem.py:46-170) → entity index from PEM
distinct (step 6, preprocess_all.py:112-122) → description embeddings
(step 7 / processor.py:525-553) — where every step is gated on its
output artifact and a rerun resumes.

Here each step is a Ray Data stage; with ``checkpoint_root`` set, each
stage checkpoints partitioned Parquet + a lineage manifest whose
fingerprint chains the upstream fingerprint (state/manifests.py), so a
rerun skips completed stages and an upstream parameter change
invalidates everything after it — the reference's file-existence
gating made partition-granular.

The corpus: the sandbox's ``documents`` table carries no hyperlinks,
so stage 1 deterministically synthesizes an anchor-bearing page per
document — every ``LINK_STRIDE``-th token becomes
``<a href="wiki/{source}">token</a>``.  That makes the END artifact
SQL-checkable: the PEM table must equal DuckDB counting every
stride-th token of ``documents.text`` directly (``SQL_OFFLINE_PEM``),
while the Ray side earns it the long way — HTML synthesis → anchor
extraction + cursor re-alignment (M4) → surface normalization (M1) →
the distributed PEM exchange (A1).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.normalize import NORMALIZE_SQL, normalize_surface_array
from ..functions.tokenize import TOKEN_SQL, tokenize_batch

LINK_STRIDE = 5
HREF_PREFIX = "wiki/"


def synth_linked_pages_batch(b: pa.Table, stride: int = LINK_STRIDE) -> pa.Table:
    """(doc_id, source, text) → (url, html): one page per document with
    every stride-th token wrapped in an anchor to the doc's entity."""
    doc_ids = b["doc_id"].to_pylist()
    sources = b["source"].to_pylist()
    texts = b["text"].to_pylist()
    flat, starts = tokenize_batch(texts)
    urls, htmls = [], []
    for i, (did, src) in enumerate(zip(doc_ids, sources)):
        toks = flat[starts[i]:starts[i + 1]]
        parts = [f'<a href="{HREF_PREFIX}{src}">{t}</a>' if j % stride == 0 else t
                 for j, t in enumerate(toks)]
        urls.append(f"https://offline.example/{did}")
        htmls.append(("<html><body>\n<p>" + " ".join(parts) + "</p></body></html>").encode())
    return pa.table({"url": pa.array(urls, type=pa.string()),
                     "html": pa.array(htmls, type=pa.large_binary())})


def _pages(sf_dir: str, stride: int):
    from .queries import _read

    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    return docs.map_batches(
        lambda b: synth_linked_pages_batch(b, stride), batch_format="pyarrow")


def _links(pages):
    from ..stages.extract import extract_links_batch

    return pages.map_batches(extract_links_batch, batch_format="pyarrow")


def _pem(links, num_partitions=None):
    from ..stages.pem import pem_from_pairs

    def to_pairs(b: pa.Table) -> pa.Table:
        surface = normalize_surface_array(b["surface"].combine_chunks())
        entity = pc.utf8_slice_codeunits(b["href"], len(HREF_PREFIX))
        keep = pc.not_equal(surface, "")
        return pa.table({"surface": surface, "entity": entity}).filter(keep)

    return pem_from_pairs(links.map_batches(to_pairs, batch_format="pyarrow"),
                          num_partitions)


def _entity_index(pem):
    """Distinct entities → contiguous int64 index (≙ A2,
    preprocess_all.py:112-122), via the shared distributed
    zip-with-index (stages/index.py)."""
    from ..stages.index import zip_with_index

    return zip_with_index(pem.select_columns(["entity"]), "entity",
                          out_col="entity_idx")


def _descriptions(index):
    """entity → deterministic hash-embedding description vector as a
    fixed-size-list column (≙ S11 float16 memmap artifact,
    processor.py:525-553; the hash embedding is the sandbox's
    sanctioned stand-in for the bi-encoder)."""
    from ..functions.embeddings import EMBED_DIM, embed_batch

    def embed(b: pa.Table) -> pa.Table:
        vecs = embed_batch(b["entity"].to_pylist()).astype(np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.ravel(), type=pa.float32()), EMBED_DIM)
        return b.append_column("description_emb", col)

    return index.map_batches(embed, batch_format="pyarrow")


def offline_build(sf_dir: str, checkpoint_root: str | None = None,
                  stride: int = LINK_STRIDE, num_partitions: int | None = None):
    """Run the DAG; returns the PEM Dataset (the SQL-checkable end
    artifact).  With ``checkpoint_root``, every stage (pages, links,
    pem, entity_index, descriptions) is checkpointed + resumable."""
    if checkpoint_root is None:
        return _pem(_links(_pages(sf_dir, stride)), num_partitions)

    from ..state.manifests import StageCheckpointer

    cp = StageCheckpointer(checkpoint_root)

    def fp(*parts) -> str:
        return hashlib.blake2b("|".join(str(p) for p in parts).encode(),
                               digest_size=16).hexdigest()

    fp_pages = fp("pages", sf_dir, stride)
    pages = cp.run_stage("pages", fp_pages, lambda: _pages(sf_dir, stride))
    fp_links = fp("links", fp_pages)
    links = cp.run_stage("links", fp_links, lambda: _links(pages))
    fp_pem = fp("pem", fp_links, num_partitions)
    pem = cp.run_stage("pem", fp_pem, lambda: _pem(links, num_partitions))
    fp_idx = fp("entity_index", fp_pem)
    index = cp.run_stage("entity_index", fp_idx, lambda: _entity_index(pem))
    fp_desc = fp("descriptions", fp_idx)
    cp.run_stage("descriptions", fp_desc, lambda: _descriptions(index))
    return pem


def q_offline_pem(sf_dir: str):
    """Catalog entry: the offline-build DAG's end artifact (uncheck-
    pointed dataflow; the checkpointed/resume path is unit-tested)."""
    return offline_build(sf_dir)


_TOKS = TOKEN_SQL.format(col="text")
_NORM = NORMALIZE_SQL.format(col="raw")

SQL_OFFLINE_PEM = f"""
WITH anchors AS (
  SELECT source AS entity,
         unnest(list_filter({_TOKS}, (x, i) -> (i - 1) % {LINK_STRIDE} = 0)) AS raw
  FROM documents
), norm AS (
  SELECT {_NORM} AS surface, entity FROM anchors
)
SELECT surface, entity, count(*) AS cnt,
       count(*) / CAST(sum(count(*)) OVER (PARTITION BY surface) AS DOUBLE) AS prob
FROM norm WHERE surface <> '' GROUP BY 1, 2
"""
