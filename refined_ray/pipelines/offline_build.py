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


# ---------------------------------------------------------------------
# Offline DAG steps 2-3 and 8-10 (≙ preprocess_all.py:161-175, 242-252)
# — the Wikidata/Wikipedia side of the build, composed as checkpointed
# stages the same way steps 4-7 are above.
# ---------------------------------------------------------------------

ADD_CLASS = "Q16889133"  # "added by hand" seed class (class_selection.py:133)


def _subclass_parents_ref(fanout_dir: str):
    """Collect the subclass_p279 sink into a ``{qcode: parents}`` dict
    and broadcast it ONCE (``ray.put``).  Shared by the class-selection
    and class-matrix stages so one ``offline_build_wikidata`` call never
    pulls the (dump-scale) sink through the driver twice."""
    import ray

    from ..stages.wikidata_fanout import read_sink

    parents = {r["qcode"]: list(r["values"])
               for r in read_sink(fanout_dir, "subclass_p279").take_all()}
    return ray.put(parents)


def _class_selection_from_sinks(fanout_dir: str, n_classes: int,
                                parents_ref=None):
    """Step 8 distilled (≙ select_classes, class_selection.py:119-198;
    same aggregation core as queries_ext.q_class_selection): every
    entity in instance_of_p31 contributes the implied closure of its
    P31 classes, frequencies accumulate corpus-wide (per-batch partial
    counts — the shuffle moves class rows, never entity rows), top-N
    by (count desc, class asc); rank is the 1-based class_idx
    (≙ create_class_to_idx, generate_qcode_to_type_indices.py:101-106)."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.classdag import ClassDAG
    from ..stages.wikidata_fanout import read_sink

    ref = parents_ref if parents_ref is not None \
        else _subclass_parents_ref(fanout_dir)

    class ClosureCounts:
        def __init__(self):
            self.dag = ClassDAG(ray.get(ref))

        def __call__(self, b: pa.Table) -> pa.Table:
            from collections import Counter

            ctr: Counter = Counter()
            for vals in b["values"].to_pylist():
                ctr.update(self.dag.implied(frozenset(vals),
                                            remove_self=False))
            return pa.table({
                "class": pa.array(list(ctr.keys()), type=pa.string()),
                "cnt": pa.array(list(ctr.values()), type=pa.int64())})

    freq = read_sink(fanout_dir, "instance_of_p31") \
        .map_batches(ClosureCounts, batch_format="pyarrow",
                     concurrency=(1, 4)) \
        .groupby("class").aggregate(Sum("cnt", alias_name="n"))

    def topn(b: pa.Table, with_rank: bool = False) -> pa.Table:
        cls = b["class"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cls, -n))[:n_classes]
        out = {"class": pa.array(cls[order], type=pa.string()),
               "n": pa.array(n[order], type=pa.int64())}
        if with_rank:
            out["class_idx"] = pa.array(
                np.arange(1, len(order) + 1, dtype=np.int64))
        return pa.table(out)

    return freq.map_batches(topn, batch_format="pyarrow", batch_size=None) \
        .repartition(1) \
        .map_batches(lambda b: topn(b, with_rank=True),
                     batch_format="pyarrow", batch_size=None)


def _class_matrix(fanout_dir: str, chosen, parents_ref=None):
    """Step 9 (≙ create_tensors + get_qcode_classes,
    generate_qcode_to_type_indices.py:22-142): per entity, the direct
    class set is P106 values (bare — "subclasses will be used"),
    ``<sports,X>``/``<country,X>`` bracket forms, P31 values, and the
    class-marker ADD_CLASS when the qcode is itself a subclass key;
    then the implied closure with remove_self=True (the reference's
    default — a direct class only survives when implied by ANOTHER
    direct class, which also means bracket classes never reach the
    matrix: kept byte-faithful, quirk and all) intersected with the
    chosen set, mapped to class_idx, zero-padded to the global max
    width (2-pass A6) as a fixed-size int16 vector — the Arrow-native
    equivalent of the reference's int16 qcode_to_class_tns.

    Entity universe: the triples sink (every Q entity in the dump),
    matching the reference's keep_all_entities=True run mode.

    entity_idx assignment: Arrow hash joins cannot carry list payload
    columns, so instead of joining ``zip_with_index`` output back on,
    the sorted entity blocks tag their own contiguous indices from ONE
    metadata row per block (the stages/index.py offset trick) — zero
    extra shuffles."""
    import ray
    from ray.data.aggregate import Max

    from .. import scrub_empty_blocks
    from ..stages.classdag import ClassDAG
    from ..stages.wikidata_fanout import read_sink

    ref = parents_ref if parents_ref is not None \
        else _subclass_parents_ref(fanout_dir)
    cls_to_idx = {r["class"]: r["class_idx"] for r in chosen.take_all()}
    cls_ref = ray.put(cls_to_idx)

    triples = read_sink(fanout_dir, "triples").sort("qcode").materialize()

    class EntityClasses:
        def __init__(self):
            parents = ray.get(ref)
            cls_to_idx = ray.get(cls_ref)
            self.dag = ClassDAG(parents)
            self.subclass_keys = frozenset(parents)
            self.cls_to_idx = cls_to_idx
            self.chosen = frozenset(cls_to_idx)

        def __call__(self, b: pa.Table) -> pa.Table:
            qcodes = b["qcode"].to_pylist()
            p31 = b["P31"].to_pylist()
            p17 = b["P17"].to_pylist()
            p641 = b["P641"].to_pylist()
            p106 = b["P106"].to_pylist()
            out: list[list[int]] = []
            for q, i31, i17, i641, i106 in zip(qcodes, p31, p17, p641, p106):
                direct = set(i106 or [])
                direct.update(f"<sports,{x}>" for x in (i641 or []))
                direct.update(f"<country,{x}>" for x in (i17 or []))
                direct.update(i31 or [])
                if q in self.subclass_keys:
                    direct.add(ADD_CLASS)
                implied = self.dag.implied(frozenset(direct),
                                           remove_self=True) & self.chosen
                out.append(sorted(self.cls_to_idx[c] for c in implied))
            return pa.table({
                "qcode": pa.array(qcodes, type=pa.string()),
                "class_ids": pa.array(out, type=pa.list_(pa.int16())),
                "n_classes": pa.array([len(x) for x in out],
                                      type=pa.int64())})

    lists = triples.map_batches(EntityClasses, batch_format="pyarrow",
                                concurrency=(1, 4)).materialize()
    lists = scrub_empty_blocks(
        lists, fallback_schema=pa.schema([
            ("qcode", pa.string()),
            ("class_ids", pa.list_(pa.int16())),
            ("n_classes", pa.int64())]))
    width = lists.aggregate(Max("n_classes"))["max(n_classes)"] or 0
    width = max(int(width), 1)

    # per-block (first qcode, rows) → global start offsets: qcodes are
    # sorted and distinct, so a block's first key identifies it
    def block_meta(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"first": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({"first": pa.array([b["qcode"][0].as_py()]),
                         "n": pa.array([b.num_rows], type=pa.int64())})

    meta = sorted((r["first"], r["n"]) for r in
                  lists.map_batches(block_meta, batch_format="pyarrow",
                                    batch_size=None).take_all())
    offsets, acc = {}, 0
    for first, n in meta:
        offsets[first] = acc
        acc += n
    off_ref = ray.put(offsets)

    def pad(b: pa.Table, _ref=off_ref) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "qcode": pa.array([], type=pa.string()),
                "entity_idx": pa.array([], type=pa.int64()),
                "class_ids": pa.array(
                    [], type=pa.list_(pa.int16(), width))})
        ids = b["class_ids"].to_pylist()
        flat = np.zeros((len(ids), width), dtype=np.int16)
        for i, row in enumerate(ids):
            flat[i, :len(row)] = row
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.ravel(), type=pa.int16()), width)
        base = ray.get(_ref)[b["qcode"][0].as_py()]
        return pa.table({
            "qcode": b["qcode"],
            "entity_idx": pa.array(
                base + np.arange(b.num_rows, dtype=np.int64),
                type=pa.int64()),
            "class_ids": col})

    return lists.map_batches(pad, batch_format="pyarrow", batch_size=None)


def _class_labels(fanout_dir: str, chosen):
    """Step 10 (≙ build_class_labels, preprocess_all.py:125-146):
    chosen class → human label; ``<relation,qcode>`` forms get the
    inner qcode resolved (``<relation,label>``), plain qcodes map to
    their label or stay verbatim.  Chosen is top-N (driver-small by
    construction); the label lookup is one filtered pass over the
    qcode_to_label sink — no full-sink collection."""
    import ray.data as rd

    from ..stages.wikidata_fanout import read_sink

    rows = chosen.take_all()
    needed: set[str] = set()
    inner: dict[str, str] = {}
    for r in rows:
        cls = r["class"]
        if "<" in cls:
            q = cls.split(",")[1][:-1]
            inner[cls] = q
            needed.add(q)
        else:
            needed.add(cls)
    labels = {}
    if needed:
        need = needed  # closure capture (side-table sized: ≤ n_classes)
        filt = read_sink(fanout_dir, "qcode_to_label").map_batches(
            lambda b: b.filter(pc.is_in(b["qcode"],
                                        pa.array(sorted(need)))),
            batch_format="pyarrow")
        labels = {r["qcode"]: r["values"] for r in filt.take_all()}
    out = []
    for r in rows:
        cls = r["class"]
        if cls in inner:
            q = inner[cls]
            rel = cls.split(",")[0][1:]
            out.append((cls, f"<{rel},{labels.get(q, q)}>"))
        else:
            out.append((cls, labels.get(cls, cls)))
    return rd.from_arrow(pa.table({
        "class": pa.array([c for c, _ in out], type=pa.string()),
        "class_label": pa.array([l for _, l in out], type=pa.string())}))


def offline_build_wikidata(dump_path: str, page_sql: str, redirect_sql: str,
                           checkpoint_root: str, n_classes: int = 10):
    """Offline DAG steps 2-3 + 8-10 as fingerprint-chained checkpointed
    stages (the complement of ``offline_build``'s steps 4-7):

      wd_fanout        step 2  — ONE dump pass → 16 partitioned sinks
      redirects        step 3  — page.sql.gz ⋈ redirect.sql.gz
      class_selection  step 8  — closure counts → top-N + class_idx
      class_matrix     step 9  — per-entity padded class-idx vectors
      class_labels     step 10 — chosen class → label lookup

    Returns ``{stage: artifact}`` where wd_fanout maps to its sink root
    and the rest to Datasets.  A rerun skips completed stages; a
    changed upstream input/param invalidates everything after it."""
    from ..sources.sqldump import wiki_redirects
    from ..stages.wikidata_fanout import wikidata_fanout
    from ..state.manifests import StageCheckpointer

    cp = StageCheckpointer(checkpoint_root)

    def fp(*parts) -> str:
        return hashlib.blake2b("|".join(str(p) for p in parts).encode(),
                               digest_size=16).hexdigest()

    fp_fan = fp("wd_fanout", dump_path)
    fan_dir = cp.run_custom_stage(
        "wd_fanout", fp_fan, lambda d: wikidata_fanout(dump_path, d))

    fp_red = fp("redirects", page_sql, redirect_sql)
    redirects = cp.run_stage("redirects", fp_red,
                             lambda: wiki_redirects(page_sql, redirect_sql))

    # the subclass-parents broadcast is shared by steps 8 and 9 but
    # loaded LAZILY — a fully-checkpointed rerun never touches the sink
    memo: dict = {}

    def parents_ref():
        if "ref" not in memo:
            memo["ref"] = _subclass_parents_ref(fan_dir)
        return memo["ref"]

    fp_sel = fp("class_selection", fp_fan, n_classes)
    chosen = cp.run_stage(
        "class_selection", fp_sel,
        lambda: _class_selection_from_sinks(fan_dir, n_classes,
                                            parents_ref=parents_ref()))

    fp_mat = fp("class_matrix", fp_sel)
    matrix = cp.run_stage(
        "class_matrix", fp_mat,
        lambda: _class_matrix(fan_dir, chosen, parents_ref=parents_ref()))

    fp_lab = fp("class_labels", fp_sel)
    labels = cp.run_stage("class_labels", fp_lab,
                          lambda: _class_labels(fan_dir, chosen))

    return {"wd_fanout": fan_dir, "redirects": redirects,
            "class_selection": chosen, "class_matrix": matrix,
            "class_labels": labels}
