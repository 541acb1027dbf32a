"""Deterministic synthetic Common-Crawl-style web-page table.

BASELINE.json input_hint mandates the engine's input shape:
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``.  No external data is allowed in the sandbox, so this
module derives that table deterministically from the driver's
``documents.parquet`` (doc_id, text, lang, source):

- every document is "served" at 1–3 urls (origin + mirrors);
- mirror copies apply a small deterministic token dropout (seeded by
  (doc_id, variant)), producing the near-duplicate pages a web-scale
  record-linkage pipeline must re-cluster;
- ``html`` wraps the page text in a fixed template; the extraction
  stage (stages/extract.py) must recover ``text`` byte-identically
  from ``html`` — the per-row invariant the driver checks;
- ``ref_doc_id`` carries the source document id, and ``entity_id``
  the ground-truth cluster label: the driver's documents table
  deliberately contains near-duplicate documents (shingle-Jaccard
  ≥ 0.8 across doc_ids, with a clean empirical gap — nothing between
  0.2 and 0.8 at any sf), so the true entity is the connected
  component of the exact-Jaccard ≥ 0.5 relation over documents,
  computed here by exact set intersection + union-find (NOT MinHash —
  the ground truth must not share the pipeline's approximations).
  Both columns are EVAL-ONLY: no pipeline stage may read them.

Generation is pure per-row (seeded by doc_id), so the same table comes
out regardless of process count or partitioning; files are written
once per sf_dir to a cache under /tmp and reused (atomic rename).
"""

from __future__ import annotations

import html as _html
import os
import tempfile
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CACHE_ROOT = "/tmp/refined_ray_data/v2"
DROPOUT_RATE = 0.03
ENTITY_JACCARD_THRESHOLD = 0.5
_BASE_TS = datetime(2024, 1, 1)

HTML_PREFIX = '<html><head><meta charset="utf-8"/><title>{title}</title></head><body>\n<h1>{title}</h1>\n<p>'
HTML_SUFFIX = "</p>\n<footer>host={host}</footer>\n</body></html>"


def _n_variants(doc_id: int) -> int:
    return 1 + (doc_id % 3)


def _mutate(text: str, doc_id: int, variant: int) -> str:
    """Deterministic ~3% token dropout for mirror copies (variant ≥ 1).

    Drops are capped at max(1, n_tokens // 25) so even 10-token pages
    keep shingle-Jaccard ≥ ~0.45 vs their origin — the recall floor the
    LSH geometry (64 bands × 2 rows) is sized against.
    """
    if variant == 0:
        return text
    toks = text.split(" ")
    rng = np.random.default_rng(np.uint64(doc_id) * np.uint64(1_000_003) + np.uint64(variant))
    drop = rng.random(len(toks)) < DROPOUT_RATE
    max_drops = max(1, len(toks) // 25)
    drop_idx = np.nonzero(drop)[0][:max_drops]
    keep = np.ones(len(toks), dtype=bool)
    keep[drop_idx] = False
    return " ".join(t for t, k in zip(toks, keep) if k)


def _page_url(source: str, doc_id: int, variant: int) -> str:
    host = f"{source}.example.org" if variant == 0 else f"mirror{variant}.{source}.example.org"
    return f"https://{host}/d{doc_id:08d}"


# -- benchmark-scale amplification ------------------------------------
#
# The sf tables cap at 5000 documents; scaling benchmarks need corpora
# large enough that compute dominates fixed orchestration cost.  Two
# deterministic, ground-truth-preserving knobs:
#
# - ``fatten=F``: every base text's token stream is repeated F times,
#   each repetition with 5% seeded dropout.  Shingle SETS are nearly
#   unchanged, so the entity structure (exact-Jaccard components) is
#   recomputed on the fattened texts and stays clean.
# - ``amplify=K``: K corpus copies; copy c>0 deterministically rewrites
#   the VOCABULARY (every token t -> t + "c<c>x").  The rewrite is
#   a bijection on tokens, uniform across all docs of the copy, so
#   within-copy Jaccard — and hence the entity ground truth — is
#   IDENTICAL to the base corpus, while cross-copy 3-shingle Jaccard
#   collapses to ~0.02 (a shingle survives in both copies only if all
#   3 tokens are unmutated in both: 0.36^3).  Entity ids and doc ids
#   are offset by c * 10^7.

COPY_ID_STRIDE = 10_000_000



def _fatten_text(text: str, doc_id: int, fatten: int) -> str:
    if fatten <= 1:
        return text
    toks = text.split(" ")
    parts = list(toks)
    for r in range(1, fatten):
        rng = np.random.default_rng(np.uint64(doc_id) * np.uint64(9_000_011) + np.uint64(r))
        keep = rng.random(len(toks)) >= 0.05
        parts.extend(t for t, k in zip(toks, keep) if k)
    return " ".join(parts)


def _copy_vocab_map(texts: list[str], copy: int) -> dict[str, str]:
    """Deterministic vocabulary rewrite map for corpus copy ``copy``.

    EVERY token gets a copy suffix: a partial rewrite leaves per-doc
    survival variance (with a ~30-word corpus vocabulary, 3% of docs
    kept cross-copy signature-Jaccard ≥ 0.5 at a 40% rate — measured),
    while the full bijection gives cross-copy shingle-Jaccard exactly 0
    and leaves within-copy Jaccard untouched."""
    if copy == 0:
        return {}
    vocab = {t for text in texts for t in text.split(" ")}
    suffix = f"c{copy}x"
    return {t: t + suffix for t in vocab}


def compute_entity_ids(doc_ids: list[int], texts: list[str]) -> dict[int, int]:
    """Ground-truth entity per doc: union-find over exact shingle-set
    Jaccard ≥ ENTITY_JACCARD_THRESHOLD.  Candidates come from a
    shared-shingle inverted index (docs with J ≥ 0.5 share many
    shingles; hot shingles shared by >100 docs are skipped as
    candidates sources, which cannot drop a J ≥ 0.5 pair at these
    corpus sizes).  Deterministic; O(n·shingles) + small pair set."""
    from collections import defaultdict

    from ..functions.minhash import shingle_hashes
    from ..functions.tokenize import tokenize_batch

    flat, starts = tokenize_batch(texts)
    sh, sh_starts = shingle_hashes(flat, starts)
    sets = [frozenset(sh[sh_starts[i] : sh_starts[i + 1]].tolist()) for i in range(len(texts))]

    index: dict[int, list[int]] = defaultdict(list)
    for i, s in enumerate(sets):
        for v in s:
            index[v].append(i)
    cand: set[tuple[int, int]] = set()
    for lst in index.values():
        if 1 < len(lst) <= 100:
            for x in range(len(lst)):
                for y in range(x + 1, len(lst)):
                    cand.add((lst[x], lst[y]))

    parent = {i: i for i in range(len(texts))}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in sorted(cand):
        si, sj = sets[i], sets[j]
        inter = len(si & sj)
        if inter and inter / (len(si) + len(sj) - inter) >= ENTITY_JACCARD_THRESHOLD:
            ri, rj = find(i), find(j)
            if ri != rj:
                if doc_ids[ri] < doc_ids[rj]:
                    parent[rj] = ri
                else:
                    parent[ri] = rj
    return {doc_ids[i]: doc_ids[find(i)] for i in range(len(texts))}


def generate_pages_table(docs: pa.Table, entity_of: dict[int, int],
                         copy: int = 0, fatten: int = 1,
                         base_texts: list[str] | None = None) -> pa.Table:
    """documents rows → web-page rows (pure, per-row deterministic).

    ``base_texts`` overrides the table's text column (pre-fattened);
    ``copy`` applies the vocabulary rewrite + id/url offsets."""
    doc_ids = docs["doc_id"].to_pylist()
    texts = base_texts if base_texts is not None else [
        _fatten_text(t, d, fatten) for d, t in zip(doc_ids, docs["text"].to_pylist())
    ]
    langs = docs["lang"].to_pylist()
    sources = docs["source"].to_pylist()
    vmap = _copy_vocab_map(texts, copy)
    if vmap:
        texts = [" ".join(vmap.get(t, t) for t in text.split(" ")) for text in texts]

    urls: list[str] = []
    tss: list[datetime] = []
    htmls: list[bytes] = []
    out_texts: list[str] = []
    out_langs: list[str] = []
    ref_ids: list[int] = []
    entity_ids: list[int] = []
    off = copy * COPY_ID_STRIDE
    for doc_id, text, lang, source in zip(doc_ids, texts, langs, sources):
        for v in range(_n_variants(doc_id)):
            page_text = _mutate(text, doc_id, v)
            host = f"{source}.example.org" if v == 0 else f"mirror{v}.{source}.example.org"
            title = f"Document {doc_id + off}"
            page_html = (
                HTML_PREFIX.format(title=title)
                + _html.escape(page_text)
                + HTML_SUFFIX.format(host=host)
            ).encode("utf-8")
            url = _page_url(source, doc_id, v)
            if copy:
                url = url.replace("https://", f"https://c{copy}.")
            urls.append(url)
            tss.append(_BASE_TS + timedelta(seconds=doc_id * 60 + v + copy))
            htmls.append(page_html)
            out_texts.append(page_text)
            out_langs.append(lang)
            ref_ids.append(doc_id + off)
            entity_ids.append(entity_of[doc_id] + off)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(out_texts, type=pa.string()),
            "lang": pa.array(out_langs, type=pa.string()),
            "ref_doc_id": pa.array(ref_ids, type=pa.int64()),
            "entity_id": pa.array(entity_ids, type=pa.int64()),
        }
    )


def webpages_path(sf_dir: str, amplify: int = 1, fatten: int = 1) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    if amplify > 1 or fatten > 1:
        sf_name = f"{sf_name}-a{amplify}f{fatten}"
    return os.path.join(CACHE_ROOT, sf_name, "webpages.parquet")


def ensure_webpages(sf_dir: str, shard_rows: int = 5_000, amplify: int = 1,
                    fatten: int = 1) -> str:
    """Generate (once) and return the web-page parquet path for sf_dir.

    Written as a directory of row-group-sized files so Ray's
    read_parquet parallelizes the scan; atomic rename makes concurrent
    callers safe.
    """
    path = webpages_path(sf_dir, amplify, fatten)
    if os.path.exists(path):
        return path
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    doc_ids = docs["doc_id"].to_pylist()
    fat_texts = [_fatten_text(t, d, fatten)
                 for d, t in zip(doc_ids, docs["text"].to_pylist())]
    entity_of = compute_entity_ids(doc_ids, fat_texts)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = tempfile.mkdtemp(dir=os.path.dirname(path))
    try:
        n = docs.num_rows
        files = []
        i = 0
        for copy in range(amplify):
            for lo in range(0, n, shard_rows):
                part = generate_pages_table(
                    docs.slice(lo, shard_rows), entity_of, copy=copy, fatten=fatten,
                    base_texts=fat_texts[lo:lo + shard_rows],
                )
                f = os.path.join(tmp, f"part-{i:05d}.parquet")
                pq.write_table(part, f, row_group_size=8192)
                files.append(f)
                i += 1
        final_tmp = os.path.join(tmp, "webpages.parquet")
        if len(files) == 1:
            os.rename(files[0], final_tmp)
        else:
            os.mkdir(final_tmp)
            for f in files:
                os.rename(f, os.path.join(final_tmp, os.path.basename(f)))
        try:
            os.rename(final_tmp, path)
        except OSError:
            pass  # concurrent writer won
        return path
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def read_webpages(sf_dir: str, columns: list[str] | None = None):
    """ray.data.Dataset over the web-page table, columns pruned at read."""
    from .. import read_parquet_clean

    return read_parquet_clean(ensure_webpages(sf_dir), columns=columns)
