"""Regression tests for the round-5 self-review findings:

1. threshold-aware LSH geometry in q_semantic_dedup's auto dispatch
2. layout-stamped _STAGED markers for the xmldump / wikiclean /
   wikidata staging fixtures (the q_wet_records contract, applied
   everywhere a staging helper takes a layout parameter)
(The non-ASCII API-key 403 regression lives in test_http_service.py.)

Second review pass (end-of-round sweep over the full round-5 diff):

3. _lsh_bands_for_threshold(1.0) must return bands, not crash on
   log(0) — at cosine >= 1.0 every band catches the identical pair
4. crashed staging runs (dir without a marker / partial fan-out
   without _FANOUT_DONE) are cleared, never mixed with fresh output
5. the el_eval JSONL fixture restages when documents.parquet changes
6. EL-benchmark MD counts use span-key SET semantics: a span
   annotated both gold and NIL under the same key counts once
   (evaluation.py:99-105 builds sets, not multisets)
"""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"


def test_lsh_bands_for_threshold_geometry():
    from refined_ray.pipelines.queries import _lsh_bands_for_threshold

    # the catalog threshold keeps the documented 32-band default
    assert _lsh_bands_for_threshold(0.45) == 32
    # looser thresholds widen the geometry monotonically
    b02 = _lsh_bands_for_threshold(0.2)
    b00 = _lsh_bands_for_threshold(0.0)
    assert 32 < b02 < b00 <= 256
    # a threshold the bound cannot serve within the cap refuses loudly
    with pytest.raises(ValueError, match="exact"):
        _lsh_bands_for_threshold(-0.99)
    # cosine -1 has zero collision probability under the sign hash
    with pytest.raises(ValueError, match="exact"):
        _lsh_bands_for_threshold(-1.0)
    # the bound actually holds: miss = (1 - p^2)^bands < 1e-7
    import math
    for t in (0.45, 0.2, 0.0):
        p = 1.0 - math.acos(t) / math.pi
        n = _lsh_bands_for_threshold(t)
        assert (1.0 - p * p) ** n < 1e-7


def test_semantic_dedup_lsh_threshold_parity(ray_session):
    """Forcing the LSH pair stage at a NON-default threshold must agree
    with the exact pair stage — the dispatch passes threshold-derived
    band geometry, so no near-threshold edge is dropped."""
    from refined_ray.pipelines.queries import q_semantic_dedup

    exact = q_semantic_dedup(SF, threshold=0.2, pair_stage="exact") \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    lsh = q_semantic_dedup(SF, threshold=0.2, pair_stage="lsh") \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert exact.equals(lsh)


def _restage_roundtrip(stage_fn, fixture_name, default_kw, small_kw,
                       suffix):
    from refined_ray.pipelines.queries_readers import _fixture_dir

    n1 = stage_fn(**default_kw)
    d = os.path.join(_fixture_dir(SF), fixture_name)
    shards_default = sorted(f for f in os.listdir(d) if f.endswith(suffix))
    n2 = stage_fn(**small_kw)
    shards_small = sorted(f for f in os.listdir(d) if f.endswith(suffix))
    assert n1 == n2  # same logical content either way
    assert len(shards_small) > len(shards_default)  # actually restaged
    stage_fn(**default_kw)  # restore the default layout for other tests


def test_xml_pages_restages_on_layout_change(ray_session):
    from refined_ray.pipelines.queries_readers import q_xml_pages

    _restage_roundtrip(
        lambda **kw: q_xml_pages(SF, **kw).count(), "xmldump",
        {"pages_per_shard": 200}, {"pages_per_shard": 50}, ".xml.bz2")


def test_wiki_clean_restages_on_layout_change(ray_session):
    from refined_ray.pipelines.queries_readers import q_wiki_clean

    _restage_roundtrip(
        lambda **kw: q_wiki_clean(SF, **kw).count(), "wikiclean",
        {"pages_per_shard": 200}, {"pages_per_shard": 50}, ".xml.bz2")


def test_wikidata_dump_restages_on_layout_change(ray_session):
    """A changed entities_per_shard restages the dump AND invalidates
    the derived fan-out (the marker rmtree covers the whole dir)."""
    from refined_ray.pipelines.queries_readers import (_fixture_dir,
                                                       stage_wikidata_dump)

    fan1 = stage_wikidata_dump(SF, entities_per_shard=500)
    d = os.path.join(_fixture_dir(SF), "wikidata")
    dump = os.path.join(d, "dump")
    shards_500 = sorted(os.listdir(dump))
    fanout_mtime_1 = os.path.getmtime(os.path.join(d, "_FANOUT_DONE"))
    fan2 = stage_wikidata_dump(SF, entities_per_shard=100)
    shards_100 = sorted(os.listdir(dump))
    assert fan1 == fan2
    assert len(shards_100) > len(shards_500)
    # the fan-out was rebuilt from the new dump, not reused stale
    assert os.path.getmtime(os.path.join(d, "_FANOUT_DONE")) \
        != fanout_mtime_1
    stage_wikidata_dump(SF, entities_per_shard=500)  # restore


def test_lsh_bands_at_threshold_one():
    """cosine threshold 1.0 (p = 1): miss probability is exactly 0 for
    the qualifying (bit-identical) pairs — return the default geometry
    instead of crashing on log(1 - p^bits) = log(0)."""
    from refined_ray.pipelines.queries import _lsh_bands_for_threshold

    assert _lsh_bands_for_threshold(1.0) == 32
    # anything representable just below 1.0 still resolves
    assert _lsh_bands_for_threshold(0.999999) == 32


def test_partial_staging_dir_is_cleared(ray_session):
    """A fixture dir WITHOUT a _STAGED marker is partial output from a
    crashed run: the next call must clear it, not union stale shards
    with fresh ones."""
    from refined_ray.pipelines.queries_readers import (_fixture_dir,
                                                       q_xml_pages)

    n = q_xml_pages(SF).count()
    d = os.path.join(_fixture_dir(SF), "xmldump")
    os.remove(os.path.join(d, "_STAGED"))
    junk = os.path.join(d, "shard-99999.xml.bz2")
    import bz2
    with bz2.open(junk, "wt") as f:
        f.write("<page><id>1</id><ns>0</ns><title>junk</title>"
                "<revision><id>2</id><text>stale</text></revision></page>")
    assert q_xml_pages(SF).count() == n
    assert not os.path.exists(junk)


def test_partial_fanout_is_cleared(ray_session):
    """fan_dir without _FANOUT_DONE = a fan-out killed mid-run; the
    rerun must rebuild from scratch (crash-atomic promote), so no
    stale content-hash part files survive."""
    from refined_ray.pipelines.queries_readers import (_fixture_dir,
                                                       stage_wikidata_dump)

    fan = stage_wikidata_dump(SF)
    d = os.path.dirname(fan)
    os.remove(os.path.join(d, "_FANOUT_DONE"))
    junk = os.path.join(fan, "desc", "stale-partial.parquet")
    with open(junk, "w") as f:
        f.write("not parquet")
    fan2 = stage_wikidata_dump(SF)
    assert fan2 == fan
    assert os.path.exists(os.path.join(d, "_FANOUT_DONE"))
    assert not os.path.exists(junk)


def test_el_eval_fixture_restages_on_corpus_change(ray_session):
    """The JSONL's spans/plants derive from documents.parquet — a
    stale stamp must force a rewrite instead of reusing old offsets
    against new texts."""
    from refined_ray.pipelines.queries_readers import _stage_el_eval_fixture

    path, _, _ = _stage_el_eval_fixture(SF)
    with open(path + ".stamp", "w") as f:
        f.write("n_docs=-1")  # simulate a regenerated corpus
    before = os.path.getmtime(path)
    path2, _, _ = _stage_el_eval_fixture(SF)
    assert path2 == path
    assert os.path.getmtime(path) >= before
    with open(path + ".stamp") as f:
        assert f.read() != "n_docs=-1"


def test_el_eval_md_set_semantics(ray_session):
    """A span annotated BOTH with an in-KB entity and as NIL under the
    same (doc, start, surface) key: the reference's set union carries
    it once, so tp_md / fn_md must not double-count it."""
    import pyarrow as pa
    import ray.data as rd

    from refined_ray.pipelines.el_benchmark import evaluate_benchmarks

    mentions = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 0], type=pa.int64()),
        "span_start": pa.array([0, 0], type=pa.int64()),
        "surface": pa.array(["paris", "paris"], type=pa.string()),
        "gold_qcode": pa.array(["Q1", None], type=pa.string()),
    }))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["paris visit"], type=pa.string()),
    }))
    pem = rd.from_arrow(pa.table({
        "surface": pa.array(["paris"], type=pa.string()),
        "entity": pa.array(["Q1"], type=pa.string()),
        "cnt": pa.array([5], type=pa.int64()),
    }))
    rows = {(r["dataset"], r["mode"]): r
            for r in evaluate_benchmarks(mentions, docs, pem).take_all()}
    el = rows[("AIDA", "EL")]
    # detector emits paris@0 and visit@6; md key SET = {(0,0,paris)}
    assert el["num_gold_spans"] == 1
    assert el["tp_md"] == 1          # multiset arithmetic would say 2
    assert el["fp_md"] == 1          # visit@6 — would be 0 (or negative)
    assert el["fn_md"] == 0
    ed = rows[("AIDA", "ED")]
    # ED predicted keys = distinct gold keys; md set has 1 key total
    assert ed["tp_md"] == 1 and ed["fp_md"] == 0 and ed["fn_md"] == 0


def test_fixture_stamp_helpers_state_machine(tmp_path):
    """The shared staging gate's four transitions: fresh dir → stage;
    matching stamp → cached (files intact); stamp mismatch → cleared;
    marker-less dir (crashed run) → cleared.  File-fixture twins
    follow the same contract."""
    from refined_ray.pipelines.queries_readers import (
        _file_fixture_fresh, _fixture_stamp_ok, _mark_staged,
        _stamp_file_fixture)

    d = str(tmp_path / "fx")
    assert _fixture_stamp_ok(d, "a=1") is False and os.path.isdir(d)
    with open(os.path.join(d, "f1"), "w") as f:
        f.write("x")
    _mark_staged(d, "a=1")
    assert _fixture_stamp_ok(d, "a=1") is True
    assert os.path.exists(os.path.join(d, "f1"))          # cached intact
    assert _fixture_stamp_ok(d, "a=2") is False           # layout change
    assert not os.path.exists(os.path.join(d, "f1"))
    with open(os.path.join(d, "stale"), "w") as f:
        f.write("x")                                      # no marker
    assert _fixture_stamp_ok(d, "a=2") is False
    assert not os.path.exists(os.path.join(d, "stale"))

    p = str(tmp_path / "fixture.jsonl")
    assert _file_fixture_fresh(p, "n=5") is False         # nothing yet
    with open(p, "w") as f:
        f.write("{}\n")
    assert _file_fixture_fresh(p, "n=5") is False         # no stamp
    _stamp_file_fixture(p, "n=5")
    assert _file_fixture_fresh(p, "n=5") is True
    assert _file_fixture_fresh(p, "n=6") is False         # source changed
