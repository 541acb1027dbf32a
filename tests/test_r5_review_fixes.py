"""Regression tests for the round-5 self-review findings:

1. threshold-aware LSH geometry in q_semantic_dedup's auto dispatch
2. layout-stamped _STAGED markers for the xmldump / wikiclean /
   wikidata staging fixtures (the q_wet_records contract, applied
   everywhere a staging helper takes a layout parameter)
(The non-ASCII API-key 403 regression lives in test_http_service.py.)
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
