"""Gates for the distributed clustering metrics (pairwise + B-cubed).

Hand-computed oracle: clusters {1:[a,b,c], 2:[d,e]} vs truth
{x:[a,b], y:[c,d,e]} gives B3 P = R = 11/15 (per-item averages) and
pairwise tp=2 (ab, de), pred=4, true=4 -> P = R = 0.5.
"""

from __future__ import annotations

import pyarrow as pa


def _assignments():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "item": ["a", "b", "c", "d", "e"],
        "pred": [1, 1, 1, 2, 2],
        "true": ["x", "x", "y", "y", "y"],
    }))


def test_pairwise_prf_hand_example(ray_session):
    from refined_ray.pipelines.evaluation import pairwise_prf

    m = pairwise_prf(_assignments(), "pred", "true")
    assert (m["tp"], m["fp"], m["fn"]) == (2, 2, 2)
    assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["f1"] == 0.5


def test_bcubed_hand_example(ray_session):
    from refined_ray.pipelines.evaluation import bcubed_prf

    m = bcubed_prf(_assignments(), "pred", "true")
    assert abs(m["b3_precision"] - 11 / 15) < 1e-12
    assert abs(m["b3_recall"] - 11 / 15) < 1e-12
    assert abs(m["b3_f1"] - 11 / 15) < 1e-12


def test_bcubed_perfect_clustering_is_one(ray_session):
    import ray.data as rd

    from refined_ray.pipelines.evaluation import bcubed_prf

    ds = rd.from_arrow(pa.table({"pred": [1, 1, 2], "true": ["x", "x", "y"]}))
    m = bcubed_prf(ds, "pred", "true")
    assert m["b3_f1"] == 1.0


def test_er_quality_reports_both_metric_families(ray_session):
    from refined_ray.pipelines.evaluation import er_quality

    t = er_quality("/root/testdata/sf0.001").to_pylist()[0]
    assert t["f1"] == 1.0 and t["b3_f1"] == 1.0  # flagship is exact at sf0.001


def test_driver_and_distributed_paths_agree(ray_session, monkeypatch):
    import refined_ray.pipelines.evaluation as ev

    fast_p = ev.pairwise_prf(_assignments(), "pred", "true")
    fast_b = ev.bcubed_prf(_assignments(), "pred", "true")
    monkeypatch.setattr(ev, "CELLS_DRIVER_MAX_ROWS", -1)  # force distributed
    slow_p = ev.pairwise_prf(_assignments(), "pred", "true")
    slow_b = ev.bcubed_prf(_assignments(), "pred", "true")
    assert fast_p == slow_p
    # float folds differ in summation order → compare to 1e-12
    assert fast_b.keys() == slow_b.keys()
    for k in fast_b:
        assert abs(fast_b[k] - slow_b[k]) < 1e-12, k


def test_error_pairs_planted_mistakes(ray_session):
    import ray.data as rd

    from refined_ray.pipelines.evaluation import error_pairs

    # cluster 1 wrongly merges truth-x and truth-y items (FP pairs);
    # truth-y is split across clusters 1 and 2 (FN pairs)
    ds = rd.from_arrow(pa.table({
        "url": ["a", "b", "c", "d"],
        "pred": [1, 1, 1, 2],
        "true": ["x", "x", "y", "y"],
    }))
    rows = error_pairs(ds, "pred", "true", "url").take_all()
    got = {(r["id_a"], r["id_b"], r["kind"]) for r in rows}
    assert got == {("a", "c", "fp"), ("b", "c", "fp"), ("c", "d", "fn")}
    assert not any(r["capped"] for r in rows)


def test_error_pairs_per_group_cap_is_flagged(ray_session):
    import ray.data as rd

    from refined_ray.pipelines.evaluation import error_pairs

    n = 30  # one broken cluster with 15x15 cross-truth pairs = 225 > cap
    ds = rd.from_arrow(pa.table({
        "url": [f"u{i:02d}" for i in range(n)],
        "pred": [1] * n,
        "true": ["x" if i % 2 == 0 else "y" for i in range(n)],
    }))
    rows = [r for r in error_pairs(ds, "pred", "true", "url",
                                   per_group_cap=50).take_all()
            if r["kind"] == "fp"]
    assert len(rows) == 50 and all(r["capped"] for r in rows)


def test_er_errors_empty_at_perfect_f1(ray_session):
    from refined_ray.pipelines.queries_ext import q_er_errors

    assert q_er_errors("/root/testdata/sf0.001").count() == 0
