"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1), one JSON line on stdout.

    python bench.py             # full benchmark at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling   # same job at N=4 and 4N=16 CPUs in fresh
                                # processes -> throughput + scaling efficiency
    python bench.py --stats     # flagship once + per-operator Ray Data stats

This script OWNS its Ray session (the only sanctioned place besides
tests/conftest.py and the driver)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# --scaling corpus amplification: the raw sf tables are too small for
# compute to dominate fixed orchestration cost, so the scaling run uses
# the deterministic amplified corpus (sources/webpages.py: xA copies via
# bijective vocab rewrite, xF longer texts) — ~80k pages of long (~860-shingle) documents.
SCALE_AMPLIFY = int(os.environ.get("GRAFT_SCALE_AMPLIFY", "32"))
SCALE_FATTEN = int(os.environ.get("GRAFT_SCALE_FATTEN", "16"))

HEADLINE = [
    # (name, callable path) — er_clusters is THE headline (north rule);
    # the others cover the big operator families.
    "er_clusters",
    "doc_clusters",
    "neardup_shingle",
    "exact_dedup",
    "pem_table",
    "ann_topk",
    "doc_token_stats",
    "lineitem_agg",
    "events_hourly",
    "simhash_candidates",
    "date_doc_infer",
    # appended round 3 (keep ABOVE list unchanged for round-over-round
    # comparability): the webtext corpus-hygiene family
    "line_dedup",
    "corpus_clean",
    # appended round 4: the GPU-shaped actor-pool scorer path (same
    # flagship job as er_clusters with scorer="actor" — VERDICT r3 #7:
    # the path needs a recorded wall number, not just parity tests)
    "er_clusters_actor",
    # appended round 5 (VERDICT r4 #7): the flagship with the counted
    # CC dispatch FORCED to the distributed label-propagation path
    # (driver_max_edges=0) — the code path a 100-TB edge set takes —
    # so it carries a recorded wall + regression trail
    "er_clusters_distcc",
    # appended round 5: the Lee-et-al exact-substring dedup (rolling
    # hashes -> global dup-key table -> probe -> span cut) — the last
    # big dedup family to gain a recorded wall
    "exact_substring_dedup",
    # appended round 5: the tokenizer family end-to-end (learn K BPE
    # merges, then encode the corpus with them) — the real
    # tokens-under-the-trained-tokenizer measurement
    "bpe_encode",
    # appended round 5 (late): the EXACT similarity-join family —
    # AllPairs prefix-filtered set-similarity self-join (the lossless
    # counterpart to neardup_shingle's MinHash-LSH) and the
    # integer-lattice exact kNN-graph classifier (the exact
    # counterpart to ann_topk) — recorded walls for the round's new
    # operators
    "set_similarity_join",
    "knn_classify",
]

# Single recorded runs of these swung 16-18% between rounds purely
# from sandbox ambient load (VERDICT r3 perf section; corpus_clean
# added after its 17.5 s r4 single-run reading vs 12-14 s re-timed —
# VERDICT r4 Wrong #1): take the min of 3 runs so the recorded number
# is the converged one.
NOISY_3RUN = {"neardup_shingle", "exact_dedup", "corpus_clean"}


def _bench_er_clusters_actor(sf_dir: str):
    from refined_ray.pipelines.entity_resolution import er_cluster_pages

    return er_cluster_pages(sf_dir, scorer="actor")


def _bench_er_clusters_distcc(sf_dir: str):
    from refined_ray.pipelines.entity_resolution import er_cluster_pages

    return er_cluster_pages(sf_dir, cc_driver_max_edges=0)


# bench-only variants (not catalog queries): name -> callable(sf_dir)
BENCH_EXTRA = {"er_clusters_actor": _bench_er_clusters_actor,
               "er_clusters_distcc": _bench_er_clusters_distcc}


def _run_queries(num_cpus: int, names: list[str], sf_dir: str) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        from refined_ray.pipelines.queries import QUERIES
        from refined_ray.sources.webpages import ensure_webpages

        ensure_webpages(sf_dir)  # generation is one-time setup, not pipeline time
        timings = {}
        for name in names:
            fn = QUERIES.get(name) or BENCH_EXTRA[name]
            secs, rows = [], []
            for _ in range(3 if name in NOISY_3RUN else 1):
                t0 = time.perf_counter()
                res = fn(sf_dir)
                import ray.data as _rd

                rows.append(res.count() if isinstance(res, _rd.Dataset) else len(res))
                secs.append(round(time.perf_counter() - t0, 3))
            # rows from the SAME run as the recorded min (review finding)
            best = min(range(len(secs)), key=secs.__getitem__)
            timings[name] = {"sec": secs[best], "rows": int(rows[best]),
                             **({"all_runs": secs} if len(secs) > 1 else {})}
        return timings
    finally:
        ray.shutdown()


def main() -> None:
    t0 = time.perf_counter()
    timings = _run_queries(NUM_CPUS, HEADLINE, SF_DIR)
    total = round(time.perf_counter() - t0, 3)
    print(json.dumps({
        "metric": "headline pipeline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": {k: v["sec"] for k, v in timings.items()},
        "rows": {k: v["rows"] for k, v in timings.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }))


def _scaling_child(num_cpus: int) -> dict:
    """Run the flagship ER job in THIS process at the given parallelism
    over the amplified corpus (same input both runs)."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        from refined_ray.pipelines.entity_resolution import er_cluster_pages
        from refined_ray.sources.webpages import ensure_webpages

        ensure_webpages(SF_DIR, amplify=SCALE_AMPLIFY, fatten=SCALE_FATTEN)  # one-time gen
        t0 = time.perf_counter()
        out = er_cluster_pages(SF_DIR, amplify=SCALE_AMPLIFY, fatten=SCALE_FATTEN)
        n = out.count()
        return {"num_cpus": num_cpus, "sec": round(time.perf_counter() - t0, 3),
                "rows": int(n), "amplify": SCALE_AMPLIFY, "fatten": SCALE_FATTEN}
    finally:
        ray.shutdown()


def scaling() -> None:
    """Same job at two parallelism levels in fresh processes (stands in
    for the N vs 4N node-cluster criterion; see BASELINE.md)."""
    # 3 fresh processes per level, INTERLEAVED (2,8,2,8,2,8) so ambient
    # host load hits both levels alike; min is the stable envelope —
    # this sandbox carries background load (observed loadavg ~5 while
    # idle) that inflates single runs by up to ~75%.
    runs_by_level: dict[int, list] = {2: [], 8: []}
    for cpus in (2, 8, 2, 8, 2, 8):
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cpus)],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = out.stdout.strip().splitlines()[-1]
        runs_by_level[cpus].append(json.loads(line))
    results = [min(runs_by_level[c], key=lambda r: r["sec"]) for c in (2, 8)]
    r_n, r_4n = results
    tput_n = r_n["rows"] / r_n["sec"]
    tput_4n = r_4n["rows"] / r_4n["sec"]
    eff = (tput_4n / tput_n) / (r_4n["num_cpus"] / r_n["num_cpus"])
    print(json.dumps({
        "metric": "er_clusters scaling efficiency (N=2 -> 4N=8 cpus)",
        "value": round(eff, 4),
        "unit": "efficiency",
        "runs": results,
        "all_runs": {str(c): [r["sec"] for r in rs] for c, rs in runs_by_level.items()},
        "throughput_rows_per_sec": {"cpusN": round(tput_n, 1), "cpus4N": round(tput_4n, 1)},
        "speedup": round(r_n["sec"] / r_4n["sec"], 3),
        "sf": SF_DIR,
        "note": "N vs 4N CPUs in fresh local processes stands in for N vs 4N nodes; "
                "2/8 chosen so neither level saturates single-node DRAM bandwidth, "
                "which (unlike a real multi-node cluster) does not grow with CPU count",
    }))


def stats() -> None:
    """Run the flagship once and dump Ray Data's per-operator stats —
    the feedback loop for "wall-time dominated by useful compute"."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    try:
        from refined_ray.pipelines.entity_resolution import er_cluster_pages
        from refined_ray.sources.webpages import ensure_webpages

        ensure_webpages(SF_DIR)
        t0 = time.perf_counter()
        out = er_cluster_pages(SF_DIR)
        n = out.count()
        wall = round(time.perf_counter() - t0, 3)
        print(out.stats())
        print(json.dumps({"metric": "er_clusters wall (stats run)",
                          "value": wall, "rows": int(n), "sf": SF_DIR,
                          "num_cpus": NUM_CPUS}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--scaling-child":
        print(json.dumps(_scaling_child(int(sys.argv[2]))))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        scaling()
    elif len(sys.argv) > 1 and sys.argv[1] == "--stats":
        stats()
    else:
        main()
