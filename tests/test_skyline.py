"""part_skyline: 2-phase distributed Pareto-dominance filter."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _reference(rows):
    out = []
    for k, pr, sz in rows:
        dominated = any(
            qpr <= pr and qsz <= sz and (qpr < pr or qsz < sz)
            for _, qpr, qsz in rows)
        if not dominated:
            out.append(k)
    return sorted(out)


def test_skyline_vs_bruteforce(ray_session, tmp_path):
    """Adversarial frontier: duplicate points (all kept), equal-price
    chains, equal-size chains, and a strictly-dominated clone one ulp
    off — sharded so the local/merge split is exercised."""
    import random

    from refined_ray.pipelines.queries_ext import q_part_skyline

    rng = random.Random(9)
    rows = [(k, float(rng.randrange(10, 60)),
             rng.randrange(1, 30)) for k in range(120)]
    rows += [(200, 10.0, 1), (201, 10.0, 1),   # duplicate frontier pts
             (202, 10.0, 2), (203, 11.0, 1),   # dominated on one axis
             (204, 10.0 + 1e-12, 1)]           # ulp-off clone: dominated

    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table({
        "p_partkey": pa.array([r[0] for r in rows], type=pa.int64()),
        "p_name": pa.array(["n"] * len(rows)),
        "p_brand": pa.array(["b"] * len(rows)),
        "p_type": pa.array(["t"] * len(rows)),
        "p_size": pa.array([r[2] for r in rows], type=pa.int32()),
        "p_retailprice": pa.array([r[1] for r in rows]),
    })
    pq.write_table(t, d / "part.parquet", row_group_size=9)

    got = sorted(q_part_skyline(str(d)).to_pandas().p_partkey)
    want = _reference(rows)
    assert got == want
    assert {200, 201} <= set(got)          # duplicates both survive
    assert not {202, 203, 204} & set(got)  # dominated variants do not
