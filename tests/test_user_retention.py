"""user_retention: cohort retention counts over epoch days."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_user_retention_vs_bruteforce(ray_session, tmp_path):
    """Planted cases: multiple same-day events (distinct-day dedupe),
    a return exactly at max_offset (included) and max_offset+1
    (excluded), and a block-spanning user history."""
    import random

    from refined_ray.pipelines.queries_ext import q_user_retention

    rng = random.Random(41)
    US_DAY = 86_400 * 1_000_000
    base = 19_800 * US_DAY  # mid-2024 epoch day
    rows = []
    for u in range(30):
        d0 = rng.randrange(0, 10)
        days = {d0} | {d0 + rng.randrange(0, 12) for _ in range(5)}
        for d in days:
            for _ in range(rng.randrange(1, 3)):  # same-day dups
                rows.append((u, base + d * US_DAY
                             + rng.randrange(0, US_DAY)))
    # user 100: returns exactly at offset 3 (the max) and 4 (excluded)
    rows += [(100, base), (100, base + 3 * US_DAY),
             (100, base + 4 * US_DAY)]
    rng.shuffle(rows)

    t = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array([""] * len(rows)),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet", row_group_size=13)

    K = 3
    got = sorted(map(tuple, q_user_retention(str(d), max_offset=K)
                     .to_pandas().itertuples(index=False, name=None)))

    by_user = {}
    for u, ts in rows:
        by_user.setdefault(u, set()).add(ts // US_DAY)
    want = {}
    for days in by_user.values():
        c = min(days)
        for day in days:
            if day - c <= K:
                want[(c, day - c)] = want.get((c, day - c), 0) + 1
    assert got == sorted((c, o, n) for (c, o), n in want.items())
    # the planted user contributes at offsets 0 and 3, not 4
    u100 = {(c, o) for c, o, _ in got
            if c == base // US_DAY and o in (0, 3)}
    assert len(u100) == 2
