"""event_funnel: greedy earliest-completion funnel with a window."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _reference_funnel(rows, stages, window_us):
    """Pure-python greedy replay over (user, ts_us, type) rows."""
    by_user = {}
    for u, t, e in rows:
        by_user.setdefault(u, []).append((t, e))
    counts = [0] * len(stages)
    for evs in by_user.values():
        prev, hi = None, None
        for s, name in enumerate(stages):
            cand = [t for t, e in evs
                    if e == name and (prev is None or
                                      (t > prev and t <= hi))]
            if not cand:
                break
            prev = min(cand)
            hi = prev + window_us
            counts[s] += 1
    return counts


def test_event_funnel_vs_bruteforce(ray_session, tmp_path):
    """Planted edge cases: a transition landing EXACTLY at
    prev + window (inclusive), a same-instant next-stage event
    (strict >, excluded), stage skips, and out-of-order arrival."""
    import random

    from refined_ray.pipelines.queries_ext import q_event_funnel

    rng = random.Random(23)
    stages = ("view", "click", "purchase")
    W = 1000  # 1 ms window, microsecond granularity
    rows = []
    for u in range(40):
        t0 = 1_700_000_000_000_000 + u * 10_000_000
        n = rng.randrange(2, 12)
        for _ in range(n):
            rows.append((u, t0 + rng.randrange(0, 3 * W),
                         rng.choice(stages)))
    # user 100: click exactly at view + W (inclusive boundary -> counts)
    rows += [(100, 10_000, "view"), (100, 10_000 + W, "click")]
    # user 101: click at the SAME instant as view (strict > -> excluded)
    rows += [(101, 20_000, "view"), (101, 20_000, "click")]
    # user 102: purchase without click (stage skip)
    rows += [(102, 30_000, "view"), (102, 30_100, "purchase")]
    # user 103: full funnel, events arriving shuffled
    rows += [(103, 40_300, "purchase"), (103, 40_000, "view"),
             (103, 40_100, "click")]
    rng.shuffle(rows)

    t = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array([""] * len(rows)),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    got = q_event_funnel(str(d), stages=stages, window_us=W) \
        .to_pandas().sort_values("stage")
    want = _reference_funnel(rows, stages, W)
    assert list(got.n_users) == want
    assert list(got.event_type) == list(stages)
    # the planted users behave as designed
    one_user = _reference_funnel([r for r in rows if r[0] == 100],
                                 stages, W)
    assert one_user[:2] == [1, 1]
    assert _reference_funnel([r for r in rows if r[0] == 101],
                             stages, W)[1] == 0


def test_event_transitions_vs_bruteforce(ray_session, tmp_path):
    """Same-instant events must order by event_id (the SQL window's
    tie-break); single-event users contribute nothing."""
    import random

    from refined_ray.pipelines.queries_ext import q_event_transitions

    rng = random.Random(13)
    types = ["a", "b", "c"]
    rows = []  # (event_id, user, ts_us, type)
    eid = 0
    for u in range(25):
        n = rng.randrange(1, 10)
        for _ in range(n):
            rows.append((eid, u, 1_000_000 * rng.randrange(0, 5),
                         rng.choice(types)))  # heavy ts collisions
            eid += 1
    rng.shuffle(rows)

    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array(np.array([r[2] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array([""] * len(rows)),
    })
    d = tmp_path / "sft"
    d.mkdir()
    pq.write_table(t, d / "events.parquet", row_group_size=11)

    got = sorted(map(tuple, q_event_transitions(str(d)).to_pandas()
                     .itertuples(index=False, name=None)))

    by_user = {}
    for e, u, ts, et in rows:
        by_user.setdefault(u, []).append((ts, e, et))
    want = {}
    for evs in by_user.values():
        evs.sort()
        for (_, _, p), (_, _, c) in zip(evs, evs[1:]):
            want[(p, c)] = want.get((p, c), 0) + 1
    assert got == sorted((p, c, n) for (p, c), n in want.items())


def test_event_rate_anomaly_vs_bruteforce(ray_session, tmp_path):
    """A planted spike hour must flag; a flat type must flag nothing
    (var = 0 guard); z replays the exact float shape."""
    import math
    import random

    from refined_ray.pipelines.queries_ext import q_event_rate_anomaly

    rng = random.Random(3)
    US_H = 3_600 * 1_000_000
    rows = []  # (ts_us, type)
    for h in range(48):
        for _ in range(rng.randrange(5, 9)):
            rows.append((h * US_H + rng.randrange(0, US_H), "steady"))
        rows.append((h * US_H + 1, "flat"))  # exactly 1/hour: var 0
    for _ in range(80):  # the spike
        rows.append((10 * US_H + rng.randrange(0, US_H), "steady"))
    rng.shuffle(rows)

    t = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array(np.array([r[0] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([0] * len(rows), type=pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array([""] * len(rows)),
    })
    d = tmp_path / "sfa"
    d.mkdir()
    pq.write_table(t, d / "events.parquet", row_group_size=37)

    got = q_event_rate_anomaly(str(d)).to_pandas()
    assert set(got.event_type) == {"steady"}  # flat: var-0 guarded

    cnt = {}
    for ts, et in rows:
        if et == "steady":
            cnt[ts // US_H] = cnt.get(ts // US_H, 0) + 1
    n = len(cnt)
    sn, sq = sum(cnt.values()), sum(c * c for c in cnt.values())
    mean = sn / n
    var = (sq / n) - (mean * mean)
    want = {(h, c, float(f"{(c - mean) / math.sqrt(var):.6f}"))
            for h, c in cnt.items()
            if abs((c - mean) / math.sqrt(var)) >= 2.0}
    got_set = {(int(r.hour.timestamp() * 1_000_000) // US_H, r.cnt, r.z)
               for r in got.itertuples()}
    assert got_set == want
    assert any(h == 10 for h, _, _ in got_set)  # the planted spike


def test_event_trend_vs_bruteforce(ray_session, tmp_path):
    """OLS slope/intercept per type vs numpy.polyfit (to float
    tolerance) and vs the exact integer-moment formula (bit-exact);
    single-day and zero-variance types must drop."""
    import random

    from refined_ray.pipelines.queries_ext import q_event_trend

    rng = random.Random(29)
    US_DAY = 86_400 * 1_000_000
    rows = []
    for day in range(20):
        for _ in range(3 + 2 * day + rng.randrange(0, 3)):  # up-trend
            rows.append((day * US_DAY + rng.randrange(0, US_DAY),
                         "growing"))
        for _ in range(5):
            rows.append((day * US_DAY + rng.randrange(0, US_DAY),
                         "flat"))
    rows.append((3 * US_DAY, "oneday"))  # n=1 -> dropped
    rng.shuffle(rows)

    t = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array(np.array([r[0] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([0] * len(rows), type=pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array([""] * len(rows)),
    })
    d = tmp_path / "sfr"
    d.mkdir()
    pq.write_table(t, d / "events.parquet", row_group_size=41)

    got = q_event_trend(str(d)).to_pandas().set_index("event_type")
    assert set(got.index) == {"growing", "flat"}

    for typ in ("growing", "flat"):
        cnt = {}
        for ts, et in rows:
            if et == typ:
                cnt[ts // US_DAY] = cnt.get(ts // US_DAY, 0) + 1
        d0 = min(cnt)
        xs = [day - d0 for day in sorted(cnt)]
        ys = [cnt[day + d0] for day in xs]
        n, sx, sy = len(xs), sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        det = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / det
        intercept = (sy - slope * sx) / n
        r = got.loc[typ]
        assert r.n_days == n
        assert r.slope == float(f"{slope:.6f}")
        assert r.intercept == float(f"{intercept:.6f}")
        pf = np.polyfit(xs, ys, 1)
        assert abs(pf[0] - slope) < 1e-9 and abs(pf[1] - intercept) < 1e-9
    assert got.loc["growing"].slope > 1.5
    assert abs(got.loc["flat"].slope) < 1e-9


def test_user_cumulative_vs_bruteforce(ray_session, tmp_path):
    """Running aggregates vs python replay: same-instant ties order by
    event_id; negative values floor toward -inf in cents."""
    import random

    from refined_ray.pipelines.queries_ext import q_user_cumulative

    rng = random.Random(53)
    rows = []
    eid = 0
    for u in range(12):
        for _ in range(rng.randrange(1, 15)):
            rows.append((eid, u, 1_000_000 * rng.randrange(0, 4),
                         rng.uniform(-5, 5)))
            eid += 1
    rng.shuffle(rows)

    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array(np.array([r[2] for r in rows],
                                dtype="datetime64[us]")),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "event_type": pa.array(["x"] * len(rows)),
        "value": pa.array([r[3] for r in rows]),
        "props": pa.array([""] * len(rows)),
    })
    d = tmp_path / "sfc2"
    d.mkdir()
    pq.write_table(t, d / "events.parquet", row_group_size=17)

    got = {r.event_id: (r.running_n, r.running_cents)
           for r in q_user_cumulative(str(d)).to_pandas().itertuples()}

    import math
    by_user = {}
    for e, u, ts, v in rows:
        by_user.setdefault(u, []).append((ts, e, v))
    want = {}
    for evs in by_user.values():
        evs.sort(key=lambda r: (r[0], r[1]))
        n = c = 0
        for ts, e, v in evs:
            n += 1
            c += math.floor(v * 100.0)
            want[e] = (n, c)
    assert got == want
