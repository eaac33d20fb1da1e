"""Invariant tests for operators/timeseries.py beyond DuckDB parity.

Parity (tests/test_oracle_parity.py) proves Spark == DuckDB; these prove
both are RIGHT: the nearest join matches a brute-force per-purchase scan,
the interpolation matches a pure-Python lerp recomputation, and the
rolling median matches statistics.median over explicit trailing frames.
"""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

from json_parquet_convertor_spark import registry

registry.load_all()


def _events(duck):
    return duck.execute(
        "SELECT event_id, user_id, event_type,"
        " epoch_us(CAST(ts AS TIMESTAMP)) AS us, value,"
        " CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day"
        " FROM events"
    ).fetchall()


def test_join_nearest_matches_bruteforce(spark, duck, sf_dir):
    """Every purchase must map to the click minimizing (|Δus|, ts, id)
    over ALL of the user's clicks — recomputed by exhaustive scan."""
    ev = _events(duck)
    clicks = defaultdict(list)
    for eid, uid, etype, us, _v, _d in ev:
        if etype == "click":
            clicks[uid].append((us, eid))
    expected = {}
    for eid, uid, etype, us, _v, _d in ev:
        if etype != "purchase":
            continue
        cands = sorted(
            ((abs(cus - us), cus, cid) for cus, cid in clicks.get(uid, [])),
        )
        expected[eid] = (cands[0][2], cands[0][0]) if cands else (None, None)
    got = {
        r.purchase_id: (r.click_id, r.delta_us)
        for r in registry.QUERIES["q_join_nearest"](spark, sf_dir).collect()
    }
    assert got == expected


def test_interpolate_matches_python_lerp(spark, duck, sf_dir):
    """v_filled must equal a pure-Python gap-capped linear interpolation
    over each user's observed daily sums: observed days pass through, a
    run of <= _MAX_GAP_DAYS missing days between two observations fills
    with the straight line between them, longer gaps emit no rows, and
    nothing extends past a user's first/last observation."""
    from json_parquet_convertor_spark.operators.timeseries import (
        _MAX_GAP_DAYS,
    )

    ev = _events(duck)
    daily = defaultdict(lambda: defaultdict(float))
    for _eid, uid, etype, _us, v, day in ev:
        if etype == "purchase":
            daily[uid][day] += v
    expected = {}
    for uid, obs in daily.items():
        days = sorted(obs)
        for i, day in enumerate(days):
            expected[(uid, day)] = (obs[day], False)
            if i + 1 < len(days):
                nxt = days[i + 1]
                if nxt - day - 1 <= _MAX_GAP_DAYS:
                    for d in range(day + 1, nxt):
                        want = obs[day] + (obs[nxt] - obs[day]) * (
                            (d - day) / (nxt - day)
                        )
                        expected[(uid, d)] = (want, True)
    got = {
        (r.user_id, r.day): (r.v_filled, r.interpolated)
        for r in registry.QUERIES["q_time_interpolate"](spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for key, (v_filled, interp) in got.items():
        want, want_interp = expected[key]
        assert interp == want_interp, key
        # engine sums via decimal(18,4); python float accumulation can
        # drift a few ulps, so compare at slightly above the quantum
        assert math.isclose(v_filled, want, abs_tol=2e-4), (
            key,
            v_filled,
            want,
        )


def test_rolling_median_matches_statistics(spark, duck, sf_dir):
    """med7 must equal statistics.median over the explicit trailing
    ≤7-day frame of daily sums, per event type."""
    ev = _events(duck)
    daily = defaultdict(lambda: defaultdict(float))
    for _eid, _uid, etype, _us, v, day in ev:
        daily[etype][day] += v
    got = {
        (r.event_type, r.day): r.med7
        for r in registry.QUERIES["q_win_rolling_median"](
            spark, sf_dir
        ).collect()
    }
    n_rows = sum(len(v) for v in daily.values())
    assert len(got) == n_rows
    for etype, obs in daily.items():
        days = sorted(obs)
        for i, day in enumerate(days):
            frame = [obs[d] for d in days[max(0, i - 6) : i + 1]]
            want = statistics.median(frame)
            assert math.isclose(got[(etype, day)], want, abs_tol=2e-4), (
                etype,
                day,
                got[(etype, day)],
                want,
            )
