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
    """v_filled must equal a pure-Python linear interpolation over each
    user's observed daily sums (edges extended), to the 4-dp quantum."""
    ev = _events(duck)
    daily = defaultdict(lambda: defaultdict(float))
    for _eid, uid, etype, _us, v, day in ev:
        if etype == "purchase":
            daily[uid][day] += v
    d0 = min(d for u in daily.values() for d in u)
    d1 = max(d for u in daily.values() for d in u)
    got = {
        (r.user_id, r.day): (r.v_filled, r.interpolated)
        for r in registry.QUERIES["q_time_interpolate"](spark, sf_dir).collect()
    }
    assert len(got) == len(daily) * (d1 - d0 + 1)
    for uid, obs in daily.items():
        days = sorted(obs)
        for day in range(d0, d1 + 1):
            if day in obs:
                want = obs[day]
            else:
                prev = max((d for d in days if d < day), default=None)
                nxt = min((d for d in days if d > day), default=None)
                if prev is None:
                    want = obs[nxt]
                elif nxt is None:
                    want = obs[prev]
                else:
                    want = obs[prev] + (obs[nxt] - obs[prev]) * (
                        (day - prev) / (nxt - prev)
                    )
            v_filled, interp = got[(uid, day)]
            assert interp == (day not in obs)
            # engine sums via decimal(18,4); python float accumulation can
            # drift a few ulps, so compare at slightly above the quantum
            assert math.isclose(v_filled, want, abs_tol=2e-4), (
                uid,
                day,
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
