"""Property tests for the vectorized keyed-window kernels: the bucketed
searchsorted / composite-key / reduceat implementations must equal a naive
per-key brute force on adversarial synthetic events (duplicate timestamps,
single-event users, events before any order, exact boundary hits)."""

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE = datetime.datetime(2020, 1, 1)


def _write_events(tmp_path, rows):
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([BASE + datetime.timedelta(seconds=r[2]) for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")


def _adversarial_events():
    """Users with: duplicate timestamps (RANGE-frame peers), one event,
    dense bursts straddling the 1h boundary exactly, and a deterministic
    pseudo-random scatter."""
    rows = []
    eid = 0
    # user 0: three events at the SAME timestamp + one exactly 1h later
    for _ in range(3):
        rows.append((eid, 0, 1000, 1.23)); eid += 1
    rows.append((eid, 0, 1000 + 3600, 2.0)); eid += 1
    # user 1: single event
    rows.append((eid, 1, 50, 9.99)); eid += 1
    # user 2: events exactly 30min apart (sessionize gap boundary: gap
    # == 30min is NOT a new session, gap > 30min is)
    for k in range(5):
        rows.append((eid, 2, k * 1800, 0.5)); eid += 1
    rows.append((eid, 2, 5 * 1800 + 1, 0.5)); eid += 1  # 1us past the gap? (1s)
    # user 3: deterministic scatter
    rng = np.random.RandomState(7)
    for s in sorted(rng.randint(0, 20000, size=40).tolist()):
        rows.append((eid, 3, int(s), float(rng.randint(1, 500)) / 7)); eid += 1
    return rows


@pytest.fixture()
def events_dir(tmp_path):
    _write_events(tmp_path, _adversarial_events())
    return str(tmp_path)


def test_rolling_window_matches_bruteforce(ray_session, events_dir):
    from pdf_extractor_ray.functions.relational import (
        _WINDOW_US,
        user_rolling_window,
    )

    got = user_rolling_window(events_dir).to_pandas().sort_values("event_id")
    df = pq.read_table(f"{events_dir}/events.parquet").to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    df["v_c"] = (df["value"] * 100).round().astype("int64")
    for r in got.itertuples():
        me = df[df.event_id == r.event_id].iloc[0]
        win = df[
            (df.user_id == me.user_id)
            & (df.ts_us >= me.ts_us - _WINDOW_US)
            & (df.ts_us <= me.ts_us)
        ]
        assert r.w_count == len(win), r
        assert r.w_sum_c == win.v_c.sum(), r


def test_sessionize_matches_bruteforce(ray_session, events_dir):
    from pdf_extractor_ray.functions.relational import SESSION_GAP_US, sessionize

    got = (
        sessionize(events_dir).to_pandas().set_index("user_id")["n_sessions"]
    )
    df = pq.read_table(f"{events_dir}/events.parquet").to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    for u, grp in df.groupby("user_id"):
        ts = np.sort(grp.ts_us.to_numpy())
        want = 1 + int((np.diff(ts) > SESSION_GAP_US).sum())
        assert got[u] == want, (u, got[u], want)


def test_orders_asof_matches_bruteforce(ray_session, tmp_path):
    from pdf_extractor_ray.functions.relational import orders_asof

    _write_events(tmp_path, _adversarial_events())
    # orders: user 0 has ties on the same date (max orderkey wins); user 1
    # has an order AFTER its event (no match); user 3 has several dates;
    # user 9 has orders but no events
    orows = [
        # (orderkey, custkey, seconds, price)
        (100, 0, 900, 10.0),
        (101, 0, 900, 11.0),   # same date as 100 -> key 101 wins
        (102, 0, 5000, 12.0),
        (200, 1, 99999, 20.0),  # after user 1's only event
        (300, 3, 0, 30.0),
        (301, 3, 10000, 31.0),
        (900, 9, 1, 90.0),
    ]
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in orows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in orows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(orows), pa.string()),
            "o_totalprice": pa.array([r[3] for r in orows], pa.float64()),
            "o_orderdate": pa.array(
                [BASE + datetime.timedelta(seconds=r[2]) for r in orows],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(["1"] * len(orows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")

    got = orders_asof(str(tmp_path)).to_pandas().sort_values("event_id")
    ev = pq.read_table(f"{tmp_path}/events.parquet").to_pandas()
    od = pd.DataFrame(
        orows, columns=["o_orderkey", "o_custkey", "secs", "o_totalprice"]
    )
    od["d"] = od.secs.map(lambda s: BASE + datetime.timedelta(seconds=s))
    for r in got.itertuples():
        me = ev[ev.event_id == r.event_id].iloc[0]
        cand = od[(od.o_custkey == me.user_id) & (od.d <= me.ts)]
        if cand.empty:
            assert pd.isna(r.last_orderkey), r
        else:
            best_date = cand.d.max()
            best = cand[cand.d == best_date].sort_values("o_orderkey").iloc[-1]
            assert r.last_orderkey == best.o_orderkey, r
            assert r.last_totalprice == best.o_totalprice, r
    # every event appears exactly once
    assert sorted(got.event_id) == sorted(ev.event_id)
