"""Property-based validation of the newest event-analytics operators (W8
funnel, W9 cohort retention) against explicit Python models over RANDOM
event tables — the fixture-independence proof the streaming lanes already
have (test_streaming_property.py): the DuckDB oracle shares SQL semantics
with Spark, so a both-engines-wrong bug class (e.g. a strict-vs-lax
inequality in the funnel staging, or an off-by-one in week-offset
arithmetic) only falls to an INDEPENDENT model.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from otlp2parquet_spark.queries.registry import all_specs

SPECS = all_specs()

BASE = dt.datetime(2024, 1, 3, 5, 0, 0)  # a Wednesday: week-trunc is non-trivial

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # day offset (crosses ~6 weeks)
        st.integers(min_value=0, max_value=23),  # hour
        st.integers(min_value=0, max_value=4),  # user
        st.sampled_from(["view", "click", "purchase", "ping"]),
    ),
    min_size=1,
    max_size=60,
)


def _write_events(tmpdir: str, rows) -> str:
    sf_dir = os.path.join(tmpdir, uuid.uuid4().hex)
    os.makedirs(sf_dir)
    ts = [BASE + dt.timedelta(days=d, hours=h) for d, h, _u, _t in rows]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([u for _d, _h, u, _t in rows], pa.int64()),
                "event_type": pa.array([t for _d, _h, _u, t in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array([None] * len(rows), pa.string()),
            }
        ),
        os.path.join(sf_dir, "events.parquet"),
    )
    return sf_dir


def _q4(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


@given(rows=_events)
@settings(max_examples=10, deadline=None)
def test_w8_funnel_matches_python_model(spark, tmp_path_factory, rows):
    """Staged conditional MINs == a direct per-user scan: earliest view,
    earliest click STRICTLY after it, earliest purchase STRICTLY after
    that."""
    sf_dir = _write_events(str(tmp_path_factory.mktemp("w8")), rows)
    got = {
        r.user_id: (r.view_ts, r.click_ts, r.purchase_ts, r.converted)
        for r in SPECS["w8_funnel"].build(spark, sf_dir).collect()
    }
    by_user: dict[int, list] = {}
    for d, h, u, t in rows:
        by_user.setdefault(u, []).append((BASE + dt.timedelta(days=d, hours=h), t))
    expect = {}
    for u, evs in by_user.items():
        views = [ts for ts, t in evs if t == "view"]
        if not views:
            continue
        v = min(views)
        clicks = [ts for ts, t in evs if t == "click" and ts > v]
        c = min(clicks) if clicks else None
        p = None
        if c is not None:
            purchases = [ts for ts, t in evs if t == "purchase" and ts > c]
            p = min(purchases) if purchases else None
        expect[u] = (v, c, p, p is not None)
    assert got == expect


@given(rows=_events)
@settings(max_examples=10, deadline=None)
def test_w9_cohort_retention_matches_python_model(spark, tmp_path_factory, rows):
    """Week-offset arithmetic and the retention division == a direct model:
    cohort = Monday of the user's first active week; cell (cohort, k)
    counts users active in cohort+k weeks."""
    sf_dir = _write_events(str(tmp_path_factory.mktemp("w9")), rows)
    got = {
        (r.cohort_week, r.week_offset): (r.n_active, r.n_cohort, r.retention)
        for r in SPECS["w9_cohort_retention"].build(spark, sf_dir).collect()
    }

    def monday(ts: dt.datetime) -> dt.date:
        d = ts.date()
        return d - dt.timedelta(days=d.weekday())

    active: dict[int, set] = {}
    for d, h, u, _t in rows:
        active.setdefault(u, set()).add(monday(BASE + dt.timedelta(days=d, hours=h)))
    cohort = {u: min(wks) for u, wks in active.items()}
    cohort_sizes: dict[dt.date, int] = {}
    for u, cw in cohort.items():
        cohort_sizes[cw] = cohort_sizes.get(cw, 0) + 1
    cells: dict[tuple, set] = {}
    for u, wks in active.items():
        for w in wks:
            k = (w - cohort[u]).days // 7
            cells.setdefault((cohort[u], k), set()).add(u)
    expect = {
        (cw, k): (len(us), cohort_sizes[cw], _q4(len(us) / cohort_sizes[cw]))
        for (cw, k), us in cells.items()
    }
    assert got == expect


@given(rows=_events)
@settings(max_examples=8, deadline=None)
def test_w10_anomaly_matches_python_model(spark, tmp_path_factory, rows):
    """The z-score is a real trailing-24-populated-hours sample z-score:
    rebuild it with plain Python floats (same op order) per (type, hour)."""
    sf_dir = _write_events(str(tmp_path_factory.mktemp("w10")), rows)
    got = {
        (r.event_type, r.hour_ts): (r.n, r.zscore, r.is_anomaly)
        for r in SPECS["w10_anomaly"].build(spark, sf_dir).collect()
    }
    hourly: dict[tuple, int] = {}
    for d, h, _u, t in rows:
        ts = (BASE + dt.timedelta(days=d, hours=h)).replace(minute=0, second=0)
        hourly[(t, ts)] = hourly.get((t, ts), 0) + 1
    expect = {}
    by_type: dict[str, list] = {}
    for (t, ts), n in hourly.items():
        by_type.setdefault(t, []).append((ts, n))
    for t, cells in by_type.items():
        cells.sort()
        for i, (ts, n) in enumerate(cells):
            trail = [m for _ts, m in cells[max(0, i - 24) : i]]
            cnt = len(trail)
            z = None
            anom = False
            if cnt >= 12:
                s1, s2 = sum(trail), sum(m * m for m in trail)
                var = (float(s2) - float(s1 * s1) / cnt) / (cnt - 1)
                if var > 0:
                    raw = (n - float(s1) / cnt) / math.sqrt(var)
                    z = _q4(raw)
                    anom = abs(raw) > 3.0
            expect[(t, ts)] = (n, z, anom)
    assert got == expect
