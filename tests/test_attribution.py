"""Semantics for attribution/changepoint (operators/attribution.py):
credit conservation per model, python replay of the touch assignment,
and change-point argmax replay.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.registry import load_all
from lakehouse_weather_spark.sources.tables import load_table


def _touch_groups(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    groups = []
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        n_conv = sum(1 for r in rows if r.event_type == "purchase")
        conv_idx = 0
        cur: list = []
        for r in rows:
            if r.event_type == "purchase":
                conv_idx += 1
                if cur:
                    groups.append(cur)
                cur = []
            else:
                if conv_idx < n_conv:
                    cur.append(r.event_type)
        # trailing non-purchase events (conv_idx == n_conv) attribute
        # to nothing; `cur` is dropped deliberately
    return groups


def test_attribution_replay_and_conservation(spark, sf_dir):
    rows = load_all()["q_attribution"].fn(spark, sf_dir).collect()
    got = {
        r.event_type: (r.n_touches, r.first_touch_bp, r.last_touch_bp, r.linear_bp)
        for r in rows
    }
    groups = _touch_groups(spark, sf_dir)
    want: dict[str, list[int]] = {}
    for g in groups:
        n = len(g)
        for i, t in enumerate(g):
            w = want.setdefault(t, [0, 0, 0, 0])
            w[0] += 1
            if i == 0:
                w[1] += 10_000
            if i == n - 1:
                w[2] += 10_000
                w[3] += 10_000 - (n - 1) * (10_000 // n)
            else:
                w[3] += 10_000 // n
    assert got == {k: tuple(v) for k, v in want.items()}
    # conservation: every model distributes exactly 10000 bp per
    # conversion-with-touches
    n_groups = len(groups)
    for col in (1, 2, 3):
        assert sum(v[col] for v in got.values()) == 10_000 * n_groups


def test_changepoint_matches_argmax_replay(spark, sf_dir):
    rows = load_all()["q_changepoint"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").collect()
    daily: dict[tuple, int] = {}
    for r in ev:
        d = r.ts.replace(hour=0, minute=0, second=0, microsecond=0)
        daily[(r.event_type, d)] = daily.get((r.event_type, d), 0) + 1
    by_type: dict[str, list] = {}
    for (t, d), c in daily.items():
        by_type.setdefault(t, []).append((d, c))
    S = 10_000
    want = {}
    for t, series in by_type.items():
        series.sort()
        n = len(series)
        tot = sum(c for _, c in series)
        best = None
        pre = 0
        for k, (d, c) in enumerate(series[:-1], start=1):
            pre += c
            gain = (
                (pre * pre * S) // k
                + ((tot - pre) * (tot - pre) * S) // (n - k)
                - (tot * tot * S) // n
            )
            if best is None or gain > best[1]:
                best = (d, gain)
        want[t] = (n, best[0], best[1])
    got = {r.event_type: (r.n_days, r.split_day, r.gain_fx) for r in rows}
    assert got == want
    assert all(g[2] >= 0 for g in got.values())  # gain is non-negative


def test_seq_patterns_matches_subsequence_replay(spark, sf_dir):
    rows = load_all()["q_seq_patterns"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    support: dict[tuple, int] = {}
    types = sorted({r.event_type for r in ev})
    for seq in by_user.values():
        seq.sort()
        found = set()
        for t1 in types:
            ts1 = min((t for t, ty in seq if ty == t1), default=None)
            if ts1 is None:
                continue
            for t2 in types:
                ts2 = min(
                    (t for t, ty in seq if ty == t2 and t > ts1),
                    default=None,
                )
                if ts2 is None:
                    continue
                for t3 in types:
                    if any(ty == t3 and t > ts2 for t, ty in seq):
                        found.add((t1, t2, t3))
        for k in found:
            support[k] = support.get(k, 0) + 1
    got = {(r.t1, r.t2, r.t3): r.support for r in rows}
    assert got == support
    n_users = len(by_user)
    for r in rows:
        assert r.support_bp == r.support * 10_000 // n_users
