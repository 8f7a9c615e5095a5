"""Semantic tests for the Pareto skyline (operators/skyline.py): the
grid prefilter must lose no frontier point on adversarial shapes —
duplicate points, frontier points in the same bucket, degenerate
all-equal-x input — verified against a brute-force python reference.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.operators.skyline import skyline_2d
from lakehouse_weather_spark.registry import load_all


def _brute(points):
    out = []
    for i, (pid, px, py) in enumerate(points):
        dominated = any(
            (qx <= px and qy >= py and (qx < px or qy > py))
            for j, (qid, qx, qy) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((pid, px, py))
    return sorted(out)


def _run(spark, points):
    df = spark.createDataFrame(
        points, "part_id long, price double, size int"
    )
    rows = skyline_2d(df).collect()
    return sorted((r.part_id, r.price, r.size) for r in rows)


def test_adversarial_shapes(spark):
    points = [
        (0, 10.0, 5),  # frontier
        (1, 10.0, 5),  # exact duplicate: both stay (no strict dominance)
        (2, 12.0, 5),  # dominated by 0 (same size, pricier)
        (3, 9.0, 4),  # frontier (cheaper, smaller)
        (4, 9.0, 5),  # dominates 0,1,3? cheaper than 0 and size 5 -> yes
        (5, 50.0, 50),  # frontier (max size)
        (6, 49.999, 49),  # frontier: same top bucket as 5, not dominated
        (7, 50.0, 49),  # dominated by 5 within the same bucket
        (8, 8.0, 1),  # frontier (cheapest)
    ]
    assert _run(spark, points) == _brute(points)


def test_degenerate_equal_prices(spark):
    points = [(i, 7.0, s) for i, s in enumerate([1, 9, 9, 3])]
    # all prices equal: frontier = max-size rows only
    assert _run(spark, points) == _brute(points)
    assert {p[2] for p in _run(spark, points)} == {9}


def test_fixture_query_is_minimal_frontier(spark, sf_dir):
    rows = load_all()["q_skyline"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    # pairwise non-domination within the result
    pts = [(r.price, r.size) for r in rows]
    for i, (px, py) in enumerate(pts):
        for j, (qx, qy) in enumerate(pts):
            if i != j:
                assert not (
                    qx <= px and qy >= py and (qx < px or qy > py)
                )
