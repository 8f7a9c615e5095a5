"""Semantic tests for the blocked edit-distance join (operators/fuzzy.py):
the PassJoin pigeonhole blocking must lose NO true pair, including the
adversarial shapes — edits clustered at the front (maximum positional
shift), edits straddling segment boundaries, and distances exactly at
the threshold. Expected pairs come from an independent DP levenshtein.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.operators.fuzzy import (
    EDIT_MAX,
    KEY_LEN,
    editdist_join,
)
from lakehouse_weather_spark.registry import load_all


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _pad(s: str) -> str:
    return (s[:KEY_LEN] + "~" * KEY_LEN)[:KEY_LEN]


BASE = "abcdefghijklmnopqrstuvwxyz012345"  # exactly 32 chars

CASES = {
    0: BASE,
    1: BASE,  # exact duplicate -> dist 0
    2: "XYZ" + BASE[3:],  # 3 substitutions at the very front
    3: BASE[1:],  # front deletion: EVERY segment shifts by 1
    # (padded: 1 delete + 1 trailing pad edit = dist 2 — with
    # equal-length padded keys each net shift costs 2 edits, so the
    # max reachable shift inside EDIT_MAX=3 is 1; the +-3 probe
    # window is a strict superset)
    4: "Q" + BASE,  # front insertion (truncated): shift 1 other way
    5: BASE[:7] + "#" + BASE[8:15] + "#" + BASE[16:23] + "#" + BASE[24:],
    # ^ one substitution at the END of segments 0,1,2 (boundary edits)
    6: "WWWW" + BASE[4:],  # 4 substitutions -> beyond threshold vs BASE
    7: "completely different text here!!",
}


def test_blocking_equals_bruteforce(spark):
    rows = [(i, _pad(s)) for i, s in CASES.items()]
    keyed = spark.createDataFrame(rows, "doc_id long, key string")
    got = {
        (r.doc_a, r.doc_b): r.dist for r in editdist_join(keyed).collect()
    }
    want = {}
    for i, a in rows:
        for j, b in rows:
            if i < j and _lev(a, b) <= EDIT_MAX:
                want[(i, j)] = _lev(a, b)
    assert got == want
    # the adversarial shapes really are in the answer set
    assert (0, 1) in want and want[(0, 1)] == 0
    assert (0, 2) in want and want[(0, 2)] == 3
    assert (0, 3) in want and want[(0, 3)] == 2  # shifted segments found
    assert (0, 4) in want and want[(0, 4)] == 2
    assert (0, 5) in want and want[(0, 5)] == 3
    assert (0, 6) not in want  # 4 edits excluded


def test_fixture_query_nonempty_and_thresholded(spark, sf_dir):
    rows = load_all()["q_editdist_neardup"].fn(spark, sf_dir).collect()
    assert len(rows) > 0  # planted near-dup groups share prefixes
    assert all(0 <= r.dist <= EDIT_MAX for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)
