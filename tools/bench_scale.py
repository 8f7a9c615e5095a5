#!/usr/bin/env python
"""Scale-slope bench (VERDICT r7 task 3): time the worst headline
queries at two corpus sizes a DECADE apart and record each query's
scaling exponent

    slope = log(t_big / t_small) / log(sf_big / sf_small)

into ``BENCH_SCALE.json``. The per-round 5 s budget at sf0.1 cannot
distinguish O(n) from O(n^2) on the blocked-pair families
(q_linkage_patterns, q_fuzzy_clusters, q_dedup_*); a measured slope
can. ``tests/test_scale_slope.py`` gates on the committed artifact:
any slope above the super-linear threshold must carry a written cap
argument there or the suite fails.

Corpora come from ``tools/gen_scale_corpus.py`` — deterministic,
driver-shaped tables at arbitrary sf (with the documented bounded-
near-dup-cluster divergence so pair OUTPUT stays linear in n and the
slope measures the plan, not the corpus). Default scales 0.1 and 1.0
(lineitem 600k -> 6M). Each query runs twice per scale; the min is
recorded (first run pays codegen/JIT; at sf1 a linear 3 s query is
~30 s, so fixed overhead does not deflate the slope).

Usage:
    python tools/bench_scale.py                 # full worst-set run
    python tools/bench_scale.py --queries q_tpch_q9 q_lsh_eval
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)
sys.path.insert(0, _HERE)

from gen_scale_corpus import ensure  # noqa: E402

from lakehouse_weather_spark.registry import load_all  # noqa: E402
from lakehouse_weather_spark.session import get_spark  # noqa: E402

# Worst-25 of BENCH_r07 plus relational heavies for breadth (big
# shuffles + big joins scale differently from the blocked-pair
# families).
DEFAULT_QUERIES = [
    # q_stream_dedup runs FIRST: measured in-suite at 11.6 s vs 3.0 s
    # standalone-warm at the same sf0.1 corpus — the cache-heavy
    # dedup/linkage queries that precede it leave the session's block
    # manager and GC in a state that inflates the state-store run.
    # Head position measures the query, not its neighbors; the
    # remaining ~flat times across scales are real per-micro-batch
    # fixed cost (state-store open/commit + checkpoint IO).
    "q_stream_dedup",
    "q_linkage_patterns", "q_lsh_eval", "q_pagerank_neardup",
    "q_fuzzy_clusters", "q_silhouette",
    "q_dedup_clusters", "q_fd_discovery", "q_row_diff", "q_coreset",
    "q_itemcf_topk", "q_bootstrap_ci", "q_prorate_revenue",
    "q_basket_pairs", "q_dedup_shingle_size", "q_kn_bigram_score",
    "q_simhash_neardup", "q_rouge_overlap", "q_vector_topk_pq",
    "q_mmd_drift", "q_seq_patterns", "q_bfs_radius", "q_merkle_diff",
    "q_embed_neardup", "q_dbscan_grid",
    # relational heavies
    "q_tpch_q1", "q_tpch_q9", "q_tpch_q21", "q_join_range",
    "q_minhash_neardup",
    # round-8 join/pair-shaped additions
    "q_interval_overlap_join", "q_geo_radius_join", "q_mann_kendall",
    "q_permutation_test", "q_cdc_net_effect", "q_spearman_corr",
    "q_markov_stationary", "q_weighted_quantiles", "q_version_cdf",
    "q_group_sequential",
    # round-9: the remaining expensive families of BENCH_r08's
    # worst-25 plus every new r8 family not yet measured (VERDICT r8
    # item 5) — checksum/overlap are full-scan heavies, the prune
    # pair is layout-sensitive, encoding/qini are wide aggregations
    "q_table_checksum", "q_source_overlap", "q_hilbert_prune",
    "q_zorder_prune", "q_encoding_advisor", "q_qini_uplift",
    # round-9 scale-interesting shapes: B-fold explode grid, per-user
    # sorted folds, type-partitioned ntile, conformal rank windows
    "q_fdr_bh", "q_geo_trajectory", "q_lorenz_deciles",
    "q_conformal_pi",
]

SCALES = [0.1, 1.0]
CORPUS_ROOT = os.path.join(_REPO, ".scale_corpus")


def _corpus_dir(sf: float) -> str:
    tag = str(sf).replace(".", "_")
    return os.path.join(CORPUS_ROOT, f"sf{tag}")


def _warm(spark, sf_dir: str) -> None:
    spark.range(1).collect()
    # amortized ingest work, identical to bench.py's warmup contract
    try:
        from lakehouse_weather_spark.operators.dedup import (
            warm_dedup_substrate,
        )

        warm_dedup_substrate(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        print(f"WARN warmup substrate: {exc!r}", file=sys.stderr)
    try:
        from lakehouse_weather_spark.operators.tpch import (
            ensure_bucketed_facts,
        )

        ensure_bucketed_facts(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        print(f"WARN warmup bucketed: {exc!r}", file=sys.stderr)


# The second decade (sf1 -> sf10, lineitem 6M -> 60M) is measured on
# the worst-slope families of the first decade plus the relational
# heavies: one decade can hide a super-linear term behind its noise
# floor; two decades of linear-or-better is the 100x evidence the
# design claims rest on (VERDICT r9 task 1). Streaming queries are
# excluded at sf10: their time is per-micro-batch fixed cost, already
# characterized in the first decade and in STREAM_BENCH.json.
DECADE2_QUERIES = [
    "q_simhash_neardup", "q_bootstrap_ci", "q_silhouette",
    "q_linkage_patterns", "q_fuzzy_clusters", "q_weighted_quantiles",
    "q_fdr_bh", "q_rouge_overlap", "q_prorate_revenue",
    "q_permutation_test", "q_geo_radius_join", "q_geo_trajectory",
    "q_coreset", "q_embed_neardup", "q_seq_patterns", "q_zorder_prune",
    "q_tpch_q1", "q_tpch_q9", "q_tpch_q21",
]


def run(queries: list[str], scales: list[float], repeats: int = 2) -> dict:
    specs = load_all()
    times: dict[float, dict[str, float]] = {}
    for sf in scales:
        sf_dir = ensure(sf, _corpus_dir(sf))
        spark = get_spark(f"bench_scale_{sf}")
        _warm(spark, sf_dir)
        per: dict[str, float] = {}
        for name in queries:
            spec = specs.get(name)
            if spec is None:
                continue
            if name.startswith("q_stream"):
                # Streaming pays a PER-JVM JIT/C2 cost that amortizes
                # over SEVERAL executions, not one, and survives
                # session.stop() — so whichever scale runs first in
                # the process eats it and the slope inverts. Measured
                # (fresh JVM, q_stream_dedup at the sf0.1 corpus):
                # 25.2 / 8.3 / 4.0 / 2.8 s across runs, while sf1.0
                # immediately after starts at 5.2 s. THREE untimed
                # warm-up runs per scale put the timed repeats on the
                # flat part of that curve; what remains is real
                # per-micro-batch fixed cost (state-store open/commit
                # + checkpoint IO), which dwarfs row work at both
                # corpus sizes.
                for _ in range(3):
                    try:
                        spec.fn(spark, sf_dir).write.format(
                            "noop"
                        ).mode("overwrite").save()
                    except Exception as exc:  # noqa: BLE001
                        print(f"WARN stream warmup {name}: {exc!r}",
                              file=sys.stderr)
                        break
            best = math.inf
            for _ in range(repeats):
                t0 = time.time()
                df = spec.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            per[name] = round(best, 3)
            print(f"  sf{sf} {name}: {per[name]} s", file=sys.stderr)
        times[sf] = per
        spark.stop()
    lo, hi = min(scales), max(scales)
    decade = math.log(hi / lo)
    out = {
        "scales": scales,
        "times": {str(sf): times[sf] for sf in scales},
        "slopes": {
            name: round(
                math.log(
                    max(times[hi][name], 1e-3)
                    / max(times[lo][name], 1e-3)
                )
                / decade,
                3,
            )
            for name in times[lo]
            if name in times[hi]
        },
    }
    return out


_NOTE = (
    "slope = log(t_big/t_small)/log(sf_big/sf_small) over the"
    " generated scale corpus (tools/gen_scale_corpus.py; bounded"
    " near-dup clusters so pair output is O(n)). slope<=1 ~"
    " linear-or-better; the gate threshold with noise allowance"
    " lives in tests/test_scale_slope.py. Top-level scales/times/"
    "slopes are the primary sf0.1->sf1.0 decade; 'decades' carries"
    " every measured decade including sf1.0->sf10 (lineitem 60M)."
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--scales", nargs=2, type=float, default=SCALES)
    ap.add_argument(
        "--out", default=os.path.join(_REPO, "BENCH_SCALE.json")
    )
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--merge", action="store_true",
        help="update only this decade in the existing artifact,"
        " keeping every other measured decade",
    )
    args = ap.parse_args()
    scales = sorted(args.scales)
    queries = args.queries
    if not queries:
        queries = (
            DECADE2_QUERIES if scales[0] >= 1.0 else DEFAULT_QUERIES
        )
    rec = run(queries, scales, args.repeats)
    key = f"{scales[0]}->{scales[1]}"
    out = {"metric": "scale_slope", "note": _NOTE, "decades": {}}
    if args.merge and os.path.exists(args.out):
        with open(args.out) as fh:
            prev = json.load(fh)
        out["decades"] = prev.get("decades", {})
        if "scales" in prev and "decades" not in prev:
            # migrate a v1 artifact: its one decade becomes an entry
            pk = f"{min(prev['scales'])}->{max(prev['scales'])}"
            out["decades"][pk] = {
                k: prev[k] for k in ("scales", "times", "slopes")
            }
    out["decades"][key] = rec
    # the primary (lowest-lo) decade stays at top level so older
    # readers of the artifact keep working
    primary = min(
        out["decades"].values(), key=lambda d: min(d["scales"])
    )
    out.update(
        {k: primary[k] for k in ("scales", "times", "slopes")}
    )
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"metric": "scale_slope", key: rec["slopes"]}))


if __name__ == "__main__":
    main()
