#!/usr/bin/env python
"""Generate PLANS.md: formatted physical plans of representative queries
with a one-line note on why each plan is the right one at 100 TB."""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

from lakehouse_weather_spark.registry import load_all
from lakehouse_weather_spark.session import get_spark

SHOWCASE = {
    "q_scan_parquet": "All predicates + projection pushed into the parquet scan"
    " (PushedFilters / ReadSchema) — row-group skipping at scale.",
    "q_join_broadcast": "Dimensions broadcast; the fact scan never shuffles for"
    " the joins — only the tiny per-group partials exchange.",
    "q_tpch_q5": "6-way star join: region filter prunes through broadcast"
    " dims; one shuffle pair for the fact-fact join, AQE re-plans at runtime.",
    "q_topk": "TakeOrderedAndProject: per-partition heaps, no global sort.",
    "q_agg_basic": "Partial (map-side) + final HashAggregate around a 6-group"
    " exchange; fixed-point BIGINT sums stay in whole-stage codegen.",
    "q_minhash_neardup": "Two shuffles total: signature groupBy + band-bucket"
    " self-join; shingle hashing is a narrow, codegen'd explode.",
    "q_decontaminate": "Tiny eval-set n-gram hashes broadcast; the corpus"
    " stream never shuffles before the final per-doc hit count.",
    "q_vector_topk_pq": "Codebook and ADC lookup table broadcast; ranking is"
    " an integer sum over codes with TakeOrderedAndProject cuts —"
    " full vectors touched only in the 50-candidate rerank.",
    "q_bitmap_distinct": "COUNT(DISTINCT) without shuffling raw keys:"
    " map-side bitmap_construct_agg partials, kilobyte bitmaps exchange,"
    " popcount-sum final.",
    "q_quality_repetition": "One explicit small-fixture fan-out exchange,"
    " then the whole repetition filter is per-row array algebra fused"
    " into one codegen stage (run-length top-counts on sorted arrays).",
    "q_editdist_neardup": "PassJoin blocking: segment/probe explodes are"
    " narrow; candidates come from ONE equi-join on (segment, content)"
    " — no O(n^2) pair generation; levenshtein verify is a narrow map.",
    "q_skyline": "Grid prefilter: 64-group aggregate + broadcast bound"
    " prune, then broadcast self-anti-join over the few survivors —"
    " the NOT-EXISTS O(n^2) never materializes.",
    "q_equidepth_hist": "Bounded TakeOrdered sample -> broadcast cut"
    " points -> narrow array-filter bucketing: no global ntile()"
    " single-task window.",
    "q_maxsim_late_interaction": "Query vectors broadcast as a model"
    " artifact (BNLJ against 10 rows, not a shuffle); per-(doc, qvec)"
    " max and per-doc sum are partial aggs; TakeOrdered final cut —"
    " corpus cost linear in vectors.",
    "q_winnow_fingerprint": "Gram hashing and the following-rows min"
    " window stay per-doc partitions; the rightmost-argmin is a"
    " width-bounded band join (fanout <= w), never a self cross"
    " product.",
    "q_ewma_smooth": "ONE partial-agg shuffle builds per-key series;"
    " the recurrence folds inside a single project (no iterative"
    " jobs, no window over raw events).",
    "q_target_encode_oof": "The 25-row (segment, fold) encoding table"
    " and its totals BROADCAST back onto the customer scan — the"
    " fact side is aggregated once and never re-shuffled.",
    "q_bloom_semijoin": "The 1024-bit bloom table broadcasts; the fact"
    " scan drops non-members before the exact (also broadcast)"
    " semi-join — the shuffle moves only survivors.",
    "q_attribution": "Every window partitions on user_id (the natural"
    " clickstream shard); credit rollup is a map-side-combined"
    " partial aggregation.",
    "q_survival_km": "Fact-scale work is one equi-join + one partial"
    " agg; the product-limit fold runs over a ~100-row bucket"
    " series, so the recurrence costs nothing at any SF.",
    "q_link_prediction": "Wedge enumeration is an equi-join on the"
    " shared middle node of the (cluster-sized) near-dup edge list;"
    " degrees broadcast back; existing edges removed by anti-join.",
    "q_lm_bigram_score": "One corpus-level count agg builds the bigram"
    " model; the context model derives from IT (vocab-sized agg, no"
    " second corpus pass); scoring joins stay on the narrow bigram"
    " stream and the per-doc agg is partial+final.",
    "q_lateral_topk": "LATERAL decorrelated: WindowGroupLimit partial"
    " top-k heaps BEFORE the shuffle, rank filter after, customer side"
    " broadcast — no per-row subquery re-execution.",
    "q_bfs_radius": "Native WITH RECURSIVE (UnionLoop): each iteration"
    " joins the frontier to the checkpointed edge list; the radius"
    " bound caps the loop.",
    "q_variant_extract": "props parses ONCE into a binary VARIANT per"
    " row inside whole-stage codegen; field extraction and the"
    " per-type agg never touch JSON strings again.",
    "q_streaks": "Every window partitions on user_id (per-user day"
    " lists are calendar-bounded); one distinct shuffle on (user,"
    " day) — no global sort anywhere.",
    "q_team_draft": "The sequential draft is a per-query fold over"
    " 30-element ranking-prefix arrays (constant memory per query);"
    " the only corpus-scale work is the broadcast-panel dot scan and"
    " two query-sharded rank windows.",
    "q_kmv_distinct": "Bottom-k sketch: distinct-hash shuffle once,"
    " then the k-th-minimum window per type; the kth-min table is"
    " |types| rows and broadcasts back onto the exact-count agg.",
    "q_global_ordinal": "Global numbering WITHOUT the single-task"
    " window: per-day counts aggregate to a bounded offset list that"
    " broadcasts back; the only unbounded windows partition per day.",
    "q_merkle_diff": "Both replicas fold in ONE lineitem scan + ONE"
    " partial-agg shuffle (conditional aggregates for the lossy"
    " side); the diff join runs on 64 bucket rows.",
    "q_kcore": "Each peel round is a degree partial-agg + two"
    " semi-joins on the shrinking checkpointed edge list; early-exit"
    " on fixpoint keeps rounds at the graph's peel depth.",
    "q_tfidf": "The big shuffle carries (word, count) pairs; df is a"
    " vocabulary-sized agg; the 1-row corpus count cross-joins as a"
    " broadcast; the top-k window partitions per doc.",
    "q_sequence_pack": "Greedy packing is sequential per source and"
    " parallel across sources: one collect_list shuffle builds each"
    " source's series, the fold runs inside a single project.",
    "q_prorate_revenue": "lineitem pre-aggregates to one row per order"
    " BEFORE the join; month explode fans out bounded spans; the"
    " telescoping window partitions per order.",
    "q_tpch_q3_bucketed": "Zero shuffle exchanges: co-bucketed"
    " orders/lineitem sort-merge exchange-free, broadcast customer"
    " preserves bucketing, the orderkey-prefixed groupBy reuses it.",
    "q_power_iteration": "dim^2 integer Gram via one partial-agg"
    " shuffle; every renorm divisor is a 1-row broadcast; matvecs are"
    " joins on the executor-sized matrix, never the corpus.",
    "q_kmv_intersect": "Per-type bottom-k partials merge into pair"
    " sketches; the type-pair directory broadcasts; raw events shuffle"
    " once as distinct hashes.",
    "q_repetition_loops": "Fixed-block explode is narrow; run"
    " detection windows partition per doc — per-doc work at any"
    " corpus size.",
    "q_zone_map": "Two counts-only aggregations over shard keys;"
    " output is O(shards) regardless of table size — the stats pass"
    " that justifies time-partitioned layouts.",
    "q_bootstrap_ci": "Poisson bootstrap: the B-fold replicate explode"
    " and the md5 weight draws stay map-side (codegen'd flat columns,"
    " no lambda eval); partial HashAggregate reduces to |types| x B"
    " cells BEFORE the exchange; the 1-row-per-type base stats branch"
    " broadcasts.",
    "q_compaction_plan": "Per-day partial agg, then the bin-packing"
    " running sum over the calendar-bounded day table (whitelisted"
    " unpartitioned window) — output is O(days), never O(rows).",
    "q_basket_pairs": "ONE collect_set shuffle collapses each basket;"
    " the A-priori prune runs INSIDE the row (array_intersect against"
    " the broadcast frequent list) and ordered pairs explode narrowly"
    " — the basket table never self-joins.",
    "q_hilbert_prune": "The Hilbert walk is four unrolled levels of"
    " integer CASE/div/mod fused into whole-stage codegen; the audit"
    " is one orders scan + a 2-group hash agg — no joins beyond the"
    " broadcast cut-point rows.",
    "q_kruskal_wallis": "Global ranks WITHOUT the single-task window:"
    " value-prefix buckets shuffle once, the bounded offset window"
    " runs over the bucket list, and rank windows partition per"
    " bucket — parallel at any scale.",
    "q_dbscan_grid": "Candidates from a hash EQUI-join on 3x3 exploded"
    " cell keys (fanout 9, never all-pairs); distance verify, degree"
    " count, and the census are codegen'd aggregates; components run"
    " on the bounded core-edge fetch.",
    "q_interval_overlap_join": "Interval x interval overlap as an"
    " EQUI-join on (user, hour-band) with bounded fanout (<= 2 bands"
    " per interval); the overlap-starts-here band filter dedupes"
    " without a distinct shuffle.",
    "q_geo_radius_join": "Radius join blocks points into radius-sized"
    " grid cells; probe side explodes to the 3x3 neighborhood and"
    " hash-joins on the cell key — candidates scale with local"
    " density, never |points|^2.",
    "q_permutation_test": "The B-fold label explode is a narrow (b,"
    " fx) map that partial-aggregates map-side to B rows before the"
    " ONLY shuffle; extremeness is decided on broadcast decimals.",
    "q_cdc_net_effect": "Both changelog window passes partition on"
    " user_id and share one exchange; the squash emits one row per"
    " touched entity — MERGE input stays entity-proportional.",
    "q_mann_kendall": "The pairwise stage self-joins WITHIN user"
    " partitions (<= C(31,2) pairs each) — linear in users; sign"
    " decisions are integer cross products in codegen.",
}


def main() -> None:
    spark = get_spark("plan_dump", shuffle_partitions=8)
    specs = load_all()
    out = [
        "# PLANS — physical plans of representative queries",
        "",
        "Auto-generated by `tools/plan_dump.py` (sf0.001 inputs; plan shape is",
        "scale-independent). Read with `SURVEY.md §4` and `tests/test_plans.py`,",
        "which asserts the load-bearing properties stay true.",
        "",
    ]
    for name, why in SHOWCASE.items():
        df = specs[name].fn(spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", why, "", "```", buf.getvalue().rstrip(), "```", ""]
    open("/root/repo/PLANS.md", "w").write("\n".join(out) + "\n")
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
