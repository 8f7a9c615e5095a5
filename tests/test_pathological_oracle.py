"""Spark-vs-DuckDB parity on a PATHOLOGICAL events fixture — the
shapes the driver's generated testdata never produces (single-event
users/types, one-day series, constant values, types living entirely in
one time half, simultaneous timestamps). The hand-replay unit tests
prove semantics on the fixture; this file proves the ORACLES stay
bit-exact off the happy path, which is exactly where engine-divergence
bugs (null handling, /0, empty groups) hide.
"""

from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_oracle import canonize, compare_one  # noqa: E402

from lakehouse_weather_spark.registry import load_all  # noqa: E402

_QUERIES = [
    "q_welch_ttest",
    "q_mannwhitney",
    "q_cuped",
    "q_did",
    "q_twap",
    "q_changepoint",
    "q_attribution",
    "q_seq_patterns",
    "q_window_funnel",
    "q_cohort_ltv",
    "q_sliding_distinct",
    "q_srm_check",
    "q_holt_linear",
    "q_mase",
    "q_causal_impact",
    "q_ewma_smooth",
    "q_cusum_shift",
    "q_l_diversity",
    # wider event-family coverage: windows, funnels, sessions, drift,
    # seasonality — every one must stay engine-exact on degenerate data
    "q_win_tumbling",
    "q_win_sliding",
    "q_funnel",
    "q_retention_cohorts",
    "q_event_transitions",
    "q_event_pattern",
    "q_time_rollup",
    "q_session_window",
    "q_sessionize",
    "q_outlier_mad",
    "q_volume_anomaly",
    "q_win_range_time",
    "q_interarrival_hist",
    "q_dist_drift",
    "q_ks_drift",
    "q_funnel_latency",
    "q_gini_activity",
    "q_burstiness",
    "q_type_cooccurrence",
    "q_seasonal_decompose",
    "q_autocorr",
    "q_calendar_gaps",
    "q_disorder_profile",
    "q_winsorize",
    "q_decayed_engagement",
    "q_user_features",
    "q_type_overlap",
    "q_bloom_filter",
    "q_hll_manual",
    "q_win_laglead",
    "q_win_frame",
    "q_win_navigation",
    "q_point_in_time_features",
    "q_pivot_events",
    "q_resample_ffill",
    "q_interval_merge",
    "q_map_histogram",
    "q_variant_extract",
    # gaps-and-islands on degenerate shapes: 1-day users, ties
    "q_streaks",
    # bottom-k sketch where most types have fewer than k hashes
    "q_kmv_distinct",
    # CvM on types living entirely in one time half (n1 or n2 = 0)
    "q_cvm_drift",
    # global numbering across same-microsecond ties and 1-event days
    "q_global_ordinal",
    # Theil-Sen where 'solo' has ONE day (no pairs) and 'flat' is level
    "q_theilsen",
    # Z-set fold where retraction can erase a type's LAST row, and
    # journey paths across same-microsecond ties
    "q_zset_ivm",
    "q_journey_paths",
    "q_format_masks",
    # OHLC candles where open==close on a 1-event day and two events
    # share the same microsecond (struct tie-break); rank shift where
    # types live entirely in one half (n=0 ranks tie-broken by name)
    "q_ohlc_daily",
    "q_rank_shift",
    # growth accounting where a user is active ONE week (new + churn
    # in the same row) and weeks have gaps (resurrection)
    "q_growth_accounting",
    # OLS on single-day types (zero x-variance guards) and the
    # adoption curve with several users sharing one first day
    "q_ols_trend",
    "q_running_unique",
    # peaks on 1-day series (both neighbors absent -> edge vs 0)
    "q_local_peaks",
    # linear interpolation where a type has ONE observation (prev ==
    # next on every grid row) and the grid has leading/trailing gaps
    "q_resample_linear",
    # round-5: KMV pair sketches where every type has < k hashes (the
    # exact-fallback path on BOTH the union and intersection arms);
    # HLL daily partials where most (type, day) cells are singletons;
    # IPS where a context holds one action (propensity 1); lateness
    # where same-microsecond ties make late_s exactly 0
    "q_kmv_intersect",
    "q_hll_merge_daily",
    "q_ips_offpolicy",
    "q_late_data_audit",
    # round-7 second batch: k-sample global ranks, SAX symbols, and
    # the isotonic bin fit over the degenerate event stream
    "q_kruskal_wallis",
    "q_sax_motifs",
    "q_isotonic_pava",
    "q_propensity_strata",
    # true streaming dedup on a multi-file fixture directory
    "q_stream_dedup",
    # erasure audit where the deletion list matches nobody (user ids
    # 1..6 and 40000/40001: 0 hits -> all-zero shares, no /0)
    "q_erasure_audit",
    # round-7: Poisson bootstrap where tiny types can draw all-zero
    # replicate weights (NULL mean excluded on both sides); DP noise on
    # 1-event types (count + negative noise can go below zero);
    # compaction/retention over an 8-day toy calendar
    "q_bootstrap_ci",
    "q_dp_counts",
    "q_compaction_plan",
    "q_retention_plan",
    # calibration bins where single events land in sparse bins
    "q_calibration_bins",
]

_BASE = dt.datetime(2026, 3, 1)


def _pathological_rows():
    rows = []
    eid = 0

    def add(days, minutes, uid, typ, val):
        nonlocal eid
        rows.append(
            (
                eid,
                _BASE + dt.timedelta(days=days, minutes=minutes),
                uid,
                typ,
                val,
                "",
            )
        )
        eid += 1

    # user 1: a single event of a type that appears nowhere else
    add(0, 0, 1, "solo", 1.0)
    # user 2: constant values (zero variance), spread over both halves
    for d in range(8):
        add(d, 5, 2, "flat", 7.0)
    # type 'early' lives ENTIRELY in the first half
    for d in range(3):
        add(d, 10, 3, "early", float(d))
    # type 'late' lives ENTIRELY in the second half
    for d in range(5, 8):
        add(d, 10, 4, "late", float(d))
    # user 5: full funnel twice + trailing orphans, with simultaneous
    # timestamps inside a purchase group
    for rep in range(2):
        add(1, 60 * rep, 5, "view", 0.5)
        add(1, 60 * rep + 1, 5, "click", 0.5)
        add(1, 60 * rep + 2, 5, "signup", 0.5)
        add(1, 60 * rep + 3, 5, "purchase", 9.9)
    add(7, 0, 5, "view", 0.1)  # after the last purchase: attributes to nothing
    # user 6: two events at the SAME microsecond (TWAP zero-gap tie)
    add(2, 0, 6, "flat", 1.0)
    add(2, 0, 6, "flat", 2.0)
    # users 40000/40001: user_ids beyond one bitmap bucket (32768) —
    # the exclusive-bucket path the round-3 q_type_overlap fix covers
    add(3, 0, 40000, "view", 1.5)
    add(3, 5, 40000, "click", 2.5)
    add(6, 0, 40001, "view", 3.5)
    add(0, 30, 40001, "flat", 4.5)
    return rows


@pytest.fixture(scope="module")
def patho_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("patho")
    spark.createDataFrame(
        _pathological_rows(),
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{out}/events.parquet")
    return str(out)


@pytest.fixture(scope="module")
def patho_con(patho_dir):
    con = duckdb.connect()
    # Spark writes a DIRECTORY of part files; DuckDB needs the glob
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{patho_dir}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _QUERIES)
def test_pathological_parity(spark, patho_dir, patho_con, name):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, patho_con, patho_dir)
    assert res["status"] == "OK", (name, res.get("detail"), res)


def test_pathological_fixture_exercises_the_edges(spark, patho_dir):
    # the fixture genuinely contains the degenerate shapes
    from lakehouse_weather_spark.sources.tables import load_table

    ev = load_table(spark, patho_dir, "events").collect()
    types = {}
    for r in ev:
        types.setdefault(r.event_type, []).append(r)
    assert len(types["solo"]) == 1
    assert len({r.value for r in types["flat"][:8]}) <= 2
    assert canonize  # imported utility stays exercised


# --- documents / embeddings pathological fixture ---------------------

_DOC_QUERIES = [
    "q_linkage_patterns",
    "q_feature_hashing",
    "q_oov_rate",
    "q_contrastive_pairs",
    "q_neyman_allocation",
    "q_word_diversity",
    "q_quality_repetition",
    "q_readability",
    "q_unigram_surprisal",
    "q_weighted_sample",
    "q_tfidf",
    "q_phrase_search",
    "q_skipgram",
    # packing where one doc exactly fills a bin and a 1-token doc
    # follows (boundary equality: > CAP, not >=)
    "q_sequence_pack",
    "q_text_fingerprint",
    "q_winnow_fingerprint",
    "q_chunk_split",
    "q_text_tokens",
    "q_dedup_hash",
    "q_l_diversity",  # smoke: unrelated table untouched by doc fixture
    # sampling / mixture / quality / decontam families
    "q_sample_stratified",
    "q_sample_hash",
    "q_sample_quality_weighted",
    "q_split_assign",
    "q_kfold_assign",
    "q_mix_weighted",
    "q_mix_temperature",
    "q_source_cap",
    "q_ccnet_buckets",
    "q_length_buckets",
    "q_mixture_plan",
    "q_gopher_rules",
    "q_pii_redact",
    "q_collocations",
    "q_vocab_coverage",
    "q_keyword_extract",
    "q_bm25",
    "q_text_langid",
    "q_bigram_novelty",
    "q_word_topk",
    "q_text_quality",
    "q_containment",
    "q_decontaminate",
    "q_leakage_pairs",
    "q_jaccard_threshold_hist",
    "q_minhash_scurve",
    "q_dup_spans",
    "q_span_cut",
    "q_token_packing",
    "q_pack_sequences",
    "q_epoch_shuffle",
    "q_shard_manifest",
    # LM-statistics family: single-word docs emit zero bigrams, the
    # 1-doc zh source exercises the DSIR raw pool, duplicate docs give
    # the zipf head mass
    "q_lm_bigram_score",
    "q_dsir_weights",
    "q_vocab_growth",
    "q_zipf_constancy",
    "q_t_closeness",
    # round-4 additions: KN continuation counts on 1-word/duplicate
    # docs; chi2 on the 1-doc (zh, srcB) cell; curriculum interleave
    # with a 1-doc language
    "q_kn_bigram_score",
    "q_chi2_independence",
    "q_curriculum_order",
    "q_hhi_concentration",
    # round-5: ROUGE where doc 6 has no partner (pair dropped by BOTH
    # engines) and the duplicate pair scores a perfect 1.0; reservoir
    # groups smaller than k; lift support floor excluding everything
    # (empty result must agree); repetition blocks on texts shorter
    # than one block; blocking audit where most blocks are singletons
    # (pair budget 0) and the total-budget guard divides by >= 1
    "q_rouge_overlap",
    "q_reservoir_per_group",
    "q_cooccur_lift",
    "q_repetition_loops",
    "q_entity_blocks",
    # round-7: MLM masks on 1-word and duplicate docs (n_tokens = 1;
    # identical plans for identical doc_ids regardless of text dupes)
    "q_mlm_masks",
]

_EMB_QUERIES = [
    "q_mrr",
    "q_team_draft",
    "q_vector_topk",
    "q_ndcg",
    "q_mmr_rerank",
    "q_silhouette",
    "q_coreset",
    "q_embed_centroid",
    "q_hybrid_rrf",
    # round-5: power iteration at dim 8 with duplicate vectors (rank-
    # deficient Gram) — the integer renorm must still converge
    "q_power_iteration",
    # round-7: kNN vote over duplicate vectors (exact distance ties ->
    # nid tie-break) and a corpus smaller than the sample cap
    "q_knn_confusion",
]


def _doc_rows():
    rows = [
        # single-word doc (the n=1 bigram / fingerprint-window edge)
        (0, "hello", "en", "srcA", 5),
        # all-identical words (diversity 0, repetition 1)
        (1, "a a a a a a", "en", "srcA", 11),
        # single-doc SOURCE (zero-weight Neyman stratum; 1-doc rank)
        (2, "x", "zh", "srcB", 1),
        # exact duplicates (dedup + near-dup must agree on survivors)
        (3, "the quick brown fox jumps over the lazy dog again and again", "en", "srcC", 60),
        (4, "the quick brown fox jumps over the lazy dog again and again", "en", "srcC", 60),
        # near-duplicate with one word changed
        (5, "the quick brown fox leaps over the lazy dog again and again", "en", "srcC", 60),
        # longer doc so vocab/oov have a tail
        (
            6,
            " ".join(f"w{i % 7}" for i in range(40)),
            "fr",
            "srcC",
            len(" ".join(f"w{i % 7}" for i in range(40))),
        ),
    ]
    return rows


def _emb_rows():
    # dim 8; vec 1 and 2 IDENTICAL (cosine tie -> vec_id tie-break);
    # distinct labels so NDCG has relevance structure
    base = [
        (0, [1.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0], 1),
        (1, [0.9, 0.1, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0], 1),
        (2, [0.9, 0.1, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0], 1),
        (3, [0.0, 1.0, 0.0, 0.0, 0.0, 0.5, 0.0, 0.0], 2),
        (4, [0.0, 0.9, 0.1, 0.0, 0.0, 0.5, 0.0, 0.0], 2),
        (5, [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.5, 0.0], 3),
        (6, [0.0, 0.0, 0.9, 0.1, 0.0, 0.0, 0.5, 0.0], 3),
        (7, [0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2], 1),
    ] + [
        # filler so top-k pools exist
        (8 + i, [0.1 * ((i + j) % 5) for j in range(8)], (i % 3) + 1)
        for i in range(24)
    ]
    return base


@pytest.fixture(scope="module")
def patho_doc_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("patho_docs")
    spark.createDataFrame(
        _doc_rows(), "doc_id long, text string, lang string,"
        " source string, n_chars long"
    ).coalesce(1).write.parquet(f"{out}/documents.parquet")
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    spark.createDataFrame(_emb_rows(), schema).coalesce(1).write.parquet(
        f"{out}/embeddings.parquet"
    )
    # events: reuse the pathological event rows so q_l_diversity runs
    spark.createDataFrame(
        _pathological_rows(),
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{out}/events.parquet")
    return str(out)


@pytest.fixture(scope="module")
def patho_doc_con(patho_doc_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{patho_doc_dir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", _DOC_QUERIES + _EMB_QUERIES)
def test_pathological_doc_parity(spark, patho_doc_dir, patho_doc_con, name):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, patho_doc_con, patho_doc_dir)
    assert res["status"] == "OK", (name, res.get("detail"), res)


# near-dup family on degenerate docs: 1-word docs (shorter than the
# shingle window), exact duplicates, and a 1-doc source — the shapes
# where shingle/banding edge cases hide
_DEDUP_QUERIES = [
    "q_minhash_neardup",
    "q_bfs_radius",
    "q_minhash_estimate",
    "q_simhash",
    "q_ngram_jaccard",
    "q_dedup_clusters",
    "q_dedup_keep_best",
    "q_dedup_content",
    "q_dedup_paragraphs",
    "q_dedup_savings",
    "q_lsh_eval",
    "q_heavy_hitters",
    "q_win_rownum",
    "q_count_per_source",
    # bounded k-core peel on a graph that is ONE pair + one triangle-ish
    # family: the pair must peel away entirely
    "q_kcore",
    # assortativity where the near-dup graph is one clique + one pair:
    # constant-degree components stress the zero-variance guard
    "q_assortativity",
    # Bellman-Ford where the source component is one pair: most nodes
    # stay unreached and rounds past convergence must be no-ops
    "q_bellman_ford",
    # round-5: shingle-width audit where 1-word docs collapse to the
    # single-shingle branch at EVERY width; 2-hop reach on a graph
    # that is one pair (strict 2-hop must be empty); modularity where
    # the near-dup graph lives in one source (Q = contribution of a
    # single community)
    "q_dedup_shingle_size",
    "q_graph_2hop",
    "q_modularity",
    # purity over the duplicate-pair cluster (exact dup pair must be
    # purity 10000) and the chained near-dup triple
    "q_cluster_purity",
]


@pytest.mark.parametrize("name", _DEDUP_QUERIES)
def test_pathological_dedup_parity(spark, patho_doc_dir, patho_doc_con, name):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, patho_doc_con, patho_doc_dir)
    assert res["status"] == "OK", (name, res.get("detail"), res)


# --- lineitem / orders / customer pathological fixture ---------------

_REL_QUERIES = [
    "q_table_checksum",
    "q_lateral_topk",
    "q_survival_km",
    "q_rfm",
    "q_target_encode_oof",
    "q_bloom_semijoin",
    # round-4: Benford over 4 orders (digits with zero observed mass),
    # zone maps where every shard is a singleton, weighted median with
    # a NULL group key and zero-discount weights
    "q_benford",
    "q_zone_map",
    "q_weighted_median",
    # 5-row replica diff where the deterministic drop rule fires on
    # nothing: BOTH engines must agree the diff is EMPTY
    "q_merkle_diff",
    # FD audit where a dependent column holds NULLs (distinct-count
    # semantics must agree) and a determinant group is a singleton
    "q_fd_discovery",
    # Simpson detector where a segment has NO orders (absent from the
    # pooled table) and strata are single-order cells
    "q_simpson_flip",
    # proration where ship precedes order (span normalized) and spans
    # crossing a month boundary by one day
    "q_prorate_revenue",
    # mode with a tie (two statuses at equal count -> value tiebreak)
    "q_agg_mode",
    # row diff where the NULL returnflag row survives: NULL-safe
    # column compare must NOT flag NULL == NULL as changed
    "q_row_diff",
    # round-5: range split points where the sample is the whole table
    # and cut dates repeat (ties at every boundary); bucketed Q3 on a
    # 4-order fixture (buckets mostly empty); SQL UDFs macro-expanded
    # over 5 lineitem rows; z-order layouts where most grid cells are
    # empty and cut lists have duplicate values
    "q_range_split_points",
    "q_tpch_q3_bucketed",
    "q_sql_udf",
    "q_zorder_prune",
]


@pytest.fixture(scope="module")
def patho_rel_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("patho_rel")
    base = dt.datetime(2026, 5, 1)

    def day(n):
        return base + dt.timedelta(days=n)

    # customers: one per segment incl. a segment with a SINGLE customer
    cust = [
        (1, "Customer#1", 0, 100.0, "SEG_A"),
        (2, "Customer#2", 1, -5.0, "SEG_A"),
        (3, "Customer#3", 2, 0.0, "SEG_B"),  # 1-customer segment
        (4, "Customer#4", 0, 50.0, "SEG_C"),  # segment with NO orders
    ]
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(f"{out}/customer.parquet")

    # orders: single-order customer; all of SEG_B's orders in ONE fold;
    # an URGENT top-price order for the bloom dim
    orders = [
        (10, 1, "O", 100.0, day(0), "1-URGENT"),
        (11, 1, "O", 500000.0, day(1), "1-URGENT"),  # bloom dim member
        (12, 2, "F", 200.0, day(2), "5-LOW"),
        (13, 3, "O", 300.0, day(3), "3-MEDIUM"),  # SEG_B single order
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).coalesce(1).write.parquet(f"{out}/orders.parquet")

    # lineitems: ship BEFORE order (filtered by KM), ship far beyond
    # the horizon (censored), same-day ship, and a NULL returnflag
    li = [
        (10, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", day(0)),
        (10, 2, 2, 2, 2.0, 20.0, 0.1, 0.0, "R", "F", day(400)),  # censored
        (11, 3, 3, 1, 3.0, 30.0, 0.2, 0.1, None, "O", day(2)),  # NULL flag
        (12, 4, 4, 1, 4.0, 40.0, 0.0, 0.0, "A", "F", day(1)),  # ship<order
        (13, 5, 5, 1, 5.0, 50.0, 0.3, 0.2, "N", "O", day(3)),
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(f"{out}/lineitem.parquet")
    return str(out)


@pytest.fixture(scope="module")
def patho_rel_con(patho_rel_dir):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{patho_rel_dir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", _REL_QUERIES)
def test_pathological_rel_parity(spark, patho_rel_dir, patho_rel_con, name):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, patho_rel_con, patho_rel_dir)
    assert res["status"] == "OK", (name, res.get("detail"), res)


# --- full relational star on pathological shapes ---------------------

# TPC-H + relational operators on the degenerate star: single-row
# dims, a part never ordered, a supplier with no lineitems, date
# predicates that select nothing — row counts are tiny or zero, and
# BOTH engines must agree exactly (including on empty results).
_STAR_QUERIES = [
    "q_tpch_q1", "q_tpch_q2", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5",
    "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10",
    "q_tpch_q11", "q_tpch_q12", "q_tpch_q13", "q_tpch_q14", "q_tpch_q15",
    "q_tpch_q16", "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q20",
    "q_tpch_q21", "q_tpch_q22",
    "q_join_inner", "q_join_left", "q_join_anti", "q_join_broadcast",
    "q_agg_basic", "q_agg_distinct", "q_agg_rollup", "q_agg_filtered",
    "q_agg_cube", "q_agg_median", "q_agg_quantiles", "q_agg_minmax_by",
    "q_profile_lineitem", "q_dq_constraints", "q_join_cardinality",
    "q_selfjoin_fanout", "q_abc_classification", "q_scan_parquet",
    "q_sort", "q_topk", "q_grouping_sets", "q_rollup_consistency",
    "q_win_distribution",
    "q_bitmap_distinct",
    "q_histogram",
    "q_date_format",
    # association mining on the tiny star: never-ordered part 9,
    # single-line orders (no pairs), everything-supplier skew
    "q_basket_pairs",
    "q_itemcf_topk",
]


@pytest.fixture(scope="module")
def patho_star_dir(spark, patho_rel_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("patho_star")
    import shutil

    for t in ("customer", "orders", "lineitem"):
        shutil.copytree(
            f"{patho_rel_dir}/{t}.parquet", f"{out}/{t}.parquet"
        )
    # a few queries profile the events stream alongside the star
    spark.createDataFrame(
        _pathological_rows(),
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{out}/events.parquet")
    spark.createDataFrame(
        [(0, "REGION_X"), (1, "REGION_Y")],
        "r_regionkey int, r_name string",
    ).coalesce(1).write.parquet(f"{out}/region.parquet")
    spark.createDataFrame(
        [(0, "NATION_A", 0), (1, "NATION_B", 0), (2, "NATION_C", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.parquet(f"{out}/nation.parquet")
    # supplier 5 supplies nothing; supplier 1 supplies everything
    spark.createDataFrame(
        [(s, f"Supplier#{s}", s % 3, 10.0 * s) for s in (1, 2, 3, 4, 5)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.parquet(f"{out}/supplier.parquet")
    # part 9 is never ordered
    spark.createDataFrame(
        [
            (p, f"part name {p}", f"Brand#{p % 2}", f"TYPE {p % 3}",
             p * 7 % 11, 100.0 + p)
            for p in (1, 2, 3, 4, 5, 9)
        ],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.parquet(f"{out}/part.parquet")
    return str(out)


@pytest.fixture(scope="module")
def patho_star_con(patho_star_dir):
    con = duckdb.connect()
    for t in (
        "customer", "orders", "lineitem", "region", "nation",
        "supplier", "part", "events",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{patho_star_dir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", _STAR_QUERIES)
def test_pathological_star_parity(
    spark, patho_star_dir, patho_star_con, name
):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, patho_star_con, patho_star_dir)
    assert res["status"] == "OK", (name, res.get("detail"), res)


# --- 64-dim pathological embeddings: the ANN family ------------------

_ANN_QUERIES = [
    "q_dbscan_grid",
    "q_mmd_drift",
    "q_vector_topk",
    "q_vector_topk_lsh",
    "q_vector_topk_ivf",
    "q_vector_topk_pq",
    "q_embed_sq8",
    "q_ann_recall",
    "q_embed_standardize",
    "q_embed_norm_audit",
    "q_embed_centroid",
    "q_label_outliers",
    "q_kmeans_clusters",
    "q_silhouette",
    "q_coreset",
    "q_ndcg",
    "q_mmr_rerank",
    "q_maxsim_late_interaction",
    "q_mrl_prefix_eval",
    "q_semantic_dedup",
    "q_embed_neardup",
    "q_knn_confusion",
]


def _emb64_rows():
    dim = 64
    rows = []
    # query vector 0: a sharp one-hot-ish direction
    v0 = [0.0] * dim
    v0[0], v0[32] = 1.0, 0.5
    rows.append((0, v0, 1))
    # vectors 1 and 2: EXACT duplicates near the query
    v1 = [0.0] * dim
    v1[0], v1[1], v1[32] = 0.9, 0.1, 0.5
    rows.append((1, list(v1), 1))
    rows.append((2, list(v1), 1))
    # an almost-antipodal vector (negative dot)
    v3 = [-x for x in v0]
    v3[5] = 0.3
    rows.append((3, v3, 2))
    # a tiny-magnitude (but nonzero) vector
    rows.append((4, [1e-3 if j % 7 == 0 else 0.0 for j in range(dim)], 2))
    # filler: deterministic spread across three label clusters
    for i in range(5, 40):
        v = [0.0] * dim
        base = (i % 3) * 20
        for j in range(6):
            v[base + ((i + j) % 20)] = 0.1 + 0.05 * ((i + j) % 5)
        rows.append((i, v, (i % 3) + 1))
    return rows


@pytest.fixture(scope="module")
def patho_ann_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("patho_ann")
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    spark.createDataFrame(_emb64_rows(), schema).coalesce(1).write.parquet(
        f"{out}/embeddings.parquet"
    )
    return str(out)


@pytest.fixture(scope="module")
def patho_ann_con(patho_ann_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{patho_ann_dir}/embeddings.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _ANN_QUERIES)
def test_pathological_ann_parity(spark, patho_ann_dir, patho_ann_con, name):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, patho_ann_con, patho_ann_dir)
    assert res["status"] == "OK", (name, res.get("detail"), res)


# --- combined fixture: the remaining registry tail -------------------

# Everything not already covered above runs against a combined
# pathological dir holding ALL eight tables (64-dim embeddings).
# Binary/media ops are excluded (they synthesize their own binary
# landing data and have no SQL oracle surface here).
_TAIL_QUERIES = [
    "q_array_explode", "q_array_ops", "q_bpe_pair_counts",
    "q_cdc_chunks", "q_chunk_recursive", "q_cluster_split",
    "q_coalesce_defaults", "q_corpus_curation", "q_corr_matrix",
    "q_countmin_words", "q_data_card", "q_degree_hist",
    "q_eb_shrinkage", "q_editdist_neardup", "q_equidepth_hist",
    "q_exists_subquery", "q_filter_contains", "q_filter_links",
    "q_filter_nonempty", "q_filter_notnull", "q_filter_pred",
    "q_fuzzy_clusters", "q_group_normalize", "q_hash_ring",
    "q_hll_distinct", "q_html_strip", "q_join_asof",
    "q_join_asof_tolerance", "q_join_range", "q_join_range_naive",
    "q_join_salted", "q_json_roundtrip", "q_k_anonymity",
    "q_label_propagation", "q_lang_doc_stats", "q_langid_eval",
    "q_link_prediction", "q_negative_samples", "q_not_in_nulls",
    "q_null_semantics", "q_pagerank_neardup", "q_pandas_grouped_agg",
    "q_project_rename", "q_quantile_sketch", "q_scalar_mix",
    "q_scalar_subquery", "q_scan_documents", "q_scan_events",
    "q_scd2_intervals", "q_set_except", "q_set_except_all",
    "q_set_intersect", "q_set_intersect_all", "q_set_union",
    "q_simhash_neardup", "q_skew_profile", "q_skyline",
    "q_source_overlap", "q_source_scorecard", "q_str_endswith",
    "q_str_extra", "q_str_filename", "q_str_parse_url",
    "q_str_regex_clean", "q_str_sha2", "q_temporal_split",
    "q_tokenize_greedy", "q_tokenizer_fertility", "q_triangle_stats",
    "q_udf_urljoin", "q_udtf_ngrams", "q_unicode_nfc", "q_unpivot",
    "q_url_canonical", "q_wilson_bounds", "q_win_rank_stats",
    # round-8 additions (streaming/scratch-table ops excluded here:
    # the empty- and single-row-corpus gates already run them)
    "q_interval_overlap_join", "q_cdc_net_effect", "q_permutation_test",
    "q_jackknife_ratio", "q_loo_source_value", "q_mann_kendall",
    "q_levene_bf", "q_geo_radius_join", "q_geo_cell_rollup",
    "q_text_code_score", "q_rolling_backtest", "q_ols_2feat",
    "q_markov_stationary", "q_encoding_advisor", "q_weighted_quantiles",
    "q_qini_uplift", "q_group_sequential", "q_trimmed_mean",
    "q_spearman_corr", "q_version_cdf", "q_linkage_em",
    # round-9 additions (q_stream_session_evict excluded here: the
    # empty/single-row corpora already gate streaming lifecycles)
    "q_anova_f", "q_odds_ratio", "q_fdr_bh", "q_heavy_change",
    "q_column_impurity", "q_stratified_alloc", "q_priority_sample",
    "q_geo_trajectory", "q_doc_structure", "q_mcnemar", "q_runs_test",
    "q_capture_recapture", "q_lorenz_deciles", "q_ess_weights",
    "q_conformal_pi", "q_arrow_scan_stats", "q_dpp_prune",
    "q_ab_power", "q_expected_shortfall",
    # round-10 additions
    "q_referential_integrity", "q_schema_drift", "q_drawdown",
    "q_pinball_loss", "q_rolling_corr", "q_kendall_tau",
    "q_ship_latency", "q_price_quantity_curve", "q_new_vs_returning",
    "q_bounce_rate", "q_hodges_lehmann", "q_cohens_kappa",
    "q_poisson_dispersion", "q_session_duration_stats",
    "q_cramers_v", "q_peak_hour_profile",
]


@pytest.fixture(scope="module")
def patho_all_dir(spark, patho_star_dir, patho_doc_dir, patho_ann_dir,
                  tmp_path_factory):
    out = tmp_path_factory.mktemp("patho_all")
    import shutil

    for t in ("customer", "orders", "lineitem", "region", "nation",
              "supplier", "part", "events"):
        shutil.copytree(
            f"{patho_star_dir}/{t}.parquet", f"{out}/{t}.parquet"
        )
    shutil.copytree(
        f"{patho_doc_dir}/documents.parquet", f"{out}/documents.parquet"
    )
    shutil.copytree(
        f"{patho_ann_dir}/embeddings.parquet", f"{out}/embeddings.parquet"
    )
    return str(out)


@pytest.fixture(scope="module")
def patho_all_con(patho_all_dir):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "region", "nation",
              "supplier", "part", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{patho_all_dir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", _TAIL_QUERIES)
def test_pathological_tail_parity(spark, patho_all_dir, patho_all_con, name):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, patho_all_con, patho_all_dir)
    assert res["status"] in ("OK", "ROWS_ONLY"), (
        name, res.get("detail"), res,
    )


# --- round-7 falsifying corpora ---------------------------------------

# The round-6 hypothesis fuzzer found q_dedup_shingle_size returning 0
# rows where its oracle returns 4 on any corpus where some width yields
# zero qualifying pairs (falsifying example: ONE single-word document).
# Pin that corpus forever: the audit/report queries must emit their
# unconditional spine rows even when every bucket is empty.
_SINGLE_DOC_QUERIES = [
    "q_linkage_patterns",
    "q_dedup_shingle_size",
    "q_jaccard_threshold_hist",
    "q_lsh_eval",
    "q_minhash_scurve",
    "q_dedup_savings",
    "q_doc_dedup_report",
    "q_entity_blocks",
]


@pytest.fixture(scope="module")
def single_doc_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("single_doc")
    spark.createDataFrame(
        [(0, "hello", "en", "srcA", 5)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.parquet(f"{out}/documents.parquet")
    return str(out)


@pytest.fixture(scope="module")
def single_doc_con(single_doc_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{single_doc_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _SINGLE_DOC_QUERIES)
def test_single_doc_parity(spark, single_doc_dir, single_doc_con, name):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, single_doc_con, single_doc_dir)
    assert res["status"] == "OK", (name, res.get("detail"), res)


# Negative rewards with INEXACT integer quotients: Spark `div`
# truncates toward zero while DuckDB `//` also truncates — but the
# floor idioms on either side must agree too. The round-6 advice found
# q_ips_offpolicy's argmax key flooring on the Spark side while the
# oracle truncated; this fixture makes any trunc/floor disagreement
# flip the per-ctx argmax.
@pytest.fixture(scope="module")
def neg_reward_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("neg_reward")
    rows, eid = [], 0
    for uid, typ, vals in [
        (1, "a", [-0.07, -0.07, -0.08]),  # sum=-22c, n=3: inexact, <0
        (1, "b", [-0.07, -0.08]),         # sum=-15c, n=2: inexact, <0
        (11, "a", [-0.11, -0.05]),        # ctx 1 again (11 % 10)
        (2, "a", [0.07, 0.08, 0.09]),
        (2, "b", [0.05]),
    ]:
        for v in vals:
            rows.append(
                (eid, _BASE + dt.timedelta(minutes=eid), uid, typ, v, "")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{out}/events.parquet")
    return str(out)


@pytest.fixture(scope="module")
def neg_reward_con(neg_reward_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{neg_reward_dir}/events.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", ["q_ips_offpolicy", "q_attribution"])
def test_negative_reward_parity(spark, neg_reward_dir, neg_reward_con, name):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, neg_reward_con, neg_reward_dir)
    assert res["status"] == "OK", (name, res.get("detail"), res)


# --- round-9 null-bearing corpus ---------------------------------------

# ADVICE r8 flagged the complete-case class: Spark sorts NULLS FIRST
# where DuckDB defaults NULLS LAST, NULL keys silently drop from inner
# joins, and map keys may not be NULL. A sweep of the full registry
# over an events table carrying NULL value / NULL event_type / NULL
# user_id rows surfaced 16 latent divergences (all fixed with mirrored
# complete-case filters or null-safe joins); this corpus pins them.
_NULL_EVENTS_QUERIES = [
    "q_levene_bf", "q_mannwhitney", "q_kruskal_wallis", "q_cvm_drift",
    "q_ks_drift", "q_outlier_mad", "q_winsorize", "q_sax_motifs",
    "q_negative_samples", "q_quantile_sketch", "q_choose_join_plan",
    "q_markov_stationary", "q_welch_ttest", "q_zset_ivm",
    "q_group_normalize", "q_map_histogram", "q_version_cdf",
    # near relatives that already passed the null sweep — pinned so
    # they stay null-clean
    "q_spearman_corr", "q_mann_kendall", "q_trimmed_mean",
    "q_weighted_quantiles", "q_permutation_test", "q_dist_drift",
    "q_theilsen", "q_changepoint", "q_agg_basic", "q_histogram",
    # round-9 events-based queries: complete-case guarded by design
    "q_anova_f", "q_odds_ratio", "q_fdr_bh", "q_mcnemar",
    "q_runs_test", "q_capture_recapture", "q_lorenz_deciles",
    "q_conformal_pi", "q_geo_trajectory", "q_heavy_change",
    "q_column_impurity", "q_ab_power", "q_expected_shortfall",
    # streaming lifecycle: NULL ts reaches the stateful processor as
    # pd.NaT unless the stream filters it (the ADVICE r9 find) — the
    # one battery entry that exercises a real streaming query
    "q_stream_session_evict",
    # round-10 events-based additions: tier-1 guarded by design
    "q_drawdown", "q_pinball_loss", "q_rolling_corr", "q_kendall_tau",
    "q_new_vs_returning", "q_bounce_rate", "q_schema_drift",
    "q_hodges_lehmann", "q_cohens_kappa", "q_poisson_dispersion",
    "q_session_duration_stats", "q_cramers_v", "q_peak_hour_profile",
]


@pytest.fixture(scope="module")
def null_events_dir(spark, patho_all_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("null_events")
    import shutil

    for t in ("customer", "orders", "lineitem", "region", "nation",
              "supplier", "part", "documents", "embeddings"):
        shutil.copytree(
            f"{patho_all_dir}/{t}.parquet", f"{out}/{t}.parquet"
        )
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{patho_all_dir}/events.parquet")
    names = [f.name for f in ev.schema.fields]
    base = ev.orderBy("event_id").limit(1).collect()[0]
    maxid, tmin, tmax = ev.agg(
        F.max("event_id"), F.min("ts"), F.max("ts")
    ).first()

    def mk(i, **kw):
        d = {n: None for n in names}
        d.update(
            event_id=maxid + i, ts=base["ts"], user_id=1,
            event_type="view", value=1.0, props="",
        )
        d.update(kw)
        return tuple(d[n] for n in names)

    import datetime as _dt

    day = _dt.timedelta(days=1)
    extra = spark.createDataFrame(
        [
            mk(1, value=None),
            mk(2, value=None, event_type="click"),
            mk(3, event_type=None, value=3.25),
            mk(4, event_type=None, value=None),
            mk(5, user_id=None, value=0.5),
            mk(6, ts=None, value=0.75),
            # NULL-keyed rows HOLDING the global ts extremes: any
            # query whose Spark side derives min/max(ts) bounds from
            # a complete-case-filtered set while its oracle derives
            # them from all rows (or vice versa) shifts its time-half
            # midpoint and diverges (the ADVICE r9 q_mcnemar class —
            # mid-range null ts rows can never catch it)
            mk(7, user_id=None, value=0.25, ts=tmax + day),
            mk(8, event_type=None, value=0.125, ts=tmax + 2 * day),
            mk(9, value=None, ts=tmin - day),
            mk(10, user_id=None, event_type=None, value=None,
               ts=tmin - 2 * day),
        ],
        ev.schema,
    )
    ev.unionByName(extra).coalesce(1).write.parquet(
        f"{out}/events.parquet"
    )
    return str(out)


@pytest.fixture(scope="module")
def null_events_con(null_events_dir):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "region", "nation",
              "supplier", "part", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{null_events_dir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", _NULL_EVENTS_QUERIES)
def test_null_events_parity(spark, null_events_dir, null_events_con, name):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, null_events_con, null_events_dir)
    assert res["status"] in ("OK", "ROWS_ONLY"), (
        name, res.get("detail"), res,
    )


# --- round-10 NULL join-key / partition-column corpus ------------------

# The r9 null battery covered NULL MEASURES and rank order over events;
# this one puts NULLs in the JOIN KEYS and PARTITION COLUMNS of every
# relational table (VERDICT r9 task 7): FK columns (c_nationkey,
# o_custkey, l_partkey/l_suppkey/l_orderkey, n_regionkey, s_nationkey),
# window/groupBy partition columns (c_mktsegment, l_returnflag,
# l_linestatus, lang, source), ordering columns (o_orderdate,
# l_shipdate, ts), and measures TPC-H aggregates fold (l_quantity,
# c_acctbal). Divergence classes exercised: NULL equi-join key drops
# (both engines, must stay symmetric), eqNullSafe vs IS NOT DISTINCT
# FROM, NULLS FIRST/LAST rank order under NULL ordering keys, NULL
# groups surviving GROUP BY / window PARTITION BY, and pandas float64
# widening of nullable oracle BIGINT columns (NULLS.md #4).
_NULL_JOIN_QUERIES = [
    # join family
    "q_join_inner", "q_join_left", "q_join_anti", "q_join_broadcast",
    "q_join_range", "q_join_range_naive", "q_join_salted",
    "q_join_asof", "q_join_asof_tolerance", "q_join_cardinality",
    "q_choose_join_plan", "q_selfjoin_fanout", "q_lateral_topk",
    "q_bloom_semijoin", "q_exists_subquery", "q_scalar_subquery",
    "q_dpp_prune", "q_not_in_nulls", "q_null_semantics",
    "q_interval_overlap_join",
    # full TPC-H suite over the NULL-FK star schema
    "q_tpch_q1", "q_tpch_q2", "q_tpch_q3", "q_tpch_q3_bucketed",
    "q_tpch_q4", "q_tpch_q5", "q_tpch_q6", "q_tpch_q7", "q_tpch_q8",
    "q_tpch_q9", "q_tpch_q10", "q_tpch_q11", "q_tpch_q12",
    "q_tpch_q13", "q_tpch_q14", "q_tpch_q15", "q_tpch_q16",
    "q_tpch_q17", "q_tpch_q18", "q_tpch_q19", "q_tpch_q20",
    "q_tpch_q21", "q_tpch_q22",
    # windows / sorts / rollups over NULL partition + ordering keys
    "q_win_rownum", "q_win_laglead", "q_win_frame", "q_win_rank_stats",
    "q_win_distribution", "q_win_navigation", "q_win_range_time",
    "q_sort", "q_topk", "q_agg_rollup", "q_rollup_consistency",
    # event-SEQUENCE queries ordered by (ts, event_id) that the r9
    # null-events battery did not cover: a NULL ts must either be
    # complete-case filtered or its placement pinned on both engines
    "q_global_ordinal", "q_journey_paths", "q_attribution",
    "q_scd2_intervals", "q_interarrival_hist", "q_sessionize",
    "q_event_transitions", "q_point_in_time_features", "q_funnel",
    "q_event_pattern", "q_session_window", "q_retention_cohorts",
    "q_win_sliding", "q_running_unique", "q_time_rollup",
    # round-10 additions over the relational NULL-FK tables
    "q_referential_integrity", "q_ship_latency",
    "q_price_quantity_curve",
]


@pytest.fixture(scope="module")
def null_join_dir(spark, patho_all_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("null_join")
    import shutil

    from pyspark.sql import functions as F

    def inject(table: str, idcol: str | None, rows: list[dict]) -> None:
        src = f"{patho_all_dir}/{table}.parquet"
        df = spark.read.parquet(src)
        names = [f.name for f in df.schema.fields]
        base = df.limit(1).collect()[0].asDict()
        new = []
        if idcol is not None:
            maxid = df.agg(F.max(idcol)).first()[0] or 0
        for i, kw in enumerate(rows, start=1):
            d = dict(base)
            if idcol is not None:
                d[idcol] = maxid + i  # fresh PK: no accidental dup keys
            d.update(kw)
            new.append(tuple(d[n] for n in names))
        extra = spark.createDataFrame(new, df.schema)
        df.unionByName(extra).coalesce(1).write.parquet(
            f"{out}/{table}.parquet"
        )

    shutil.copytree(
        f"{patho_all_dir}/region.parquet", f"{out}/region.parquet"
    )
    shutil.copytree(
        f"{patho_all_dir}/embeddings.parquet", f"{out}/embeddings.parquet"
    )
    inject("nation", "n_nationkey", [{"n_regionkey": None}])
    inject("customer", "c_custkey", [
        {"c_nationkey": None},
        {"c_mktsegment": None},
        {"c_acctbal": None},
    ])
    inject("supplier", "s_suppkey", [{"s_nationkey": None}])
    inject("part", "p_partkey", [
        {"p_brand": None}, {"p_type": None}, {"p_size": None},
    ])
    inject("orders", "o_orderkey", [
        {"o_custkey": None},
        {"o_orderdate": None},
        {"o_custkey": None, "o_orderdate": None},
    ])
    # lineitem: no synthetic PK — the injected rows get dangling
    # l_orderkeys above the existing range (a referential-integrity
    # violation both engines must drop identically on inner joins)
    li = spark.read.parquet(f"{patho_all_dir}/lineitem.parquet")
    max_ok = li.agg(F.max("l_orderkey")).first()[0] or 0
    inject("lineitem", None, [
        {"l_orderkey": None},
        {"l_orderkey": max_ok + 1001, "l_partkey": None},
        {"l_orderkey": max_ok + 1002, "l_suppkey": None},
        {"l_orderkey": max_ok + 1003, "l_shipdate": None},
        {"l_orderkey": max_ok + 1004, "l_returnflag": None},
        {"l_orderkey": max_ok + 1005, "l_linestatus": None},
        {"l_orderkey": max_ok + 1006, "l_quantity": None},
        {"l_orderkey": max_ok + 1007, "l_extendedprice": None,
         "l_discount": None},
    ])
    inject("events", "event_id", [
        {"user_id": None}, {"event_type": None}, {"ts": None},
    ])
    inject("documents", "doc_id", [{"lang": None}, {"source": None}])
    return str(out)


@pytest.fixture(scope="module")
def null_join_con(null_join_dir):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "region", "nation",
              "supplier", "part", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{null_join_dir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", _NULL_JOIN_QUERIES)
def test_null_join_keys_parity(spark, null_join_dir, null_join_con, name):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, null_join_con, null_join_dir)
    assert res["status"] in ("OK", "ROWS_ONLY"), (
        name, res.get("detail"), res,
    )
