"""Generative engine-parity fuzzing: hypothesis builds small RANDOM
event tables (degenerate shapes allowed and likely — duplicate
timestamps, single users, zero values, types missing from a time half)
and asserts the Spark result still matches the DuckDB oracle
bit-exactly. The hand-crafted pathological fixtures encode the edge
shapes we THOUGHT of; this file searches for the ones we didn't, and
shrinks any failure to a minimal counterexample.

Example counts are deliberately small (each example pays a parquet
write plus two engine runs); the per-query rotation still covers the
main recursive/ratio/window shapes every run.
"""

from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_oracle import compare_one  # noqa: E402

from lakehouse_weather_spark.registry import load_all  # noqa: E402

# queries spanning the failure modes found by the fixed fixtures:
# ratio guards, recursive folds, user-sharded windows, time splits
_FUZZ_QUERIES = [
    "q_cuped",
    "q_twap",
    "q_attribution",
    "q_mannwhitney",
    "q_holt_linear",
    "q_volume_anomaly",
    # round-4: folds, interpolation, global numbering, mask profiling
    "q_theilsen",
    "q_zset_ivm",
    "q_journey_paths",
    "q_ohlc_daily",
    "q_rank_shift",
    "q_resample_linear",
    "q_global_ordinal",
    "q_format_masks",
    "q_ols_trend",
    "q_local_peaks",
    "q_running_unique",
    "q_growth_accounting",
    # round-5: sketch fallbacks, propensity singletons, lateness ties
    "q_kmv_intersect",
    "q_hll_merge_daily",
    "q_ips_offpolicy",
    "q_late_data_audit",
    "q_survival_km",  # lineitem-free? no — events-only variant excluded
]
_FUZZ_QUERIES.remove("q_survival_km")
# round-7 event-family registrations join the fuzz pool
_FUZZ_QUERIES.extend(
    ["q_bootstrap_ci", "q_dp_counts", "q_compaction_plan",
     "q_retention_plan", "q_calibration_bins"]
)
# round-7 second batch: global-rank decomposition, symbolization, and
# the bin-table isotonic fit must stay exact on degenerate streams
_FUZZ_QUERIES.extend(
    ["q_kruskal_wallis", "q_sax_motifs", "q_isotonic_pava",
     "q_propensity_strata"]
)

_BASE = dt.datetime(2026, 7, 1)

_event = st.tuples(
    st.integers(min_value=0, max_value=4 * 86_400),  # seconds offset
    st.sampled_from([1, 2, 3, 40_000]),  # user ids incl. bucket-edge
    st.sampled_from(["view", "click", "purchase"]),
    st.sampled_from([0.0, 0.5, 1.0, 7.25, 560.21]),
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(_event, min_size=2, max_size=25),
    qname=st.sampled_from(_FUZZ_QUERIES),
)
def test_random_event_tables_stay_engine_exact(
    spark, tmp_path_factory, events, qname
):
    rows = [
        (
            i,
            _BASE + dt.timedelta(seconds=sec),
            uid,
            typ,
            val,
            "",
        )
        for i, (sec, uid, typ, val) in enumerate(events)
    ]
    out = tmp_path_factory.mktemp("fuzz")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{out}/events.parquet/*.parquet')"
    )
    spec = load_all()[qname]
    res = compare_one(qname, spec, spark, con, str(out))
    con.close()
    assert res["status"] == "OK", (qname, res.get("detail"), res)


_DOC_FUZZ_QUERIES = [
    "q_linkage_patterns",
    "q_text_quality",
    "q_bigram_novelty",
    "q_neyman_allocation",
    "q_oov_rate",
    "q_word_diversity",
    "q_contrastive_pairs",
    "q_lm_bigram_score",
    "q_dsir_weights",
    "q_vocab_growth",
    "q_zipf_constancy",
    "q_t_closeness",
    # round-4: term weighting, packing, sampling, n-gram streams
    "q_tfidf",
    "q_skipgram",
    "q_phrase_search",
    "q_sequence_pack",
    "q_weighted_sample",
    # round-5: clipped-count overlap on random pairs, per-group
    # reservoirs smaller than k, lift support-floor edge, block runs
    # on short random texts, singleton blocking keys, width audit on
    # docs shorter than every shingle window
    "q_rouge_overlap",
    "q_reservoir_per_group",
    "q_cooccur_lift",
    "q_repetition_loops",
    "q_entity_blocks",
    "q_dedup_shingle_size",
    # round-7: mask plans on random short docs
    "q_mlm_masks",
]

_WORDS = ["a", "b", "the", "fox", "w1", "w2", "x", ""]

_doc = st.tuples(
    st.integers(min_value=1, max_value=20),  # word count
    st.sampled_from(["en", "zh"]),
    st.sampled_from(["s1", "s2", "s3"]),
)


@settings(
    # 12, not 4: the documents family is where the round-6 fuzzer paid
    # off (the shingle-width spine drop) — a bigger example budget here
    # buys the most divergence coverage per second (each example is one
    # (corpus, query) draw, so 12 examples still samples a minority of
    # the 23-query pool per run; rounds accumulate coverage)
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=1, max_size=10),
    words=st.lists(st.sampled_from(_WORDS), min_size=20, max_size=20),
    qname=st.sampled_from(_DOC_FUZZ_QUERIES),
)
def test_random_doc_tables_stay_engine_exact(
    spark, tmp_path_factory, docs, words, qname
):
    rows = []
    for i, (nw, lang, src) in enumerate(docs):
        text = " ".join(words[(i + j) % len(words)] for j in range(nw))
        rows.append((i, text, lang, src, len(text)))
    out = tmp_path_factory.mktemp("docfuzz")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{out}/documents.parquet/*.parquet')"
    )
    spec = load_all()[qname]
    res = compare_one(qname, spec, spark, con, str(out))
    con.close()
    assert res["status"] == "OK", (qname, res.get("detail"), res)


_EMB_FUZZ_QUERIES = [
    "q_vector_topk",
    "q_embed_centroid",
    "q_embed_standardize",
    "q_embed_norm_audit",
    "q_silhouette",
    "q_coreset",
    "q_kmeans_clusters",
    # exact-tie vectors: DBSCAN's zero-distance pairs and min-root
    # component labels on duplicate-coordinate clusters
    "q_dbscan_grid",
    # kernel-MMD moments: zero-norm vectors, single-label corpora
    "q_mmd_drift",
]

# degenerate-leaning vector component pool: zeros (zero-norm vectors),
# exact ties, tiny magnitudes, negatives
_VALS = [0.0, 1.0, -1.0, 0.5, 0.25, 0.0, 1.0]
_EMB_DIM = 8


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    picks=st.lists(
        st.integers(min_value=0, max_value=len(_VALS) - 1),
        min_size=6 * _EMB_DIM,
        max_size=24 * _EMB_DIM,
    ),
    qname=st.sampled_from(_EMB_FUZZ_QUERIES),
)
def test_random_embedding_tables_stay_engine_exact(
    spark, tmp_path_factory, picks, qname
):
    n = len(picks) // _EMB_DIM
    rows = [
        (
            i,
            [float(_VALS[picks[i * _EMB_DIM + j]]) for j in range(_EMB_DIM)],
            (i % 3) + 1,
        )
        for i in range(n)
    ]
    out = tmp_path_factory.mktemp("embfuzz")
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
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{out}/embeddings.parquet/*.parquet')"
    )
    spec = load_all()[qname]
    res = compare_one(qname, spec, spark, con, str(out))
    con.close()
    assert res["status"] == "OK", (qname, res.get("detail"), res)
