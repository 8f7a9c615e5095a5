"""Partitioning-independence: the engine's core claim for cluster
reproducibility is that results are BIT-IDENTICAL regardless of
physical execution layout — shuffle-partition count, AQE on/off —
because every float accumulation is fixed-point and every tie-break is
total. These tests re-run representative queries under perturbed
runtime confs and hash-compare against the pinned-conf result.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.registry import load_all

# one per accumulation pattern: plain agg (dsum), iterative CC loop,
# Arrow-kernel cogroup, Python-candidates + recount, ADC integer rank,
# window-frame sums, blocked fuzzy join, sampled cut points, exact
# moment sums
_QUERIES = [
    "q_agg_basic",
    "q_dedup_clusters",
    "q_embed_neardup",
    "q_heavy_hitters",
    "q_vector_topk_pq",
    "q_win_frame",
    "q_editdist_neardup",
    "q_equidepth_hist",
    "q_corr_matrix",
    # round-3 accumulation patterns: floor-quantized iterative rank,
    # codebook-kernel Lloyd assignment, island-merge span coverage,
    # seeded shard-rank data ordering
    "q_pagerank_neardup",
    "q_kmeans_clusters",
    "q_dup_spans",
    "q_epoch_shuffle",
    # per-key sequential integer fold, wedge-join counts, per-lang
    # ntile over a rank proxy, winnowing band-join argmin
    "q_ewma_smooth",
    "q_link_prediction",
    "q_ccnet_buckets",
    "q_winnow_fingerprint",
    # let-bound per-row byte fold, register-max sketch harmonic mean,
    # cross-multiplied ECDF supremum
    "q_binary_ahash",
    "q_hll_manual",
    "q_ks_drift",
]


def _fingerprint(df):
    rows = df.collect()
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in rows)


def _run_all(spark, sf_dir):
    return {n: _fingerprint(load_all()[n].fn(spark, sf_dir)) for n in _QUERIES}


def test_results_invariant_under_layout_confs(spark, sf_dir):
    base = _run_all(spark, sf_dir)
    perturbations = [
        {"spark.sql.shuffle.partitions": "5"},
        {"spark.sql.shuffle.partitions": "17", "spark.sql.adaptive.enabled": "false"},
    ]
    originals = {
        k: spark.conf.get(k)
        for p in perturbations
        for k in p
    }
    try:
        for pert in perturbations:
            for k, v in pert.items():
                spark.conf.set(k, v)
            got = _run_all(spark, sf_dir)
            for name in _QUERIES:
                assert got[name] == base[name], (name, pert)
    finally:
        for k, v in originals.items():
            spark.conf.set(k, v)
