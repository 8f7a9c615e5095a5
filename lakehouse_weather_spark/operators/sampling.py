"""Training-data sampling / splitting / packing operators.

The operations a 100 TB training-data pipeline runs between dedup and
tokenization: reproducible sampling, train/val/test assignment, source
mixing, and token-budget packing. All use the shared deterministic
md5 hash (never ``rand()``: engine- and partitioning-dependent), so
every one is oracle-checked and replays identically on any cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table

_SPARK_H100 = (
    "pmod(cast(conv(substr(md5(concat('smp_', cast(doc_id as string))), 1, 15),"
    " 16, 10) as bigint), 100)"
)
_DUCK_H100 = (
    "CAST(('0x' || substr(md5('smp_' || CAST(doc_id AS VARCHAR)), 1, 15))"
    " AS BIGINT) % 100"
)


@register(
    "q_sample_hash",
    oracle=f"""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE {_DUCK_H100} < 20
    """,
    doc="Reproducible 20% sample via content-key hashing — the"
    " production alternative to rand() sampling (stable across"
    " partitioning, cluster size, and reruns; a doc is in or out"
    " forever). Narrow, shuffle-free.",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.expr(_SPARK_H100) < 20).select("doc_id", "lang", "n_chars")


@register(
    "q_split_assign",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN ({_DUCK_H100}) < 80 THEN 'train'
                    WHEN ({_DUCK_H100}) < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents
    """,
    doc="Deterministic 80/10/10 train/valid/test assignment by key hash"
    " — leakage-safe (same doc always lands in the same split, even"
    " across dataset versions).",
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(_SPARK_H100)
    return docs.select(
        "doc_id",
        F.when(h < 80, "train").when(h < 90, "valid").otherwise("test").alias("split"),
    )


@register(
    "q_mix_weighted",
    oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE ({_DUCK_H100}) <
              CASE lang WHEN 'en' THEN 100 WHEN 'zh' THEN 50 ELSE 25 END
    """,
    doc="Weighted source mixing: per-language sampling rates (en 100%,"
    " zh 50%, others 25%) — the dataset-mixture knob of a pre-training"
    " pipeline, deterministic via key hashing.",
)
def q_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 100)
        .when(F.col("lang") == "zh", 50)
        .otherwise(25)
    )
    return docs.filter(F.expr(_SPARK_H100) < rate).select("doc_id", "lang")


@register(
    "q_pack_sequences",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source, text,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        runs AS (
            SELECT doc_id, source, text,
                   CAST((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                        // 256 AS BIGINT) AS batch_id
            FROM toks
        )
        SELECT source, batch_id,
               string_agg(text, '<|sep|>' ORDER BY doc_id) AS sequence,
               count(*) AS n_docs
        FROM runs
        GROUP BY source, batch_id
    """,
    doc="Sequence packing: concatenate each token-budget batch's"
    " documents (doc_id order, '<|sep|>' separators) into one training"
    " sequence — the final pre-tokenization step. Deterministic ordered"
    " aggregation via sort_array(collect_list(struct(...))).",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        "text",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    runs = toks.select(
        "doc_id",
        "source",
        "text",
        F.expr(
            "cast((sum(n_tokens) over (partition by source order by doc_id"
            " rows between unbounded preceding and current row) - 1) div 256"
            " as bigint)"
        ).alias("batch_id"),
    )
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("doc_id", "text"))),
        lambda s: s.getField("text"),
    )
    return runs.groupBy("source", "batch_id").agg(
        F.array_join(ordered, "<|sep|>").alias("sequence"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "q_token_packing",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        runs AS (
            SELECT doc_id, source, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_tokens
            FROM toks
        )
        SELECT doc_id, source, n_tokens,
               CAST((cum_tokens - 1) // 256 AS BIGINT) AS batch_id
        FROM runs
    """,
    doc="Token-budget packing: assign documents to ~256-token training"
    " batches per source via a running token sum (greedy sequential"
    " packing — the standard pre-tokenization batching op). One window"
    " shuffle on source.",
)
def q_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return toks.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(
            "cast((sum(n_tokens) over (partition by source order by doc_id"
            " rows between unbounded preceding and current row) - 1) div 256"
            " as bigint)"
        ).alias("batch_id"),
    )


@register(
    "q_sample_stratified",
    oracle="""
        SELECT doc_id, lang
        FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY CAST(('0x' || substr(md5('strat_' ||
                           CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                           doc_id
                   ) AS rk,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM documents
        )
        WHERE rk <= CAST(ceil(0.1 * n) AS BIGINT)
    """,
    doc="Stratified 10% sample with EXACT per-stratum counts: rank each"
    " stratum (language) by a deterministic md5 key and keep the first"
    " ceil(0.1*n) — unlike independent Bernoulli sampling, every"
    " stratum hits its quota exactly, which is what a mixture-balanced"
    " training set needs. One shuffle on the stratum key; strata are"
    " windowed independently, so skew in one language never blocks"
    " the others.",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(
        "cast(conv(substr(md5(concat('strat_', cast(doc_id as string))), 1, 15),"
        " 16, 10) as bigint)"
    )
    w = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    wn = Window.partitionBy("lang")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rk") <= F.ceil(0.1 * F.col("n")).cast("bigint"))
        .select("doc_id", "lang")
    )


@register(
    "q_sample_quality_weighted",
    oracle="""
        SELECT doc_id, quality_score
        FROM (
            SELECT doc_id,
                   least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0)
                     * (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]'))
                                   AS DOUBLE) / length(text)) AS quality_score,
                   CAST(CAST(('0x' || substr(md5('qw_' || CAST(doc_id AS VARCHAR)),
                                             1, 15)) AS BIGINT) AS DOUBLE)
                     / 1152921504606846976.0 AS u
            FROM documents
        )
        WHERE u < quality_score
    """,
    doc="Quality-weighted sampling (training-data closure): keep each"
    " document with probability equal to its quality score, using the"
    " deterministic md5 uniform instead of rand() — the doc set is"
    " stable across reruns/partitioning, and higher-quality documents"
    " are proportionally over-represented (the standard corpus-"
    "curation reweighting). Narrow, shuffle-free.",
)
def q_sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words).cast("double")
    punct = F.size(
        F.regexp_extract_all("text", F.lit("[^a-z0-9 ]"), F.lit(0))
    ).cast("double")
    score = F.least(n_words / F.lit(50.0), F.lit(1.0)) * (
        F.lit(1.0) - punct / F.length("text")
    )
    u = (
        F.expr(
            "cast(conv(substr(md5(concat('qw_', cast(doc_id as string))), 1, 15),"
            " 16, 10) as bigint)"
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    return (
        docs.select("doc_id", score.alias("quality_score"), u.alias("u"))
        .filter(F.col("u") < F.col("quality_score"))
        .select("doc_id", "quality_score")
    )


@register(
    "q_mix_temperature",
    oracle="""
        WITH tagged AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 100 < 85 THEN 'web'
                        WHEN doc_id % 100 < 95 THEN 'books'
                        ELSE 'code' END AS domain
            FROM documents
        ),
        dom AS (
            SELECT domain, CAST(count(*) AS BIGINT) AS n_docs
            FROM tagged GROUP BY domain
        ),
        rates AS (
            SELECT domain, n_docs,
                   sqrt(CAST((SELECT min(n_docs) FROM dom) AS DOUBLE)
                        / CAST(n_docs AS DOUBLE)) AS p_keep
            FROM dom
        )
        SELECT t.doc_id, t.domain, r.p_keep
        FROM tagged t JOIN rates r USING (domain)
        WHERE CAST(CAST(('0x' || substr(md5('tmp_' || CAST(t.doc_id AS VARCHAR)),
                                        1, 15)) AS BIGINT) AS DOUBLE)
                / 1152921504606846976.0 < r.p_keep
    """,
    doc="Temperature-flattened domain mixture (alpha=0.5): per-source"
    " keep rate sqrt(n_min/n_d), so post-sample domain shares go as"
    " sqrt(n_d) — the standard pretraining flattening that stops a"
    " huge domain drowning small ones; the smallest domain keeps"
    " everything. One tiny per-domain count aggregate broadcast back,"
    " then a narrow deterministic md5-uniform accept per row. sqrt and"
    " division are IEEE-identical in both engines, so even the float"
    " keep-rates oracle-match.",
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # the fixture's sources are uniform, so tag a skewed 85/10/5 domain
    # split to exercise the flattening (in production `domain` is a
    # real column)
    tagged = docs.select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 100 < 85 THEN 'web'"
            " WHEN doc_id % 100 < 95 THEN 'books'"
            " ELSE 'code' END"
        ).alias("domain"),
    )
    dom = tagged.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    n_min = dom.agg(F.min("n_docs").alias("n_min"))
    rates = dom.crossJoin(F.broadcast(n_min)).select(
        "domain",
        F.sqrt(
            F.col("n_min").cast("double") / F.col("n_docs").cast("double")
        ).alias("p_keep"),
    )
    u = (
        F.expr(
            "cast(conv(substr(md5(concat('tmp_', cast(doc_id as string))), 1, 15),"
            " 16, 10) as bigint)"
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    return (
        tagged.join(F.broadcast(rates), "domain")
        .select("doc_id", "domain", "p_keep", u.alias("u"))
        .filter(F.col("u") < F.col("p_keep"))
        .select("doc_id", "domain", "p_keep")
    )


@register(
    "q_temporal_split",
    oracle="""
        WITH b AS (
            SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
            FROM events
        ),
        cuts AS (
            SELECT lo + CAST((hi - lo) * 8 AS BIGINT) / 10 AS cut_us,
                   lo + CAST((hi - lo) * 75 AS BIGINT) / 100 AS gap_us
            FROM b
        )
        SELECT CASE WHEN epoch_us(ts) < gap_us THEN 'train'
                    WHEN epoch_us(ts) >= cut_us THEN 'test'
                    ELSE 'gap' END AS split,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events CROSS JOIN cuts
        GROUP BY 1
    """,
    doc="Temporal train/test split with a leakage gap: train ends at"
    " 75% of the time range, test starts at 80%, and the 5% between is"
    " DROPPED — the guard that stops near-boundary events leaking"
    " label information across the split (hash splits cannot give this"
    " property for time-dependent targets). Cutoffs are exact integer"
    " epoch-micros arithmetic, so membership oracle-matches row for"
    " row.",
)
def q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = "unix_micros(cast(ts as timestamp))"
    b = ev.agg(
        F.expr(f"min({us})").alias("lo"), F.expr(f"max({us})").alias("hi")
    )
    cuts = b.select(
        F.expr("lo + CAST((hi - lo) * 8 AS BIGINT) div 10").alias("cut_us"),
        F.expr("lo + CAST((hi - lo) * 75 AS BIGINT) div 100").alias("gap_us"),
    )
    split = (
        F.when(F.expr(us) < F.col("gap_us"), "train")
        .when(F.expr(us) >= F.col("cut_us"), "test")
        .otherwise("gap")
    )
    return (
        ev.crossJoin(F.broadcast(cuts))
        .groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )


@register(
    "q_negative_samples",
    oracle="""
        WITH tagged AS (
            -- complete cases: a NULL event_type/value makes a NULL
            -- item whose NULL md5 order key ranks NULLS LAST here but
            -- NULLS FIRST in Spark, shifting every user's picks
            SELECT user_id,
                   event_type || '_' ||
                   CAST(least(CAST(floor(value * 10) AS BIGINT), 9)
                        AS VARCHAR) AS item
            FROM events
            WHERE event_type IS NOT NULL AND value IS NOT NULL
        ),
        users AS (SELECT DISTINCT user_id FROM tagged),
        items AS (SELECT DISTINCT item FROM tagged),
        seen AS (SELECT DISTINCT user_id, item FROM tagged),
        unseen AS (
            SELECT u.user_id, i.item
            FROM users u CROSS JOIN items i
            WHERE NOT EXISTS (SELECT 1 FROM seen s
                              WHERE s.user_id = u.user_id
                                AND s.item = i.item)
        )
        SELECT user_id, item FROM (
            SELECT user_id, item,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(('0x' || substr(md5(
                           'neg_' || user_id || '_' || item
                       ), 1, 15)) AS BIGINT), item
                   ) AS rn
            FROM unseen
        ) WHERE rn <= 2
    """,
    doc="Deterministic negative sampling for recommendation training:"
    " per user, up to 2 item classes they have NEVER interacted with,"
    " picked by md5 order (never rand() — the negative set must be"
    " reproducible across reruns and cluster layouts or training is"
    " not). Candidate grid = users x item vocabulary minus the seen"
    " anti-join; at real scale the vocabulary side is the broadcast"
    " dimension and the per-user window is shuffle-bounded by user.",
)
def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # pseudo-item vocabulary: (event_type, value decile) — 50 items,
    # coarse enough to broadcast, fine enough that every user has
    # genuinely unseen items
    # complete cases (mirrored in the oracle): a NULL item would enter
    # the vocabulary and rank NULLS FIRST here vs DuckDB's NULLS LAST
    tagged = ev.filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.expr(
            "concat(event_type, '_',"
            " cast(least(CAST(floor(value * 10) AS BIGINT), 9) as string))"
        ).alias("item"),
    )
    users = tagged.select("user_id").distinct()
    items = tagged.select("item").distinct()
    seen = tagged.distinct()
    unseen = users.crossJoin(F.broadcast(items)).join(
        seen, ["user_id", "item"], "left_anti"
    )
    order_h = F.expr(
        "cast(conv(substr(md5(concat('neg_', cast(user_id as string),"
        " '_', item)), 1, 15), 16, 10) as bigint)"
    )
    w = Window.partitionBy("user_id").orderBy(order_h, F.asc("item"))
    return (
        unseen.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("user_id", "item")
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle + reader sharding (data-loading order)
# ---------------------------------------------------------------------------

EPOCH_SEED = 2
N_READERS = 8


@register(
    "q_epoch_shuffle",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(
                       'epoch_{EPOCH_SEED}_' || CAST(doc_id AS VARCHAR)
                   ), 1, 15)) AS BIGINT) AS k
            FROM documents
        )
        SELECT doc_id,
               CAST(k % {N_READERS} AS BIGINT) AS reader_bucket,
               CAST(row_number() OVER (
                   PARTITION BY k % {N_READERS} ORDER BY k, doc_id
               ) AS BIGINT) AS rank_in_bucket
        FROM keyed
    """,
    doc=f"Deterministic per-epoch corpus shuffle with reader sharding —"
    " the data-loading order stage of a training pipeline: key ="
    f" md5('epoch_<seed>_' || doc_id) assigns each doc a pseudorandom"
    f" position; key % {N_READERS} shards the corpus across readers and"
    " each reader consumes its shard in key order (row_number within"
    " the shard). Changing the seed reshuffles every epoch with zero"
    " state; the same (seed, corpus) always yields the same order on"
    " any cluster. Scale shape: one narrow hash projection + one"
    " PARTITIONED rank window (each reader's shard sorts"
    " independently — never a global single-partition sort).",
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    k = F.expr(
        f"cast(conv(substr(md5(concat('epoch_{EPOCH_SEED}_',"
        " cast(doc_id as string))), 1, 15), 16, 10) as bigint)"
    )
    keyed = docs.select("doc_id", k.alias("k")).withColumn(
        "reader_bucket", (F.col("k") % N_READERS).cast("bigint")
    )
    w = Window.partitionBy("reader_bucket").orderBy("k", "doc_id")
    return keyed.select(
        "doc_id",
        "reader_bucket",
        F.row_number().over(w).cast("bigint").alias("rank_in_bucket"),
    )


# ---------------------------------------------------------------------------
# Per-source document cap (C4/domain-balancing style)
# ---------------------------------------------------------------------------

SOURCE_CAP = 10


@register(
    "q_source_cap",
    oracle=f"""
        SELECT doc_id, source, keep_rank FROM (
            SELECT doc_id, source,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS BIGINT) AS keep_rank
            FROM documents
        )
        WHERE keep_rank <= {SOURCE_CAP}
    """,
    doc=f"Per-source document cap at {SOURCE_CAP} (C4-style domain"
    " balancing: no single domain may dominate the training mix)."
    " Within each source, docs rank by md5(doc_id) — a deterministic"
    " uniform shuffle, so the kept subset is an unbiased reproducible"
    " sample, not head-of-file bias — and ranks beyond the cap drop."
    " Scale shape: one hash projection + one PARTITIONED rank window"
    " (shuffle on source). For a pathological mega-domain the rank"
    " window serializes that domain through one task; the remedy at"
    " 100 TB is a first pass of per-source counts (tiny agg, broadcast"
    " back) that routes only over-cap sources through the window —"
    " under-cap sources (the vast majority) bypass it entirely.",
)
def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("bigint").alias("keep_rank"),
        )
        .filter(F.col("keep_rank") <= SOURCE_CAP)
    )


# ---------------------------------------------------------------------------
# k-fold cross-validation assignment
# ---------------------------------------------------------------------------

N_FOLDS = 5
_SPARK_HF = (
    "pmod(cast(conv(substr(md5(concat('fold_', cast(doc_id as string))), 1, 15),"
    f" 16, 10) as bigint), {N_FOLDS})"
)
_DUCK_HF = (
    "CAST(('0x' || substr(md5('fold_' || CAST(doc_id AS VARCHAR)), 1, 15))"
    f" AS BIGINT) % {N_FOLDS}"
)


@register(
    "q_kfold_assign",
    oracle=f"""
        WITH f AS (
            SELECT doc_id, lang, n_chars, ({_DUCK_HF}) AS fold
            FROM documents
        ),
        fs AS (
            SELECT fold, CAST(count(*) AS BIGINT) AS fold_size,
                   CAST(sum(n_chars) AS BIGINT) AS fold_chars
            FROM f GROUP BY fold
        )
        SELECT f.doc_id, CAST(f.fold AS INTEGER) AS fold,
               fs.fold_size, fs.fold_chars
        FROM f JOIN fs USING (fold)
    """,
    doc=f"Deterministic {N_FOLDS}-fold cross-validation assignment by"
    " salted key hash, with each row carrying its fold's size and"
    " character mass — the leakage-safe CV split (a doc lands in the"
    " same fold across dataset versions; salting decorrelates from the"
    " train/valid/test hash of q_split_assign). The fold-level stats"
    " come from a 5-row aggregate broadcast back onto the scan — the"
    " join adds no shuffle at any corpus size.",
)
def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "doc_id", "n_chars", F.expr(_SPARK_HF).cast("int").alias("fold")
    )
    fs = f.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("fold_size"),
        F.sum("n_chars").cast("bigint").alias("fold_chars"),
    )
    return f.join(F.broadcast(fs), "fold").select(
        "doc_id", "fold", "fold_size", "fold_chars"
    )


# ---------------------------------------------------------------------------
# Output shard manifests (publishing layer)
# ---------------------------------------------------------------------------

SHARD_CHARS = 8_192  # target payload per output shard


@register(
    "q_shard_manifest",
    oracle=f"""
        WITH cum AS (
            SELECT source, doc_id, n_chars,
                   sum(n_chars) OVER (PARTITION BY source
                                      ORDER BY doc_id) AS cum_chars
            FROM documents
        ),
        assigned AS (
            SELECT source, doc_id, n_chars,
                   (cum_chars - n_chars) // {SHARD_CHARS} AS shard_id
            FROM cum
        )
        SELECT source, CAST(shard_id AS BIGINT) AS shard_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS shard_chars,
               CAST(min(doc_id) AS BIGINT) AS min_doc_id,
               CAST(max(doc_id) AS BIGINT) AS max_doc_id
        FROM assigned
        GROUP BY source, shard_id
    """,
    doc=f"Output shard manifests: per source, docs pack into ~"
    f"{SHARD_CHARS}-char shards by running-sum assignment (shard ="
    " chars-before DIV target), and each shard publishes its manifest"
    " row (doc count, payload, id range) — the publishing layer of a"
    " training-data pipeline, where readers consume MANIFESTS instead"
    " of listing objects (the reference's gold layer has no manifest;"
    " its Milvus seed re-lists everything, dags/utils/seed_milvus.py)."
    " The running sum partitions BY SOURCE — the write-side unit — so"
    " no global order exists anywhere; one window + one partial agg."
    " Deterministic integer assignment = reproducible shard layout"
    " across runs, the property incremental publishes rely on.",
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(
            f"CAST((sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id)"
            f" - n_chars) DIV {SHARD_CHARS} AS BIGINT)"
        ).alias("shard_id"),
    )
    return assigned.groupBy("source", "shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("shard_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )


@register(
    "q_curriculum_order",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, lang, n_chars,
                   CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY n_chars, doc_id
                   ) AS BIGINT) AS rank_in_lang
            FROM documents
        ),
        langs AS (
            SELECT lang,
                   CAST(row_number() OVER (ORDER BY lang) AS BIGINT)
                       AS lang_idx,
                   CAST(count(*) OVER () AS BIGINT) AS n_langs
            FROM (SELECT DISTINCT lang FROM documents)
        )
        SELECT r.doc_id, r.lang, r.rank_in_lang,
               (r.rank_in_lang - 1) * l.n_langs + l.lang_idx
                   AS curriculum_pos
        FROM ranked r JOIN langs l ON r.lang = l.lang
    """,
    doc="Curriculum training order (easy-to-hard with stratified"
    " interleave): rank documents by difficulty (n_chars proxy,"
    " doc_id tie-break) WITHIN each language, then compute a global"
    " position arithmetically — rank*n_langs + lang_idx — so epoch"
    " k of every language interleaves round-robin instead of one"
    " language monopolizing the head of training. The Spark-first"
    " point: the global order needs NO global sort — the only windows"
    " are partitioned by lang, and the lang index table is"
    " alphabet-sized and broadcast. Writing the result sorted by"
    " curriculum_pos is a single range-partitioned write at any scale.",
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w).cast("bigint").alias("rank_in_lang"),
    )
    # alphabet-sized frame: the windows below sort |langs| rows only
    wl = Window.orderBy("lang")
    langs = (
        docs.select("lang")
        .distinct()
        .select(
            "lang",
            F.row_number().over(wl).cast("bigint").alias("lang_idx"),
            F.count(F.lit(1))
            .over(Window.partitionBy())
            .cast("bigint")
            .alias("n_langs"),
        )
    )
    return ranked.join(F.broadcast(langs), "lang").select(
        "doc_id",
        "lang",
        "rank_in_lang",
        (
            (F.col("rank_in_lang") - 1) * F.col("n_langs")
            + F.col("lang_idx")
        ).alias("curriculum_pos"),
    )


# ---------------------------------------------------------------------------
# Deterministic weighted priority sampling (without replacement)
# ---------------------------------------------------------------------------

WPS_K = 50  # sample size


@register(
    "q_weighted_sample",
    oracle=f"""
        WITH pri AS (
            SELECT doc_id, n_chars,
                   CAST(CAST(('0x' || substr(md5('ws_' ||
                            CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                        AS DOUBLE)
                       / greatest(n_chars, 1) AS priority
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, priority,
                   CAST(row_number() OVER (ORDER BY priority, doc_id)
                        AS BIGINT) AS sample_rank
            FROM pri
        )
        SELECT doc_id, weight, priority, sample_rank
        FROM ranked WHERE sample_rank <= {WPS_K}
    """,
    doc=f"Weighted priority sample WITHOUT replacement: each doc draws"
    " a deterministic md5 uniform u and competes on priority = u /"
    f" weight (weight = n_chars, floored at 1), and the {WPS_K}"
    f" smallest priorities win — heavier docs get proportionally"
    " smaller priorities, so selection probability scales with weight"
    " (the hash-priority cousin of A-Res reservoir sampling). One"
    " narrow scan + TakeOrderedAndProject per-partition heaps — no"
    " full sort, no rand(): the sample is REPRODUCIBLE across runs,"
    " partitionings, and engines, which is what makes a training-data"
    " subsample auditable. The only float op is one IEEE division"
    " (exactly rounded in every engine); ranks tie-break on doc_id.",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    pri = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("weight"),
        (
            F.expr(
                "cast(conv(substr(md5(concat('ws_',"
                " cast(doc_id as string))), 1, 15), 16, 10) as bigint)"
            ).cast("double")
            / F.greatest(F.col("n_chars"), F.lit(1))
        ).alias("priority"),
    )
    # top-k by priority first (per-partition heaps), THEN rank the
    # bounded k-row winner set — never a global window over the corpus
    topk = pri.orderBy("priority", "doc_id").limit(WPS_K)
    w = Window.orderBy("priority", "doc_id")
    return topk.select(
        "doc_id",
        "weight",
        "priority",
        F.row_number().over(w).cast("bigint").alias("sample_rank"),
    )


# ---------------------------------------------------------------------------
# Sequence packing (LLM training batch construction)
# ---------------------------------------------------------------------------

PACK_CAP = 2_048  # token capacity per packed sequence


@register(
    "q_sequence_pack",
    oracle=f"""
        WITH RECURSIVE toks AS (
            SELECT source, doc_id,
                   least(len(string_split(text, ' ')), {PACK_CAP})
                       AS n_tok
            FROM documents
        ),
        seq AS (
            SELECT source, doc_id, n_tok,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY doc_id) AS rn
            FROM toks
        ),
        packed AS (
            SELECT source, doc_id, n_tok, rn,
                   CAST(0 AS BIGINT) AS bin_id, n_tok AS fill
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.source, s.doc_id, s.n_tok, s.rn,
                   CASE WHEN p.fill + s.n_tok > {PACK_CAP}
                        THEN p.bin_id + 1 ELSE p.bin_id END,
                   CASE WHEN p.fill + s.n_tok > {PACK_CAP}
                        THEN s.n_tok ELSE p.fill + s.n_tok END
            FROM seq s
            JOIN packed p ON s.source = p.source AND s.rn = p.rn + 1
        )
        SELECT source, bin_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS fill_tokens,
               CAST({PACK_CAP} - sum(n_tok) AS BIGINT) AS waste_tokens
        FROM packed
        GROUP BY source, bin_id
    """,
    doc=f"Sequence packing for LLM training: docs pack greedily (in"
    f" deterministic doc_id order) into {PACK_CAP}-token sequences —"
    " a doc that would overflow the open bin starts the next one, no"
    " straddling — and each packed sequence reports fill and padding"
    " waste, THE utilization metric that decides real training cost."
    " Greedy packing is a sequential recurrence (bin state depends on"
    " every prior doc), so it runs as the same F.aggregate integer"
    " fold as the EWMA recurrence: one partial-agg shuffle collects"
    " each source's (doc_id, len) series, the fold packs within the"
    " source, sources pack in parallel. That per-writer-partition"
    " scope is exactly how packing runs at 100 TB — each output"
    " shard packs independently; no global order exists. Oracle"
    " replays the identical recurrence as a recursive CTE.",
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.least(
            F.size(F.split("text", " ")), F.lit(PACK_CAP)
        ).cast("bigint").alias("n_tok"),
    )
    grouped = toks.groupBy("source").agg(
        F.collect_list(F.struct("doc_id", "n_tok")).alias("series")
    )
    fold = f"""
        aggregate(
            array_sort(series),
            named_struct(
                'bin', CAST(0 AS BIGINT), 'fill', CAST(0 AS BIGINT),
                'out', CAST(array() AS
                    array<struct<doc_id:bigint,n_tok:bigint,bin:bigint>>)
            ),
            (acc, x) -> named_struct(
                'bin', CASE WHEN acc.fill + x.n_tok > {PACK_CAP}
                            THEN acc.bin + 1 ELSE acc.bin END,
                'fill', CASE WHEN acc.fill + x.n_tok > {PACK_CAP}
                             THEN x.n_tok ELSE acc.fill + x.n_tok END,
                'out', acc.out || array(named_struct(
                    'doc_id', x.doc_id, 'n_tok', x.n_tok,
                    'bin', CASE WHEN acc.fill + x.n_tok > {PACK_CAP}
                                THEN acc.bin + 1 ELSE acc.bin END))
            ),
            acc -> acc.out
        )
    """
    packed = grouped.select(
        "source", F.explode(F.expr(fold)).alias("e")
    ).select(
        "source",
        F.col("e.n_tok").alias("n_tok"),
        F.col("e.bin").alias("bin_id"),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("fill_tokens"),
        (F.lit(PACK_CAP) - F.sum("n_tok")).cast("bigint").alias(
            "waste_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# Per-group reservoir sampling (hash-order equivalent)
# ---------------------------------------------------------------------------

RESERVOIR_K = 5

_RES_H_SPARK = (
    "cast(conv(substr(md5(concat('res_', cast(doc_id as string))), 1, 15),"
    " 16, 10) as bigint)"
)
_RES_H_DUCK = (
    "CAST(('0x' || substr(md5('res_' || CAST(doc_id AS VARCHAR)), 1, 15))"
    " AS BIGINT)"
)


@register(
    "q_reservoir_per_group",
    oracle=f"""
        SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS sample_rank
        FROM (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY {_RES_H_DUCK}, doc_id) AS rk
            FROM documents
        )
        WHERE rk <= {RESERVOIR_K}
    """,
    doc=f"Per-source uniform {RESERVOIR_K}-document sample — the"
    " distributed equivalent of per-group reservoir sampling"
    " (Vitter's algorithm R keeps a uniform k-subset under streaming;"
    " keeping the k smallest values of a uniform random key is the"
    " same distribution, and a salted md5 of the row key IS that"
    " uniform key, made deterministic). Scale shape: per-partition"
    " partial top-k merges into a global per-group top-k"
    " (TakeOrdered-like, mergeable, one shuffle of k-row partials);"
    " no global sort, no rand() (partitioning-dependent), replayable"
    " across engines and reruns — which is exactly why hash-order"
    " reservoirs are how production pipelines sample eval sets.",
)
def q_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.expr(_RES_H_SPARK), F.col("doc_id"))
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= RESERVOIR_K)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("sample_rank").cast("bigint").alias("sample_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic MLM/span-corruption mask plan
# ---------------------------------------------------------------------------

# 15% mask rate (the BERT default) as a 60-bit integer threshold:
# floor(0.15 * 2^60) — token i of doc d masks iff its md5 draw is
# below it, so the plan is reproducible across runs/engines/partitions.
_MLM_T = 172938225691027040

_MLM_H_SPARK = (
    "cast(conv(substr(md5(concat('mlm_', cast(doc_id as string), '_',"
    " cast(i as string))), 1, 15), 16, 10) as bigint)"
)
_MLM_H_DUCK = (
    "CAST(('0x' || substr(md5('mlm_' || CAST(doc_id AS VARCHAR) || '_'"
    " || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT)"
)


@register(
    "q_mlm_masks",
    oracle=f"""
        WITH lens AS (
            SELECT doc_id,
                   array_length(string_split(text, ' ')) AS n
            FROM documents
        ),
        ipos AS (
            SELECT doc_id, n, unnest(generate_series(1, n)) AS i
            FROM lens
        ),
        pos AS (
            SELECT doc_id, n, i, {_MLM_H_DUCK} AS h FROM ipos
        )
        SELECT doc_id,
               CAST(max(n) AS BIGINT) AS n_tokens,
               CAST(count(*) FILTER (WHERE h < {_MLM_T}) AS BIGINT)
                   AS n_masked,
               CAST(min(i) FILTER (WHERE h < {_MLM_T}) AS BIGINT)
                   AS first_masked,
               CAST(count(*) FILTER (WHERE h < {_MLM_T}) * 1000
                    // max(n) AS BIGINT) AS masked_pm
        FROM pos GROUP BY doc_id
    """,
    doc="Deterministic masked-LM corruption plan: token position i of"
    " doc d masks iff a 60-bit md5(doc, i) draw clears the integer"
    " 15%-rate threshold — the BERT-style pretraining mask, made"
    " reproducible across runs, engines and partitionings (a training"
    " pipeline wants the SAME example set per epoch seed for"
    " debuggability and loss-curve comparability; rand() gives neither)."
    " Per doc: token count, mask count, first masked position, exact"
    " per-mille mask rate. Plan shape: one narrow per-doc pass — the"
    " mask decisions are a filtered sequence() inside the row, no"
    " explode reaches any shuffle; at 100 TB this runs at scan speed"
    " next to tokenization.",
)
def q_mlm_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    masked = (
        f"filter(sequence(1, size(split(text, ' '))),"
        f" i -> ({_MLM_H_SPARK}) < {_MLM_T})"
    )
    return docs.select(
        "doc_id",
        F.expr("size(split(text, ' '))").cast("bigint").alias("n_tokens"),
        F.expr(f"size({masked})").cast("bigint").alias("n_masked"),
        F.expr(f"array_min({masked})").cast("bigint").alias("first_masked"),
        F.expr(
            f"CAST(size({masked}) * 1000"
            f" div size(split(text, ' ')) AS BIGINT)"
        ).alias("masked_pm"),
    )


# ---------------------------------------------------------------------------
# Hamilton (largest-remainder) proportional allocation (round 9)
# ---------------------------------------------------------------------------

_ALLOC_BUDGET = 1_000  # sample budget to apportion across sources


@register(
    "q_stratified_alloc",
    oracle=f"""
        WITH s AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY source
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM s),
        quota AS (
            SELECT s.source, s.n,
                   (s.n * {_ALLOC_BUDGET}) // t.nt AS floor_q,
                   (s.n * {_ALLOC_BUDGET}) % t.nt AS rem
            FROM s CROSS JOIN tot t
        ),
        ranked AS (
            SELECT source, n, floor_q, rem,
                   row_number() OVER (ORDER BY rem DESC, source)
                       AS rk,
                   {_ALLOC_BUDGET} - sum(floor_q) OVER () AS leftover
            FROM quota
        )
        SELECT source, n, CAST(floor_q AS BIGINT) AS floor_quota,
               CAST(floor_q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc
        FROM ranked
    """,
    doc="Hamilton largest-remainder apportionment of a"
    f" {_ALLOC_BUDGET}-row sample budget across document sources:"
    " exact integer quotas n_i*B div N, leftover seats to the largest"
    " remainders (deterministic source tiebreak) — the allocation"
    " whose per-stratum counts sum EXACTLY to the budget, which"
    " proportional rounding never guarantees (q_neyman_allocation"
    " optimizes variance instead; this one guarantees the total)."
    " Integer arithmetic end to end, windows on |sources| rows. Pairs"
    " with q_sample_stratified, which consumes per-stratum counts.",
)
def q_stratified_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = s.agg(F.sum("n").cast("bigint").alias("nt"))
    quota = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.expr(f"(n * {_ALLOC_BUDGET}) div nt").alias("floor_q"),
        F.expr(f"(n * {_ALLOC_BUDGET}) % nt").alias("rem"),
    )
    # bounded windows: |sources| rows
    w_rank = Window.orderBy(F.col("rem").desc(), "source")
    w_all = Window.partitionBy()
    ranked = quota.select(
        "source",
        "n",
        "floor_q",
        F.row_number().over(w_rank).alias("rk"),
        (F.lit(_ALLOC_BUDGET) - F.sum("floor_q").over(w_all)).alias(
            "leftover"
        ),
    )
    return ranked.select(
        "source",
        "n",
        F.col("floor_q").cast("bigint").alias("floor_quota"),
        F.expr(
            "cast(floor_q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END"
            " as bigint)"
        ).alias("alloc"),
    )


# ---------------------------------------------------------------------------
# Priority sampling: weighted without-replacement per stratum (round 9)
# ---------------------------------------------------------------------------

_PRIO_K = 10
# 13 hex digits = 52 bits: exactly representable in a double, so the
# u/w division is ONE correctly-rounded IEEE op on identical inputs —
# the ordering is bit-identical across engines (ln/exp-based Gumbel or
# exponential-clock sampling is banned by the no-libm rule)
_PRIO_HEX = 13


@register(
    "q_priority_sample",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source, n_chars,
                   CAST(('0x' || substr(md5('prio'
                        || CAST(doc_id AS VARCHAR)), 1, {_PRIO_HEX}))
                        AS BIGINT) AS u
            FROM documents
            WHERE n_chars > 0
        ),
        ranked AS (
            SELECT doc_id, source, n_chars,
                   CAST(u AS DOUBLE) / CAST(n_chars AS DOUBLE)
                       AS priority,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY CAST(u AS DOUBLE)
                                / CAST(n_chars AS DOUBLE), doc_id
                   ) AS rk
            FROM d
        )
        SELECT source, doc_id, n_chars, priority
        FROM ranked WHERE rk <= {_PRIO_K}
    """,
    doc="Priority sampling (Duffield-Lund-Thorup): per source, the"
    f" {_PRIO_K} documents with smallest u/weight where u is a seeded"
    f" 52-bit md5 uniform and weight = n_chars — weighted sampling"
    " WITHOUT replacement whose inclusion probability tracks weight,"
    " reproducible across reruns and cluster layouts (no rand()), and"
    " free of transcendental noise (Gumbel/exponential clocks need"
    " ln(); the u/w division is one correctly-rounded IEEE op on a"
    " 52-bit-exact integer, so both engines order identically)."
    " Key-partitioned rank window = per-stratum top-k; at 100 TB this"
    " shape swaps to a per-partition heap + k-row merge, same"
    " semantics. Complements q_weighted_sample (with-replacement"
    " shares) and q_sample_stratified (uniform strata).",
)
def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    d = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.expr(
            f"cast(conv(substr(md5(concat('prio',"
            f" cast(doc_id as string))), 1, {_PRIO_HEX}), 16, 10)"
            " as bigint)"
        ).alias("u"),
    )
    prio = F.expr("cast(u as double) / cast(n_chars as double)")
    w = Window.partitionBy("source").orderBy(
        prio.asc(), F.col("doc_id").asc()
    )
    return (
        d.select(
            "source",
            "doc_id",
            "n_chars",
            prio.alias("priority"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= _PRIO_K)
        .select("source", "doc_id", "n_chars", "priority")
    )


# ---------------------------------------------------------------------------
# Effective sample size of weighted data (round 9)
# ---------------------------------------------------------------------------


@register(
    "q_ess_weights",
    oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_w,
               CAST(CAST(sum(n_chars) AS HUGEINT)
                    * sum(n_chars) AS DOUBLE)
                   / nullif(CAST(sum(CAST(n_chars AS HUGEINT)
                                     * n_chars) AS DOUBLE), 0e0)
                   AS ess,
               CAST(CAST(sum(n_chars) AS HUGEINT)
                    * sum(n_chars) AS DOUBLE)
                   / nullif(CAST(sum(CAST(n_chars AS HUGEINT)
                                     * n_chars) AS DOUBLE), 0e0)
                   / nullif(CAST(count(*) AS DOUBLE), 0e0)
                   AS efficiency
        FROM documents
        WHERE n_chars IS NOT NULL
        GROUP BY source
    """,
    doc="Kish effective sample size per source for char-count-weighted"
    " sampling: ESS = (sum w)^2 / sum(w^2) — how many EQUAL-weight"
    " documents the weighted corpus is worth; efficiency = ESS/n"
    " near 0 means a few huge documents dominate every estimate"
    " (q_dsir_weights / q_sample_quality_weighted consumers read"
    " this before trusting their weighted statistics). Both moments"
    " are exact integer sums in one partial agg; the ratios are"
    " mirrored IEEE divisions. Scan-shaped at any scale.",
)
def q_ess_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("sum_w"),
        F.expr(
            "cast(sum(cast(n_chars as decimal(38,0)) * n_chars)"
            " as double)"
        ).alias("sum_w2"),
    )
    ess = (
        "cast(cast(sum_w as decimal(38,0)) * sum_w as double)"
        " / nullif(sum_w2, 0e0)"
    )
    return agg.select(
        "source",
        "n",
        "sum_w",
        F.expr(f"cast({ess} as double)").alias("ess"),
        F.expr(
            f"cast({ess} / nullif(cast(n as double), 0e0) as double)"
        ).alias("efficiency"),
    )
