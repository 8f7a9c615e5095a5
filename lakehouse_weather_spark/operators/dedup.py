"""Deduplication operators (SURVEY.md §2.7 + training-data closure).

Reference anchors: whole-object sha256 dedup (``dags/bronze.py:13-22,
65-70``), page-content sha256 dedup (``dags/utils/crawl_web.py:51-59``),
URL-visited set (``crawl_web.py:114-122`` — the anti-join pattern in
``joins.py``). The near-dup family (MinHash+LSH, SimHash, n-gram
Jaccard, embedding cosine) is the standard LLM-training-data dedup
stack, expressed Spark-first:

- All hashing is a shared deterministic md5-prefix integer hash, so
  every query (including MinHash signatures and SimHash bits) is
  bit-reproducible in ANSI SQL and oracle-checked.
- Scale shape: shingle explode is narrow; the only shuffles are the
  per-doc signature groupBy and the band-bucket self-join — exactly the
  two shuffles a 100 TB MinHash dedup needs. Band-hash keys are
  high-cardinality (no skew); AQE handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.functions import duck_dot_sum, spark_dot
from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import fan_out, load_table

# ---------------------------------------------------------------------------
# Shared deterministic hashing (identical in Spark SQL and DuckDB SQL).
# md5 hex prefix (15 nibbles = 60 bits) -> BIGINT, reduced mod a Mersenne
# prime so the affine MinHash permutations never overflow int64.
# ---------------------------------------------------------------------------
P = 2_147_483_647  # 2^31 - 1
MINHASH_A = (7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67)
MINHASH_B = (3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23, 25, 27, 29, 31, 33)
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
SHINGLE_WORDS = 3

_SPARK_H = "cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
_DUCK_H = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _spark_shingles(text_col: str = "text", words: int = SHINGLE_WORDS) -> str:
    """SQL expr: word n-gram shingles of a text column."""
    w = f"split({text_col}, ' ')"
    return (
        f"transform(sequence(1, greatest(size({w}) - {words - 1}, 1)),"
        f" i -> concat_ws(' ', slice({w}, i, {words})))"
    )


def _sample_docs(docs: DataFrame, doc_cap: int) -> DataFrame:
    """Deterministic corpus sample: md5-ordered LIMIT over doc_id. The
    eval-style consumers (q_lsh_eval) pass this so their exact-truth
    arm is bounded BY CONSTRUCTION when pointed at a full-scale corpus
    — cap rows flow into shingling no matter the input size. md5 is
    engine-portable, so DuckDB oracles replay the identical sample."""
    order = F.md5(F.concat(F.lit("cap_"), F.col("doc_id").cast("string")))
    return docs.orderBy(order, "doc_id").limit(doc_cap)


def _checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage.

    Default: ``localCheckpoint`` — persist-backed, so the subtree is
    computed ONCE by the materializing job and served from block-store
    afterwards. A RELIABLE ``checkpoint`` is used only when the
    deployment explicitly points SPARK_GRAFT_CHECKPOINT_DIR at shared
    storage (HDFS/S3): it survives executor loss, which multi-hour
    iterative jobs on a real cluster need, but it costs a SECOND full
    computation of the subtree (the post-job checkpoint write re-runs
    the RDD) plus a filesystem round-trip. Measured at sf0.1 on
    local[32] that overhead dominated every checkpoint-heavy query
    (optimization guide §5 — localCheckpoint is the cheap lineage cut;
    OPTIMIZATION_r10.md has the numbers: q_dbscan_grid build 13.9 s ->
    1.8 s). For the reliable path, the persist-before-checkpoint trick
    would avoid the double compute at the cost of pinning blocks; left
    to the deployment to choose via the env var.

    ``eager=False`` (r11, guide §5): INTRA-query multi-consumer
    subtrees don't need a materialization job of their own — a lazy
    localCheckpoint is still persist-backed (computed once, by
    whichever consumer job runs first, then served from block store to
    every other consumer) but skips the extra eager job + its fixed
    scheduling overhead, which the r10 scaling data showed is the
    limiting term for the whole worst-25 at sf0.1. Substrates shared
    ACROSS queries (dedup._substrate, the kmeans/HNSW memos) stay
    eager: their contract is to hand ready DATA to later queries, and
    their build must land in the building query's window, not silently
    in the first consumer's."""
    import os

    sc = df.sparkSession.sparkContext
    if os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") and (
        sc.getCheckpointDir() is not None
    ):
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


# Shared dedup substrates per (session, key): the shingle-hash table,
# the capped inverted index, and the PPJoin per-doc token arrays are
# each consumed by SEVERAL registered queries (clusters / keep-best /
# savings / ngram-jaccard / threshold-hist / containment / purity /
# minhash verify). A production pipeline materializes these
# intermediates ONCE and fans consumers out from them; this memo is the
# in-process form of that materialized layer (checkpointed, so each
# entry is data, not a live plan). Keyed by a WEAK session reference —
# an id() key could alias a new session after the old one is collected
# — plus the logical substrate key. Checkpointing (not .persist())
# bounds lineage without pinning cache for the life of the session
# (the r5 ADVICE leak: persisted token arrays accumulated per sweep).
import weakref

_SUBSTRATE_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _substrate(spark, key, builder, table: str = "documents") -> DataFrame:
    # key[1] is the corpus dir by convention (every call site passes
    # ("name", sf_dir, *params)); folding the source table's
    # fingerprint in invalidates the memo if the corpus is rewritten
    # under the same path mid-session (round-6 ADVICE — stale
    # checkpointed snapshots). ``table`` names the fingerprinted
    # source (non-documents substrates pass theirs, e.g. "orders").
    from lakehouse_weather_spark.sources.tables import corpus_fingerprint

    key = key + (corpus_fingerprint(key[1], table),)
    per = _SUBSTRATE_MEMO.setdefault(spark, {})
    df = per.get(key)
    if df is None:
        df = _checkpoint(builder())
        per[key] = df
    return df


def _spark_shingle_hashes(
    spark, sf_dir, doc_cap: int | None = None, words: int = SHINGLE_WORDS
) -> DataFrame:
    """Distinct (doc_id, h) word-3-gram shingle hashes — the join/
    signature currency for minhash + jaccard (60-bit ints join ~5x
    faster than shingle strings and shrink the shuffle).

    Per-doc dedup happens NARROWLY via array_distinct before the
    explode — no shuffle (the old ``.distinct()`` paid a full exchange
    for rows that are already unique within each document). A small
    single-file input is also fanned out first: one parquet file = one
    input split, which would otherwise run the whole md5 stage on one
    core (on a real 100 TB input there are thousands of splits and the
    repartition is skipped)."""
    def build() -> DataFrame:
        # 8 tasks is enough to hide the md5 stage for a ~MB-scale file
        # while keeping scheduling overhead low (see tables.fan_out)
        docs = load_table(spark, sf_dir, "documents")
        if doc_cap is not None:
            docs = _sample_docs(docs, doc_cap)
        docs = fan_out(docs, "doc_id")
        # array_distinct over the shingle STRINGS keeps the per-doc
        # dedup narrow; md5->int runs AFTER the explode, on a flat
        # column, where whole-stage codegen vectorizes it (hashing
        # inside the transform lambda is evaluated interpreted, per
        # element — ~2x slower).
        shingles = F.expr(f"array_distinct({_spark_shingles(words=words)})")
        return docs.select(
            "doc_id", F.explode(shingles).alias("s")
        ).select("doc_id", F.expr(_SPARK_H.format(expr="s")).alias("h"))

    # memoized + checkpointed: ~10 registered queries consume this
    # exact table; each used to re-scan and re-hash the corpus
    return _substrate(spark, ("shingle_hashes", sf_dir, doc_cap, words), build)


def _duck_shingles_cte(src: str = "documents", words: int = SHINGLE_WORDS) -> str:
    return f"""
    sh AS (
        SELECT DISTINCT doc_id,
               CAST(('0x' || substr(md5(
                   array_to_string(words[i : i + {words - 1}], ' ')
               ), 1, 15)) AS BIGINT) AS h
        FROM (
            SELECT doc_id, string_split(text, ' ') AS words,
                   unnest(generate_series(
                       1, greatest(len(string_split(text, ' ')) - {words - 1}, 1)
                   )) AS i
            FROM {src}
        )
    )
"""



_DUCK_SHINGLES_CTE = _duck_shingles_cte()


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "q_dedup_hash",
    oracle="""
        SELECT sha256(substr(text, 1, 80)) AS content_hash,
               min(doc_id) AS keep_doc_id,
               count(*) AS dup_count
        FROM documents
        GROUP BY sha256(substr(text, 1, 80))
    """,
    doc="Exact dedup on a canonical content fingerprint (ref: bronze.py:"
    "13-22 sha256 of canonical JSON before write). Fingerprint = sha256"
    " of the 80-char prefix so the fixture's planted near-dup groups"
    " collapse; keep-policy = min doc_id (deterministic, unlike a bare"
    " dropDuplicates). Map-side partial agg -> one shuffle on the hash.",
)
def q_dedup_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.sha2(F.substring("text", 1, 80), 256)
    return docs.groupBy(h.alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )


@register(
    "q_dedup_content",
    oracle="""
        SELECT sha256(text) AS content_hash,
               min(doc_id) AS keep_doc_id,
               count(*) AS dup_count
        FROM documents
        GROUP BY sha256(text)
    """,
    doc="Exact page-content dedup (ref: crawl_web.py:51-59 sha256 of"
    " extracted text; skip if hash seen). The distributed form replaces"
    " the driver-side visited_hashes set with a hash groupBy.",
)
def q_dedup_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.sha2("text", 256).alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH near-dup candidates
# ---------------------------------------------------------------------------


def _minhash_pairs_cte(src: str = "documents") -> str:
    """CTE chain ending in ``mpairs`` = the banded-LSH candidate pairs
    (doc_a < doc_b) — shared by the q_minhash_* oracles and every
    oracle that consumes the near-dup graph (triangles, etc.)."""
    mins = ",\n               ".join(
        f"min(({a} * (h % {P}) + {b}) % {P}) AS s{k}"
        for k, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_selects = "\n        UNION ALL\n".join(
        f"        SELECT doc_id, {b} AS band_idx, "
        + " || '-' || ".join(
            f"CAST(s{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        + " AS band_hash FROM sig"
        for b in range(N_BANDS)
    )
    return f"""{_duck_shingles_cte(src)},
        sig AS (
            SELECT doc_id,
               {mins}
            FROM sh GROUP BY doc_id
        ),
        bands AS (
{band_selects}
        ),
        mpairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        )"""


def _minhash_oracle() -> str:
    return f"""
        WITH {_minhash_pairs_cte()}
        SELECT doc_a, doc_b FROM mpairs
    """


def minhash_signatures(
    spark: SparkSession,
    sf_dir: str,
    doc_cap: int | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, s0..s15) MinHash signature table — the REUSABLE dedup
    artifact. At 100 TB this is computed once per corpus snapshot and
    persisted (see :func:`write_signature_artifacts`); every subsequent
    dedup run, incremental ingest, or threshold sweep derives candidate
    pairs from the stored signatures without re-shingling the corpus.
    ``shingles`` lets a caller that ALSO consumes the raw (doc_id, h)
    table (q_lsh_eval's exact-truth arm) pass one checkpointed copy
    instead of re-shingling per consumer."""
    sh = (
        shingles
        if shingles is not None
        else _spark_shingle_hashes(spark, sf_dir, doc_cap)
    )
    x = F.col("h") % P
    mins = [
        F.min((F.lit(a) * x + F.lit(b)) % P).alias(f"s{k}")
        for k, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return sh.groupBy("doc_id").agg(*mins)


def _band_table(sig: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash) LSH bucket rows of a signature
    table: each signature explodes to N_BANDS rows keyed by the
    concatenated in-band minima."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "-",
                    *[
                        F.col(f"s{b * ROWS_PER_BAND + r}").cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("band_hash"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id", "bs.band_idx", "bs.band_hash"
    )


def _bucket_pairs(bands: DataFrame) -> DataFrame:
    """All i<j doc pairs sharing an LSH bucket, via ONE hash aggregation:
    collect each bucket's (sorted, distinct) doc ids, then a narrow
    codegen'd nested-transform explode emits the combinations. Computes
    the upstream signature pipeline ONCE — the previous self-join plan
    recomputed the whole shingle+minhash subtree on both sides (the
    broadcast build is not a ReusedExchange candidate), and measured
    ~30% slower cold at sf0.1."""
    return (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids) - i - 1),"
                    " y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
    )


def minhash_pairs_from_signatures(
    sig: DataFrame, big_bucket_cap: int | None = None
) -> DataFrame:
    """Banded-LSH candidate pairs from a signature table (stored or
    freshly derived): explode to (band_idx, band_hash) buckets, emit
    each bucket's i<j combinations (:func:`_bucket_pairs`).

    A bucket of B docs yields B(B-1)/2 pairs no matter the strategy,
    but the array path holds each bucket's id list in one aggregation
    buffer — fine for real near-dup group sizes, unbounded for
    pathological mega-buckets (a boilerplate page duplicated millions
    of times). ``big_bucket_cap`` is the 100 TB skew guard: buckets
    larger than the cap are routed through a streaming self-JOIN
    (constant memory per task, AQE skew-split applies) while everything
    else keeps the one-pass array path; the union is exactly the same
    pair set (tests/test_approx.py proves cap/no-cap equality). The
    band table is checkpointed in that mode because three plan branches
    read it."""
    bands = _band_table(sig)
    if big_bucket_cap is None:
        return _bucket_pairs(bands).distinct()
    bands = _checkpoint(bands, eager=False)
    big = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > big_bucket_cap)
        .select("band_idx", "band_hash")
    )
    small = bands.join(F.broadcast(big), ["band_idx", "band_hash"], "left_anti")
    bb = bands.join(F.broadcast(big), ["band_idx", "band_hash"], "semi")
    a, b = bb.alias("a"), bb.alias("b")
    join_pairs = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    return _bucket_pairs(small).unionByName(join_pairs).distinct()


def incremental_neardup_candidates(
    new_sig: DataFrame, base_sig: DataFrame
) -> DataFrame:
    """Candidate pairs INTRODUCED by a new ingest batch: band-join the
    new batch's signatures against (stored + new) signatures. Exactly
    the full-corpus candidate pairs that touch at least one new doc —
    at O(|new| x bucket density) cost instead of re-running the whole
    corpus self-join. This is the incremental path the persisted
    signature artifact (write_signature_artifacts) exists for: shingle
    + sign the new batch only, append, and verify just the new
    candidates."""
    nb = _band_table(new_sig)
    ab = _band_table(base_sig.unionByName(new_sig))
    joined = nb.alias("a").join(
        ab.alias("b"),
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
    )
    return (
        joined.select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
    )


def write_signature_artifacts(
    spark: SparkSession, sf_dir: str, table_dir: str
) -> str:
    """Persist the MinHash signature table as a versioned artifact
    (atomic pointer commit, see ``pipeline.atomic``) — the amortization
    lever for repeated 100 TB dedup runs. Returns the committed path."""
    from lakehouse_weather_spark.pipeline.atomic import publish_df

    return publish_df(minhash_signatures(spark, sf_dir), table_dir)


@register(
    "q_minhash_neardup",
    oracle=_minhash_oracle(),
    doc="MinHash + banded LSH near-duplicate candidate pairs (training-"
    "data closure; north-star op in SURVEY §2.7). 16 affine permutations"
    " mod 2^31-1 over word-3-gram shingles, 4 bands x 4 rows, self-join"
    " on band buckets. Two shuffles total (signature groupBy + band"
    " join); candidate verification is q_ngram_jaccard.",
)
def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_pairs_from_signatures(minhash_signatures(spark, sf_dir))


def minhash_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed banded-LSH candidate pair table, memoized per
    (session, corpus fingerprint) — the persisted near-dup pair
    artifact (see minhash_signatures' docstring: computed once per
    corpus snapshot, every consumer derives from it). Before this memo
    each of the 11 graph-family queries re-derived and re-checkpointed
    the identical pair table (~2 s each at sf0.1); the first consumer
    now pays the build and the rest read data, exactly like the
    shingle/index substrates above."""
    return _substrate(
        spark,
        ("minhash_pairs", sf_dir),
        lambda: q_minhash_neardup(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# SimHash signatures
# ---------------------------------------------------------------------------


def _simhash_oracle() -> str:
    t = _DUCK_H.format(expr="word")
    sums = ",\n               ".join(
        f"sum(CASE WHEN (({t}) >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(16)
    )
    assemble = " + ".join(f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16))
    return f"""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        ),
        bits AS (
            SELECT doc_id,
               {sums}
            FROM words GROUP BY doc_id
        )
        SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash
        FROM bits
    """


@register(
    "q_simhash",
    oracle=_simhash_oracle(),
    doc="16-bit SimHash per document (training-data closure): token-hash"
    " bit votes (+1/-1 per occurrence), sign -> bit. One narrow explode"
    " + one per-doc groupBy; near-dup = small hamming distance between"
    " signatures (checked in tests).",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    t = _SPARK_H.format(expr="word")
    sums = [
        F.sum(
            F.expr(f"CASE WHEN (shiftright({t}, {i}) & 1) = 1 THEN 1 ELSE -1 END")
        ).alias(f"b{i}")
        for i in range(16)
    ]
    bits = words.groupBy("doc_id").agg(*sums)
    assemble = sum(
        [F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(16)],
        start=F.lit(0),
    )
    return bits.select("doc_id", assemble.cast("bigint").alias("simhash"))


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard verification
# ---------------------------------------------------------------------------

# Document-frequency cap: a shingle appearing in more than DF_CAP docs is
# a stop-phrase — it carries no near-dup identity but emits O(df^2) join
# rows (one hot shingle in 1M docs => 5e11 pairs). Capping bounds the
# per-shingle pair fan-out at DF_CAP^2/2 regardless of corpus size; the
# cap applies symmetrically to intersections AND set sizes, so jaccard
# stays a true similarity over the capped shingle universe. The oracle
# applies the identical cap.
DF_CAP = 500

_DUCK_CAPPED_CTE = f"""
    hdf AS (SELECT h, count(*) AS df FROM sh GROUP BY h),
    capped AS (
        SELECT sh.doc_id, sh.h FROM sh JOIN hdf USING (h)
        WHERE hdf.df <= {DF_CAP}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM capped GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
"""


def _capped_shingle_buckets(
    spark, sf_dir, doc_cap: int | None = None, shingles: DataFrame | None = None
) -> DataFrame:
    """(h, ids) inverted index of shingle hash -> sorted doc list, with
    stop-phrase shingles (df > DF_CAP) dropped. ONE shuffle; both the
    pair stream and the per-doc set sizes derive from it narrowly, so
    the whole jaccard pipeline is 1 wide exchange + partial-agg
    groupBys — the old plan shuffled the shingle table twice more for
    a self-join."""
    def build(sh: DataFrame) -> DataFrame:
        return (
            sh.groupBy("h")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .filter(F.size("ids") <= DF_CAP)
        )

    if shingles is not None:
        # caller-supplied (already-capped) shingle stream: no memo —
        # the key would not describe the input
        return build(shingles)
    return _substrate(
        spark,
        ("capped_buckets", sf_dir, doc_cap),
        lambda: build(_spark_shingle_hashes(spark, sf_dir, doc_cap)),
    )


def _jaccard_pairs(
    spark, sf_dir, doc_cap: int | None = None, shingles: DataFrame | None = None
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs sharing >= 1 capped shingle.
    Pairs are generated inside each inverted-index bucket (ids sorted,
    so doc_a < doc_b by construction) — a narrow nested transform, not
    a self-join."""
    buckets = _capped_shingle_buckets(spark, sf_dir, doc_cap, shingles)
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) ->"
        " transform(slice(ids, i + 2, size(ids)),"
        " y -> struct(x AS doc_a, y AS doc_b))))"
    )
    inter = (
        buckets.filter(F.size("ids") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = (
        buckets.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    # no broadcast hint: sizes is one row per document — broadcastable at
    # fixture stats (planner picks BHJ), but at 1e9+ docs the planner /
    # AQE must be free to fall back to a shuffle join
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            jac.alias("jaccard"),
            # exact integer ingredients, kept for consumers that must
            # bucket/compare without double rounding (threshold hist)
            F.col("i").alias("n_inter"),
            (F.col("na") + F.col("nb") - F.col("i")).alias("n_union"),
        )
    )


def near_dup_pairs_auto(
    spark,
    sf_dir,
    t_num: int = 4,
    t_den: int = 5,
    doc_cap: int | None = None,
) -> tuple[DataFrame, str, dict]:
    """The dedup-arm selector WIRED to a consumer (round-6 VERDICT #7):
    count the corpus (one distinct-count — the cheapest statistic that
    bounds the exact arm), let ``plans.choose_dedup_arm`` pick, and run
    that arm. Returns (pairs, arm, stats).

    Both arms compute the SAME exact-jaccard >= t pair set — 'exact'
    enumerates every inverted-index bucket pair (fine under the pair
    budget, no prefix bookkeeping), 'lsh' is the PPJoin prefix-filtered
    path whose candidate set stays near-linear at corpus scale (its
    zero-lost-pairs property is oracle-certified by the cluster-family
    gates) — so the selector changes COST, never answers."""
    from lakehouse_weather_spark import plans

    docs = load_table(spark, sf_dir, "documents")
    if doc_cap is not None:
        docs = _sample_docs(docs, doc_cap)
    n_items = docs.select("doc_id").distinct().count()
    arm = plans.choose_dedup_arm(n_items)
    if arm == "exact":
        # exact-integer threshold (i * den >= u * num), never the
        # rounded double — same boundary discipline as the gate oracles
        pairs = _jaccard_pairs(spark, sf_dir, doc_cap).filter(
            F.col("n_inter") * t_den >= F.col("n_union") * t_num
        ).select("doc_a", "doc_b")
    else:
        pairs = _jaccard_pairs_high(
            spark, sf_dir, t_num, t_den, doc_cap
        ).select("doc_a", "doc_b")
    return pairs, arm, {"n_items": n_items}


def warm_dedup_substrate(spark, sf_dir) -> None:
    """Materialize the shared dedup substrates (shingle-hash table,
    capped inverted index, PPJoin token arrays) for the default corpus
    parameters. This is INGEST-side work a production dedup pipeline
    pays once per corpus snapshot and then fans every consumer out
    from; the bench warms it alongside the bucketed fact layout so the
    per-query numbers measure the queries, not the one-time substrate
    build (warm time is reported separately as warm_sec)."""
    _spark_shingle_hashes(spark, sf_dir)
    _capped_shingle_buckets(spark, sf_dir)
    _substrate(
        spark,
        ("ppjoin_arrays", sf_dir, None, SHINGLE_WORDS),
        lambda: _ppjoin_arrays_plan(spark, sf_dir, None, SHINGLE_WORDS),
    )
    # banded-LSH candidate pairs: the per-corpus-snapshot near-dup
    # artifact ~13 queries consume (graph family, curation, decontam) —
    # warmed with the other substrates so the FIRST family member's
    # bench number measures its query, not the shared build (r10
    # VERDICT: first-consumer absorption made per-query numbers
    # order-dependent; the policy is now one warmup list in bench.py)
    minhash_pairs_cached(spark, sf_dir)


def _ppjoin_arrays_plan(
    spark, sf_dir, doc_cap: int | None, words: int
) -> DataFrame:
    """(doc_id, toks sorted by (df, h), n) per-doc capped token arrays —
    the PPJoin substrate. The global (df asc, h asc) order is a pure
    function of the token, so every doc sorts consistently. Built once
    per (corpus, cap, width) via _substrate; consumers: the prefix-
    filtered pair generator (and through it the whole cluster family)
    and q_cluster_purity's direct-jaccard verifier."""
    sh = _spark_shingle_hashes(spark, sf_dir, doc_cap, words)
    hdf = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DF_CAP)
    )
    return (
        sh.join(hdf, "h")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "h"))).alias("tf"))
        .select(
            "doc_id",
            F.expr("transform(tf, x -> x.h)").alias("toks"),
            F.size("tf").alias("n"),
        )
    )


def _jaccard_pairs_high(
    spark,
    sf_dir,
    t_num: int = 4,
    t_den: int = 5,
    doc_cap: int | None = None,
    words: int = SHINGLE_WORDS,
) -> DataFrame:
    """Exact jaccard pairs >= t (= t_num/t_den) via POSITIONAL PREFIX
    FILTERING (PPJoin-style) — the scale path for high thresholds.

    The base ``_jaccard_pairs`` counts EVERY within-bucket pair (the
    candidate set is sum-of-bucket-squares and dominates at corpus
    scale). For t >= ~0.5 the prefix-filtering principle prunes almost
    all of it losslessly: order each doc's capped shingle set by a
    GLOBAL total order (df asc, hash asc — rare-first maximizes
    selectivity), keep only the first ``n - ceil(t*n) + 1`` tokens, and
    generate candidates from prefix-token collisions only. Any pair
    with jaccard >= t shares >= 1 prefix token (with the length filter
    t*max(na,nb) <= min(na,nb), the true overlap bound
    ceil(t/(1+t)(na+nb)) >= ceil(t*n) for both docs, so this prefix is
    at least as long as the lemma's n - alpha + 1). ceil is exact
    integer arithmetic ((t_num*n + t_den-1) div t_den) — a float 0.8*n
    rounds UP at n=5k and silently loses pairs. Verification is a
    narrow array_intersect over the per-doc sorted arrays (two
    broadcast-sized joins), never a re-scan.

    The brute-force DuckDB oracle on every consumer certifies the
    filter loses no pairs (same gate-proves-blocking pattern as
    q_editdist_neardup)."""
    # memoized + checkpointed (NOT .persist(): the r5 ADVICE leak) —
    # threshold-independent, so every t over the same corpus shares it
    arrays = _substrate(
        spark,
        ("ppjoin_arrays", sf_dir, doc_cap, words),
        lambda: _ppjoin_arrays_plan(spark, sf_dir, doc_cap, words),
    )
    prefix_len = F.expr(
        f"n - ((n * {t_num} + {t_den - 1}) div {t_den}) + 1"
    )
    prefix = arrays.select(
        "doc_id",
        "n",
        F.explode(F.slice("toks", F.lit(1), prefix_len)).alias("h"),
    )
    # candidates: within-bucket pairs over PREFIX tokens only, with the
    # integer length-ratio filter fused into the pair lambda
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) ->"
        " filter(transform(slice(ids, i + 2, size(ids)),"
        " y -> struct(x.doc_id AS doc_a, x.n AS na,"
        " y.doc_id AS doc_b, y.n AS nb)),"
        f" p -> p.na * {t_num} <= p.nb * {t_den}"
        f" AND p.nb * {t_num} <= p.na * {t_den})))"
    )
    cand = (
        prefix.groupBy("h")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .select("p.doc_a", "p.na", "p.doc_b", "p.nb")
        .distinct()
    )
    ta = arrays.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    tb = arrays.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    i = F.size(F.array_intersect("ta", "tb"))
    jac = i.cast("double") / (F.col("na") + F.col("nb") - i)
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("n_inter", i)
        .filter(F.col("n_inter") * t_den >= (F.col("na") + F.col("nb") - F.col("n_inter")) * t_num)
        .select(
            "doc_a",
            "doc_b",
            jac.alias("jaccard"),
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
        )
    )


@register(
    "q_ngram_jaccard",
    oracle=f"""
        WITH {_DUCK_SHINGLES_CTE},
        {_DUCK_CAPPED_CTE}
        SELECT doc_a, doc_b,
               CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.10
    """,
    doc="Exact word-3-gram Jaccard similarity for pairs sharing >= 1"
    " shingle with document frequency <= DF_CAP, threshold 0.10"
    " (training-data closure; verification stage after MinHash"
    " candidates). Pairs come from the inverted index per-bucket (sorted"
    " doc list -> nested transform), so the plan is one wide shuffle —"
    " no shingle self-join — and the df cap bounds every bucket's pair"
    " fan-out at scale.",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _jaccard_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.10)
        .select("doc_a", "doc_b", "jaccard")
    )


@register(
    "q_jaccard_threshold_hist",
    oracle=f"""
        WITH {_DUCK_SHINGLES_CTE},
        {_DUCK_CAPPED_CTE}
        SELECT CAST((10 * i) // (sa.n + sb.n - i) AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        GROUP BY 1
    """,
    doc="Jaccard threshold-tuning histogram: every candidate pair from"
    " the capped inverted index bucketed by floor(10 * jaccard) — the"
    " one-glance distribution that picks the dedup threshold (a"
    " bimodal histogram separates near-dups from topical overlap; a"
    " flat one says the shingle width is wrong) BEFORE committing to"
    " a full near-dup pass. Buckets come from the EXACT integer"
    " (10*inter) DIV union — no double rounding can flip a boundary"
    " pair (floor(0.3*10) in IEEE is 2, not 3). Same single-shuffle"
    " candidate stream as q_ngram_jaccard; output is <= 11 rows at"
    " any corpus size.",
)
def q_jaccard_threshold_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _jaccard_pairs(spark, sf_dir)
    return (
        pairs.select(
            F.expr("(10 * n_inter) DIV n_union").cast("bigint").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Near-dup cluster consolidation (connected components)
# ---------------------------------------------------------------------------

_CLUSTER_THRESHOLD = 0.8

# Materialized cluster labels per (session, input): q_dedup_keep_best /
# q_dedup_savings / q_cluster_split all consume the SAME consolidation,
# and a production pipeline computes the similarity graph ONCE and
# fans the keep-policy / split / accounting out from it. The memo is
# the in-process form of that materialized intermediate (checkpointed,
# so it is data, not lineage); every consumer is still independently
# oracle-verified end-to-end. Session-weak keying as in _SUBSTRATE_MEMO
# (the `_checkpoint` helper it uses is defined with the substrates at
# the top of this module).
_CLUSTER_LABEL_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


@register(
    "q_dedup_clusters",
    oracle=f"""
        WITH RECURSIVE {_DUCK_SHINGLES_CTE},
        {_DUCK_CAPPED_CTE},
        pairs AS (
            SELECT doc_a, doc_b
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {_CLUSTER_THRESHOLD}
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        reach(n, r) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM edges)
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON reach.n = e.b
        )
        SELECT n AS doc_id, min(r) AS cluster_rep
        FROM reach GROUP BY n
    """,
    doc="Near-duplicate cluster consolidation: connected components over"
    " the jaccard >= 0.8 similarity graph via iterative min-label"
    " propagation (driver loop of joins until fixpoint — diameter-bounded;"
    " labels checkpoint each round to cut lineage)."
    " The keep-policy is then one doc per cluster_rep. Oracle replays"
    " the same closure with a recursive CTE.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_session = _CLUSTER_LABEL_MEMO.setdefault(spark, {})
    memo = per_session.get(sf_dir)
    if memo is not None:
        return memo
    # prefix-filtered exact-jaccard candidates (lossless at t=0.8; the
    # brute-force oracle certifies it) — the candidate set is prefix
    # collisions only, not sum-of-bucket-squares
    pairs = _jaccard_pairs_high(spark, sf_dir, 4, 5).select("doc_a", "doc_b")
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    # materialize the similarity graph once; otherwise every iteration's
    # join re-derives the full shingle/jaccard pipeline
    labels = label_propagate(_checkpoint(edges, eager=False))
    out = labels.select("doc_id", F.col("label").alias("cluster_rep"))
    # checkpoint the bounded label table so the memo hands every later
    # consumer data, not a live plan into this call's lineage
    # (eager=False: the first consumer materializes the blocks; the
    # propagation loop's convergence collects have already run by then)
    out = _checkpoint(out, eager=False)
    per_session[sf_dir] = out
    return out


def label_propagate(edges: DataFrame, seed: DataFrame | None = None) -> DataFrame:
    """Min-label propagation to fixpoint over a BIDIRECTIONAL edge set
    (doc_a, doc_b); returns (doc_id, label). ``seed`` optionally
    provides starting labels (doc_id, label) — nodes absent from it
    start at their own id. Callers should checkpoint ``edges`` first if
    it derives from an expensive pipeline."""
    if seed is None:
        # FUSED ROUND 1: with identity starting labels, the first
        # propagation round reduces to label(x) = min(x, min N(x)) —
        # one groupBy over the edge list, no label join. Saves a full
        # join+agg round (and its convergence job) every call; the
        # typical near-dup component converges in 2-3 rounds total.
        labels = (
            edges.groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("doc_b").alias("nbr_min"))
            .select(
                "doc_id",
                F.least(F.col("doc_id"), F.col("nbr_min")).alias("label"),
            )
        )
    else:
        labels = (
            edges.select(F.col("doc_a").alias("doc_id"))
            .distinct()
            .withColumn("label", F.col("doc_id"))
            .join(seed.withColumnRenamed("label", "seed_label"),
                  "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("seed_label", "label").alias("label"),
            )
        )
    prev_persisted = None
    for rnd in range(20):  # diameter bound; fixpoint usually in 2-3 rounds
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry the old label alongside the new one: the convergence
        # check is then a single agg over this frame — no third join
        # and no separate scan per round
        new_labels = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("old_label"),
            )
        )
        # cut lineage every 3rd round: edges below is already
        # checkpointed, so between cuts the plan grows by at most three
        # shallow join rounds (each materialized by its convergence agg)
        if rnd % 3 == 2:
            # eager=False: the convergence collect right below
            # materializes the blocks anyway; eager paid a second job
            new_labels = _checkpoint(new_labels, eager=False)
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.agg(
                F.sum((F.col("label") != F.col("old_label")).cast("int")).alias("c")
            ).collect()[0]["c"]
        )
        if prev_persisted is not None:
            prev_persisted.unpersist(blocking=False)
        prev_persisted = new_labels if new_labels.is_cached else None
        labels = new_labels.select("doc_id", "label")
        if not changed:
            break
    return labels


@register(
    "q_dedup_keep_best",
    oracle=f"""
        WITH RECURSIVE {_DUCK_SHINGLES_CTE},
        {_DUCK_CAPPED_CTE},
        pairs AS (
            SELECT doc_a, doc_b FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {_CLUSTER_THRESHOLD}
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach(n, r) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM edges)
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON reach.n = e.b
        ),
        clusters AS (
            SELECT n AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY n
        )
        SELECT c.cluster_rep,
               arg_max(d.doc_id, d.n_chars * 10000000 - d.doc_id) AS keep_doc_id,
               max(d.n_chars) AS keep_n_chars,
               count(*) AS cluster_size
        FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
        GROUP BY c.cluster_rep
    """,
    doc="Dedup keep-policy: within each near-dup cluster keep the"
    " longest document (min doc_id tiebreak) — the final survivor"
    " selection of the dedup pipeline (clusters -> one kept doc each)."
    " max_by over n_chars*1e7 - doc_id makes ties deterministic"
    " (longest wins; equal length -> smallest doc_id).",
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = q_dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = clusters.join(docs, "doc_id")
    pref = F.col("n_chars") * 10_000_000 - F.col("doc_id")
    return joined.groupBy("cluster_rep").agg(
        F.max_by("doc_id", pref).alias("keep_doc_id"),
        F.max("n_chars").alias("keep_n_chars"),
        F.count(F.lit(1)).alias("cluster_size"),
    )


_DUCK_CLUSTERS_CTE = f"""
        pairs AS (
            SELECT doc_a, doc_b FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {_CLUSTER_THRESHOLD}
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach(n, r) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM edges)
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON reach.n = e.b
        ),
        clusters AS (
            SELECT n AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY n
        )"""


@register(
    "q_dedup_cross_source",
    oracle=f"""
        WITH RECURSIVE {_DUCK_SHINGLES_CTE},
        {_DUCK_CAPPED_CTE},
        {_DUCK_CLUSTERS_CTE}
        SELECT c.cluster_rep,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
               count(DISTINCT d.source) > 1 AS cross_source,
               arg_max(d.doc_id, d.n_chars * 10000000 - d.doc_id)
                   AS keep_doc_id,
               arg_max(d.source, d.n_chars * 10000000 - d.doc_id)
                   AS keep_source
        FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
        GROUP BY c.cluster_rep
    """,
    doc="Provenance-aware dedup policy: per near-dup cluster, how many"
    " SOURCES its members span and which source survives under the"
    " keep-longest policy — the audit that tells a corpus curator"
    " whether near-dups are intra-source boilerplate (dedup freely)"
    " or cross-source syndication (dropping them shifts the source"
    " mixture, so the mixture weights must be recomputed after dedup"
    " — the interaction q_mixture_plan otherwise misses). Reuses the"
    " memoized cluster labels (q_dedup_clusters) + one broadcast-"
    "friendly dim join; keep tie-breaks are exact integers, so the"
    " winning source hash-matches.",
)
def q_dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = q_dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    joined = clusters.join(docs, "doc_id")
    pref = F.col("n_chars") * 10_000_000 - F.col("doc_id")
    return joined.groupBy("cluster_rep").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        (F.countDistinct("source") > 1).alias("cross_source"),
        F.max_by("doc_id", pref).alias("keep_doc_id"),
        F.max_by("source", pref).alias("keep_source"),
    )


@register(
    "q_doc_dedup_report",
    oracle=f"""
        WITH RECURSIVE {_DUCK_SHINGLES_CTE},
        {_DUCK_CAPPED_CTE},
        {_DUCK_CLUSTERS_CTE},
        exact AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT sha256(substr(text, 1, 80)))
                        AS BIGINT) AS n_exact_groups
            FROM documents
        ),
        near AS (
            SELECT CAST(count(*) AS BIGINT) AS n_clustered_docs,
                   CAST(count(DISTINCT c.cluster_rep) AS BIGINT)
                       AS n_clusters,
                   CAST(sum(d.n_chars) AS BIGINT) AS clustered_chars
            FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
        ),
        kept AS (
            SELECT CAST(sum(mx) AS BIGINT) AS kept_chars FROM (
                SELECT max(d.n_chars) AS mx
                FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
                GROUP BY c.cluster_rep
            )
        )
        SELECT e.n_docs,
               e.n_docs - e.n_exact_groups AS n_exact_redundant,
               n.n_clusters, n.n_clustered_docs,
               n.n_clustered_docs - n.n_clusters AS n_near_redundant,
               n.clustered_chars - k.kept_chars AS chars_saved
        FROM exact e, near n, kept k
    """,
    doc="One-row dedup accounting flagship: corpus size, exact-"
    "duplicate redundancy (docs minus distinct 80-char-prefix"
    " hashes), near-dup cluster count / membership / redundancy, and"
    " the character volume reclaimed by keep-longest — the single"
    " table a data-budget review reads before signing off the dedup"
    " stage (every ingredient is separately gate-verified:"
    " q_dedup_hash, q_dedup_clusters, q_dedup_keep_best). Reuses the"
    " memoized cluster labels, adds two partial-agg scans; all"
    " integers, bit-exact.",
)
def q_doc_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    exact = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct(F.sha2(F.substring("text", 1, 80), 256))
        .cast("bigint")
        .alias("n_exact_groups"),
    )
    clustered = q_dedup_clusters(spark, sf_dir).join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    near = clustered.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clustered_docs"),
        F.countDistinct("cluster_rep").cast("bigint").alias("n_clusters"),
        F.sum("n_chars").cast("bigint").alias("clustered_chars"),
    )
    kept = (
        clustered.groupBy("cluster_rep")
        .agg(F.max("n_chars").alias("mx"))
        .agg(F.sum("mx").cast("bigint").alias("kept_chars"))
    )
    return (
        exact.crossJoin(F.broadcast(near))
        .crossJoin(F.broadcast(kept))
        .select(
            "n_docs",
            (F.col("n_docs") - F.col("n_exact_groups")).alias(
                "n_exact_redundant"
            ),
            "n_clusters",
            "n_clustered_docs",
            (F.col("n_clustered_docs") - F.col("n_clusters")).alias(
                "n_near_redundant"
            ),
            (F.col("clustered_chars") - F.col("kept_chars")).alias(
                "chars_saved"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

# Exact fixed-point dot product of two float arrays (see functions.py
# for why fixed-point accumulation is required for engine parity).
_SPARK_DOT = spark_dot("{a}", "{b}")

_DUCK_VEC_CTE = f"""
    u AS (
        SELECT vec_id, embedding,
               unnest(generate_series(1, len(embedding))) AS pos
        FROM embeddings
    ),
    vals AS (
        SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS val FROM u
    ),
    norms AS (
        SELECT vec_id,
               sqrt({duck_dot_sum('val', 'val')}) AS nrm
        FROM vals GROUP BY vec_id
    )
"""


@register(
    "q_embed_neardup",
    oracle=f"""
        WITH {_DUCK_VEC_CTE},
        dots AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   {duck_dot_sum('a.val', 'b.val')} AS dot
            FROM vals a JOIN vals b ON a.pos = b.pos AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        )
        SELECT vec_a, vec_b, dot / (na.nrm * nb.nrm) AS cosine
        FROM dots
        JOIN norms na ON vec_a = na.vec_id
        JOIN norms nb ON vec_b = nb.vec_id
        WHERE dot / (na.nrm * nb.nrm) >= 0.4
    """,
    doc="Embedding-cosine near-duplicate pairs (threshold 0.4), exact"
    " brute force as a BLOCKED all-pairs matrix product: vectors hash"
    " into N_BLOCKS blocks; each of the N*(N+1)/2 block pairs is scored"
    " independently by a vectorized numpy kernel inside cogrouped"
    " applyInPandas (~100x the interpreted zip_with lambda path)."
    " Nothing ever materializes on the driver — the shuffle replicates"
    " each vector N_BLOCKS times and every task holds only two blocks"
    " (choose N_BLOCKS so 2*n/N_BLOCKS vectors fit an executor)."
    " Fixed-point rounding (see functions.py) reproduces the JVM/oracle"
    " dot products bit-exactly. At 100 TB the same kernel scores"
    " LSH-bucket-local candidates instead of all block pairs.",
)
def q_embed_neardup(
    spark: SparkSession, sf_dir: str, vec_cap: int | None = None
) -> DataFrame:
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from lakehouse_weather_spark.functions import DOT_SCALE

    n_blocks = 8
    threshold = 0.4

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if vec_cap is not None:
        # deterministic md5-ordered cap (the shingle pipeline's
        # _sample_docs idiom): the exact O(n^2) arm is then safe to
        # point at a full-scale corpus BY CONSTRUCTION — at most
        # vec_cap vectors enter the block-pair fan-out no matter the
        # input size. Default off: the registered query stays the
        # exact whole-corpus baseline beside the LSH/SemDeDup scale
        # arms (oracle unchanged).
        order = F.md5(F.concat(F.lit("cap_"), F.col("vec_id").cast("string")))
        emb = emb.orderBy(order, "vec_id").limit(vec_cap)
    # every vector joins each block pair (bi, bj) that contains its own
    # block: B replicas per vector, B*(B+1)/2 independent score tasks
    blk = F.pmod(F.hash("vec_id"), F.lit(n_blocks))
    rep = (
        emb.withColumn("blk", blk)
        .withColumn("other", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))))
        .select(
            "vec_id",
            "embedding",
            "blk",
            F.least("blk", "other").alias("bi"),
            F.greatest("blk", "other").alias("bj"),
        )
    )

    def _fxround(x: np.ndarray) -> np.ndarray:
        # half-away-from-zero, matching Spark round() and DuckDB round()
        return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)

    def _norms(mat: np.ndarray) -> np.ndarray:
        ints = _fxround((mat * mat) * DOT_SCALE).sum(axis=1)
        return np.sqrt(ints.astype(np.float64) / DOT_SCALE)

    schema = StructType(
        [
            StructField("vec_a", LongType()),
            StructField("vec_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def score_block_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
            {"vec_a": np.int64, "vec_b": np.int64, "cosine": np.float64}
        )
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        left = pdf[pdf["blk"] == bi]
        right = pdf[pdf["blk"] == bj] if bi != bj else left
        if len(left) == 0 or len(right) == 0:
            return empty
        a_ids = left["vec_id"].to_numpy(dtype=np.int64)
        b_ids = right["vec_id"].to_numpy(dtype=np.int64)
        A = np.stack(left["embedding"].map(np.asarray)).astype(np.float64)
        B = (
            np.stack(right["embedding"].map(np.asarray)).astype(np.float64)
            if bi != bj
            else A
        )
        a_nrm, b_nrm = _norms(A), _norms(B)
        # phase 1 — BLAS scan: float dots differ from the fixed-point
        # truth by < 64 * 0.5/DOT_SCALE, so a 1e-6 guard band cannot
        # miss a true candidate. Each unordered pair lives in exactly
        # one block pair: same-block pairs dedupe via the strict upper
        # triangle; cross-block pairs are all valid and are oriented
        # afterwards (the smaller id may sit in either block).
        cos_fast = (A @ B.T) / (a_nrm[:, None] * b_nrm[None, :])
        if bi == bj:
            pair_mask = a_ids[:, None] < b_ids[None, :]
        else:
            pair_mask = np.ones((len(a_ids), len(b_ids)), dtype=bool)
        ai, bix = np.nonzero(pair_mask & (cos_fast >= threshold - 1e-6))
        # phase 2 — exact fixed-point re-score of the few candidates
        prods = A[ai] * B[bix]
        dots = _fxround(prods * DOT_SCALE).sum(axis=1)
        cos = dots.astype(np.float64) / DOT_SCALE / (a_nrm[ai] * b_nrm[bix])
        keep = cos >= threshold
        ka, kb = a_ids[ai[keep]], b_ids[bix[keep]]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ka, kb),
                "vec_b": np.maximum(ka, kb),
                "cosine": cos[keep],
            }
        )

    return rep.groupBy("bi", "bj").applyInPandas(score_block_pair, schema=schema)


# ---------------------------------------------------------------------------
# Sub-document (paragraph-level) dedup
# ---------------------------------------------------------------------------

PARA_WORDS = 40


@register(
    "q_dedup_paragraphs",
    oracle=f"""
        WITH paras AS (
            SELECT doc_id,
                   CAST(i AS BIGINT) AS para_idx,
                   array_to_string(
                       words[(i * {PARA_WORDS} + 1) : ((i + 1) * {PARA_WORDS})], ' '
                   ) AS para
            FROM (
                SELECT doc_id, string_split(text, ' ') AS words,
                       unnest(generate_series(
                           0, CAST(ceil(len(string_split(text, ' '))
                                        / {PARA_WORDS}.0) AS BIGINT) - 1
                       )) AS i
                FROM documents
            )
        )
        SELECT sha256(para) AS para_hash,
               count(*) AS n_copies,
               min(doc_id * 1000000 + para_idx) AS keep_key
        FROM paras
        GROUP BY sha256(para)
        HAVING count(*) > 1
    """,
    doc="Sub-document (paragraph-level) exact dedup — the standard"
    " training-corpus pass that document-level dedup misses (boiler-"
    "plate paragraphs repeated across distinct pages). Documents split"
    f" into {PARA_WORDS}-word paragraphs narrowly (explode, no"
    " shuffle), hashed, one groupBy on the hash; keep-policy = lowest"
    " (doc_id, para_idx). At 100 TB this is one shuffle over the"
    " paragraph hashes with map-side partials.",
)
def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # file count as the split-count proxy (same contract as
    # tables.fan_out); df.rdd.getNumPartitions() forced a full
    # plan->RDD physical compile just to read a partition count
    par = min(spark.sparkContext.defaultParallelism, 8)
    if len(docs.inputFiles()) < par:
        docs = docs.repartition(par, "doc_id")
    w = "split(text, ' ')"
    paras = F.expr(
        f"transform(sequence(0, cast(ceil(size({w}) / {PARA_WORDS}.0) as int) - 1),"
        f" i -> struct(cast(i as bigint) AS para_idx,"
        f" concat_ws(' ', slice({w}, i * {PARA_WORDS} + 1, {PARA_WORDS})) AS para))"
    )
    exploded = docs.select("doc_id", F.explode(paras).alias("p")).select(
        "doc_id", "p.para_idx", "p.para"
    )
    return (
        exploded.groupBy(F.sha2("para", 256).alias("para_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.col("doc_id") * 1_000_000 + F.col("para_idx")).alias("keep_key"),
        )
        .filter(F.col("n_copies") > 1)
    )


def update_clusters(labels: DataFrame, new_pairs: DataFrame) -> DataFrame:
    """Incremental cluster maintenance: merge newly-discovered near-dup
    pairs into a STORED clustering without re-running connected
    components over the corpus.

    ``labels``: (doc_id, cluster_rep) — the persisted clustering
    artifact (q_dedup_clusters output). ``new_pairs``: (doc_a, doc_b) —
    e.g. :func:`incremental_neardup_candidates` output verified for a
    fresh ingest batch (may connect new docs to old, new to new, or
    previously-separate old clusters).

    Scale shape: every new pair LIFTS to an edge between its endpoints'
    cluster reps (docs unknown to ``labels`` rep as themselves);
    min-label propagation runs on that QUOTIENT graph — bounded by the
    new batch size, not the corpus — and one join-back rewrites the
    affected reps. Because stored reps are the minima of their old
    components, the quotient minimum equals the full-recompute minimum,
    so the result is IDENTICAL to rerunning CC on all edges (asserted
    in tests/test_incremental.py)."""
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_rep").alias("ra")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_rep").alias("rb")
    )
    lifted = (
        new_pairs.join(la, "doc_a", "left")
        .join(lb, "doc_b", "left")
        .select(
            F.coalesce("ra", F.col("doc_a")).alias("doc_a"),
            F.coalesce("rb", F.col("doc_b")).alias("doc_b"),
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )
    rep_edges = lifted.unionByName(
        lifted.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    resolved = label_propagate(rep_edges).withColumnRenamed(
        "doc_id", "old_rep"
    )
    new_docs = (
        new_pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(new_pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .join(labels.select("doc_id"), "doc_id", "left_anti")
        .withColumn("cluster_rep", F.col("doc_id"))
    )
    base = labels.unionByName(new_docs)
    return base.join(
        resolved, base.cluster_rep == resolved.old_rep, "left"
    ).select(
        "doc_id",
        F.coalesce(resolved.label, base.cluster_rep).alias("cluster_rep"),
    )


def _minhash_matches_expr() -> str:
    return " + ".join(
        f"CASE WHEN a.s{k} = b.s{k} THEN 1 ELSE 0 END"
        for k in range(N_HASHES)
    )


def _minhash_cand_scaffold() -> str:
    """Shared WITH-chain for the signature-audit oracles: shingles ->
    per-doc MinHash signature -> banded candidates -> exact set sizes
    and candidate-only intersections."""
    mins = ",\n               ".join(
        f"min(({a} * (h % {P}) + {b}) % {P}) AS s{k}"
        for k, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_selects = "\n        UNION ALL\n".join(
        f"        SELECT doc_id, {b} AS band_idx, "
        + " || '-' || ".join(
            f"CAST(s{b * ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(ROWS_PER_BAND)
        )
        + " AS band_hash FROM sig"
        for b in range(N_BANDS)
    )
    return f"""{_DUCK_SHINGLES_CTE},
        sig AS (
            SELECT doc_id,
               {mins}
            FROM sh GROUP BY doc_id
        ),
        bands AS (
{band_selects}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS i
            FROM cand c
            JOIN sh x ON x.doc_id = c.doc_a
            JOIN sh y ON y.doc_id = c.doc_b AND y.h = x.h
            GROUP BY c.doc_a, c.doc_b
        )"""


def _minhash_estimate_oracle() -> str:
    matches = _minhash_matches_expr()
    return f"""
        WITH {_minhash_cand_scaffold()}
        SELECT c.doc_a, c.doc_b,
               CAST(({matches}) AS BIGINT) AS n_matching,
               CAST(({matches}) AS DOUBLE) / {N_HASHES} AS jaccard_est,
               CAST(coalesce(i.i, 0) AS DOUBLE)
                   / (sa.n + sb.n - coalesce(i.i, 0)) AS jaccard_exact
        FROM cand c
        JOIN sig a ON a.doc_id = c.doc_a
        JOIN sig b ON b.doc_id = c.doc_b
        LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        JOIN sizes sa ON sa.doc_id = c.doc_a
        JOIN sizes sb ON sb.doc_id = c.doc_b
    """


@register(
    "q_minhash_estimate",
    oracle=_minhash_estimate_oracle(),
    doc=f"MinHash estimator audit: for every LSH candidate pair, the"
    f" signature-based Jaccard estimate (matching minima / {N_HASHES})"
    " NEXT TO the exact shingle-set Jaccard — the number that justifies"
    " trusting stored signatures instead of re-shingling the corpus."
    " The estimate needs only the kilobyte signature artifact; the"
    " exact value joins shingles for candidates alone (no all-pairs)."
    " Both are integer-derived, so estimate AND truth oracle-match.",
)
def q_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_signatures(spark, sf_dir)
    # the shared checkpointed pair substrate (identical derivation):
    # this query's plan consumes the pair table twice, and re-deriving
    # the band join per consumer re-ran two shuffles each time
    cand = minhash_pairs_cached(spark, sf_dir)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"s{k}").alias(f"a{k}") for k in range(N_HASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"s{k}").alias(f"b{k}") for k in range(N_HASHES)],
    )
    n_matching = sum(
        (
            F.when(F.col(f"a{k}") == F.col(f"b{k}"), 1).otherwise(0)
            for k in range(N_HASHES)
        ),
        F.lit(0),
    ).cast("bigint")
    # exact jaccard for candidates ONLY: restrict the shingle join to
    # the candidate pair set — no all-pairs fan-out
    sh = _spark_shingle_hashes(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    xa = sh.select(F.col("doc_id").alias("doc_a"), "h")
    xb = sh.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        cand.join(xa, "doc_a")
        .join(xb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    i0 = F.coalesce(F.col("i"), F.lit(0).cast("bigint"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_matching.alias("n_matching"),
            (n_matching.cast("double") / N_HASHES).alias("jaccard_est"),
            (
                i0.cast("double") / (F.col("na") + F.col("nb") - i0)
            ).alias("jaccard_exact"),
        )
    )


@register(
    "q_dedup_savings",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   sha256(substr(text, 1, 80)) AS h,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        grp AS (
            SELECT h,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   CAST(min(doc_id) AS BIGINT) AS keep_doc_id
            FROM toks GROUP BY h
        ),
        kept AS (
            SELECT g.h, g.n_docs, g.total_tokens, g.keep_doc_id,
                   t.n_tokens AS kept_tokens
            FROM grp g JOIN toks t
              ON t.doc_id = g.keep_doc_id AND t.h = g.h
        )
        SELECT h AS content_hash, n_docs, keep_doc_id,
               total_tokens - kept_tokens AS wasted_tokens
        FROM kept
        WHERE n_docs > 1
        ORDER BY wasted_tokens DESC, content_hash
        LIMIT 20
    """,
    doc="Dedup savings report: for each duplicate-content group, the"
    " token volume RECLAIMED by keeping only the min-doc_id survivor —"
    " the number that justifies the dedup stage's cost in a training-"
    "data budget review. One hash groupBy + a keeper join-back;"
    " top-20 by waste via TakeOrdered. All integer counts,"
    " oracle-exact.",
)
def q_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.sha2(F.substring("text", 1, 80), 256).alias("h"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    grp = toks.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").cast("bigint").alias("keep_doc_id"),
    )
    keeper = toks.select(
        F.col("doc_id").alias("keep_doc_id"),
        F.col("h"),
        F.col("n_tokens").alias("kept_tokens"),
    )
    return (
        grp.join(keeper, ["keep_doc_id", "h"])
        .filter(F.col("n_docs") > 1)
        .select(
            F.col("h").alias("content_hash"),
            "n_docs",
            "keep_doc_id",
            (F.col("total_tokens") - F.col("kept_tokens")).alias(
                "wasted_tokens"
            ),
        )
        .orderBy(F.desc("wasted_tokens"), F.asc("content_hash"))
        .limit(20)
    )


SIMHASH_HAMMING_MAX = 1  # report pairs within this hamming distance
# The near-dup query signs a WIDE signature: 60 bits (the full width
# of the 15-hex-digit md5 word hash), split into 2 pigeonhole blocks
# of 30 bits. Block-value cardinality is what bounds the candidate
# join: with b block bits, random collisions contribute ~n^2/2^b
# candidate pairs. The original 16-bit signature (2 x 8-bit blocks,
# 256 values) measured slope 1.57 on the sf1->sf10 decade - buckets
# grow linearly with n, candidates quadratically - and at 16 bits
# most "near-dup" pairs were random hamming<=1 collisions anyway
# (P ~ 17/65536 per pair). At 30-bit blocks the expected random
# candidate count is n^2/2^30: ~2e2 at sf10 (500k docs), so the join
# output tracks the TRUE duplicate count, which the corpus bounds.
# q_simhash (the 16-bit per-doc signature surface) is unchanged.
_SIMHASH_NEARDUP_BITS = 60
_SIMHASH_BLOCKS = SIMHASH_HAMMING_MAX + 1  # pigeonhole blocks (2 x 30 bits)
_SIMHASH_BLOCK_BITS = _SIMHASH_NEARDUP_BITS // _SIMHASH_BLOCKS


@register(
    "q_simhash_neardup",
    oracle=f"""
        WITH words AS (
            SELECT doc_id,
                   {_DUCK_H.format(expr="unnest(string_split(text, ' '))")}
                       AS h
            FROM documents
        ),
        bits AS (
            SELECT doc_id,
               {",               ".join(
                   f"sum(CASE WHEN (h >> {i}) & 1 = 1"
                   f" THEN 1 ELSE -1 END) AS b{i}"
                   for i in range(_SIMHASH_NEARDUP_BITS)
               )}
            FROM words GROUP BY doc_id
        ),
        codes AS (
            SELECT doc_id,
                   CAST({" + ".join(
                       f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)"
                       for i in range(_SIMHASH_NEARDUP_BITS)
                   )} AS BIGINT) AS simhash
            FROM bits
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                   AS hamming
        FROM codes a JOIN codes b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAMMING_MAX}
    """,
    doc=f"SimHash near-dup pairs (Manku et al., WWW'07):"
    f" {_SIMHASH_NEARDUP_BITS}-bit signatures split into"
    f" {_SIMHASH_BLOCKS} pigeonhole blocks of {_SIMHASH_BLOCK_BITS}"
    f" bits; any pair within hamming {SIMHASH_HAMMING_MAX} shares at"
    " least one identical block, so candidates come from ONE"
    " equi-join on (block index, block value) and the exact"
    " bit_count(xor) verify is narrow - no all-pairs scan. Block"
    " width is the scale contract: random collisions add only"
    " ~n^2/2^30 candidates, so the candidate set tracks the true"
    " duplicate count (the 16-bit variant measured slope 1.57 over"
    " sf1->sf10; this shape restored linearity). The oracle IS the"
    " brute-force all-pairs hamming join, so a gate pass proves the"
    " block scheme loses no pair.",
)
def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # project the 60-bit word hash ONCE; the 60 bit-vote sums below
    # all shift this single column (recomputing md5 per bit would
    # multiply the scan cost 60x)
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).select(
        "doc_id", F.expr(_SPARK_H.format(expr="word")).alias("h")
    )
    sums = [
        F.sum(
            F.expr(
                f"CASE WHEN (shiftright(h, {i}) & 1) = 1"
                " THEN 1 ELSE -1 END"
            )
        ).alias(f"b{i}")
        for i in range(_SIMHASH_NEARDUP_BITS)
    ]
    bits = words.groupBy("doc_id").agg(*sums)
    assemble = sum(
        [
            F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(_SIMHASH_NEARDUP_BITS)
        ],
        start=F.lit(0),
    )
    codes = bits.select(
        "doc_id", assemble.cast("bigint").alias("simhash")
    )
    blocks = codes.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.expr(
                            f"(simhash >> {i * _SIMHASH_BLOCK_BITS})"
                            f" & {(1 << _SIMHASH_BLOCK_BITS) - 1}"
                        ).alias("bv"),
                    )
                    for i in range(_SIMHASH_BLOCKS)
                ]
            )
        ).alias("g"),
    ).select(
        "doc_id", "simhash", F.col("g.i").alias("i"), F.col("g.bv").alias("bv")
    )
    right = blocks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
        F.col("i").alias("i2"),
        F.col("bv").alias("bv2"),
    )
    cands = (
        blocks.join(
            right,
            (blocks.i == right.i2)
            & (blocks.bv == right.bv2)
            & (blocks.doc_id < right.doc_b),
        )
        .select(
            F.col("doc_id").alias("doc_a"),
            "doc_b",
            F.col("simhash").alias("sim_a"),
            "sim_b",
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.expr("bit_count(sim_a ^ sim_b)").cast("int")
    return cands.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)


# ---------------------------------------------------------------------------
# ExactSubstr-style duplicated-span detection
# ---------------------------------------------------------------------------

SPAN_WORDS = 5  # repeated-window width (words)


@register(
    "q_dup_spans",
    oracle=f"""
        WITH pos AS (
            -- n_words MUST come from the subquery: referencing text here
            -- would bind to the final SELECT's documents row and turn
            -- the whole CTE chain into a correlated re-evaluation per
            -- document (quadratic; ~74 s at sf0.001, hours at sf0.1)
            SELECT doc_id, n_words, i,
                   {_DUCK_H.format(
                       expr=f"array_to_string(words[i : i + {SPAN_WORDS - 1}], ' ')"
                   )} AS h
            FROM (
                SELECT doc_id, string_split(text, ' ') AS words,
                       len(string_split(text, ' ')) AS n_words,
                       unnest(generate_series(
                           1, len(string_split(text, ' ')) - {SPAN_WORDS - 1}
                       )) AS i
                FROM documents
                WHERE len(string_split(text, ' ')) >= {SPAN_WORDS}
            )
        ),
        hot AS (
            SELECT h FROM pos GROUP BY h HAVING count(*) >= 2
        ),
        dup AS (
            SELECT p.doc_id, p.n_words, p.i AS s,
                   p.i + {SPAN_WORDS - 1} AS e
            FROM pos p JOIN hot USING (h)
        ),
        flagged AS (
            SELECT doc_id, n_words, s, e,
                   CASE WHEN s > max(e) OVER (
                       PARTITION BY doc_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) THEN 1 ELSE 0 END AS new_island
            FROM dup
        ),
        islands AS (
            SELECT doc_id, n_words, s, e,
                   sum(new_island) OVER (
                       PARTITION BY doc_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island_id
            FROM flagged
        ),
        merged AS (
            SELECT doc_id, n_words, island_id,
                   min(s) AS s, max(e) AS e
            FROM islands GROUP BY doc_id, n_words, island_id
        ),
        per_doc AS (
            SELECT doc_id, n_words,
                   CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(sum(e - s + 1) AS BIGINT) AS covered_words
            FROM merged GROUP BY doc_id, n_words
        )
        SELECT d.doc_id,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
               CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(COALESCE(p.covered_words, 0) AS BIGINT) AS covered_words,
               CAST(COALESCE(p.covered_words, 0) AS DOUBLE)
                   / len(string_split(d.text, ' ')) AS dup_frac
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    doc=f"ExactSubstr-style duplicated-span detection (Lee et al. 2022,"
    " 'Deduplicating Training Data Makes Language Models Better'):"
    f" every {SPAN_WORDS}-word window whose hash occurs >= 2 times"
    " ANYWHERE in the corpus (other docs or elsewhere in the same doc)"
    " marks its span; overlapping marked spans merge per doc via the"
    " gaps-and-islands running-max window, yielding the merged span"
    " count, covered-word total, and duplicated fraction per document"
    " — the signal used to CUT repeated passages out of training text"
    " rather than drop whole near-dup docs. Narrow positional explode"
    " + one hash groupBy + one per-doc window: the suffix-array"
    " construction of the paper re-expressed as fixed-width-window"
    " hashing (complete for repeats >= the window; spans shorter than"
    f" {SPAN_WORDS} words are below the dedup threshold by design).",
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.split("text", " ")
    base = docs.select("doc_id", w.alias("words"), F.size(w).alias("n_words"))
    pos = (
        base.filter(F.col("n_words") >= SPAN_WORDS)
        .select(
            "doc_id",
            "n_words",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(words) - {SPAN_WORDS - 1}),"
                    f" i -> struct(i, concat_ws(' ', slice(words, i, {SPAN_WORDS}))"
                    " AS g))"
                )
            ).alias("p"),
        )
        .select(
            "doc_id",
            "n_words",
            F.col("p.i").alias("s"),
            (F.col("p.i") + (SPAN_WORDS - 1)).alias("e"),
            F.expr(_SPARK_H.format(expr="p.g")).alias("h"),
        )
    )
    hot = pos.groupBy("h").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") >= 2
    )
    dup = pos.join(hot.select("h"), "h")
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    running = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = dup.withColumn(
        "new_island",
        F.when(F.col("s") > F.max("e").over(prev), 1).otherwise(0),
    )
    islands = flagged.withColumn("island_id", F.sum("new_island").over(running))
    merged = islands.groupBy("doc_id", "n_words", "island_id").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    per_doc = merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("covered_words"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("covered_words", F.lit(0))
            .cast("bigint")
            .alias("covered_words"),
            (
                F.coalesce("covered_words", F.lit(0)).cast("double")
                / F.col("n_words")
            ).alias("dup_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Banding S-curve audit: candidate-pair distribution over the estimate
# ---------------------------------------------------------------------------


def _scurve_oracle() -> str:
    mins = ",\n               ".join(
        f"min(({a} * (h % {P}) + {b}) % {P}) AS s{k}"
        for k, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_selects = "\n        UNION ALL\n".join(
        f"        SELECT doc_id, {b} AS band_idx, "
        + " || '-' || ".join(
            f"CAST(s{b * ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(ROWS_PER_BAND)
        )
        + " AS band_hash FROM sig"
        for b in range(N_BANDS)
    )
    matches = " + ".join(
        f"CASE WHEN a.s{k} = b.s{k} THEN 1 ELSE 0 END"
        for k in range(N_HASHES)
    )
    return f"""
        WITH {_DUCK_SHINGLES_CTE},
        sig AS (
            SELECT doc_id,
               {mins}
            FROM sh GROUP BY doc_id
        ),
        bands AS (
{band_selects}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        ),
        counts AS (
            SELECT ({matches}) AS n_matching, count(*) AS n_pairs
            FROM cand c
            JOIN sig a ON c.doc_a = a.doc_id
            JOIN sig b ON c.doc_b = b.doc_id
            GROUP BY 1
        )
        SELECT CAST(n_matching AS BIGINT) AS n_matching,
               CAST(n_matching AS DOUBLE) / {N_HASHES} AS jaccard_est,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               CAST(sum(n_pairs) OVER (
                   ORDER BY n_matching DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_pairs_at_least
        FROM counts
    """


def _minhash_containment_oracle() -> str:
    matches = _minhash_matches_expr()
    return f"""
        WITH {_minhash_cand_scaffold()}
        SELECT c.doc_a, c.doc_b,
               CAST(({matches}) AS BIGINT) AS n_matching,
               CAST(({matches}) * (sa.n + sb.n) AS DOUBLE)
                   / (({N_HASHES} + ({matches})) * sa.n)
                   AS containment_est_a,
               CAST(coalesce(i.i, 0) AS DOUBLE) / sa.n
                   AS containment_exact_a
        FROM cand c
        JOIN sig a ON a.doc_id = c.doc_a
        JOIN sig b ON b.doc_id = c.doc_b
        LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        JOIN sizes sa ON sa.doc_id = c.doc_a
        JOIN sizes sb ON sb.doc_id = c.doc_b
    """


@register(
    "q_minhash_containment",
    oracle=_minhash_containment_oracle(),
    doc="Containment estimated FROM STORED MINHASH SIGNATURES, next to"
    " the exact value: Jaccard and containment are interconvertible"
    " given set sizes — C_a = |A∩B|/|A| = J*(|A|+|B|)/((1+J)*|A|) —"
    " so with J ≈ m/K the kilobyte signature artifact plus two stored"
    " set sizes screens for ASYMMETRIC subset-duplication (quoted /"
    " embedded docs) without re-shingling the corpus; q_containment"
    " is the exact full pass this screen gates at 100 TB. Everything"
    " is one float division over exact integers (m, K, na, nb, i),"
    " so estimate AND truth hash-match the oracle. Reuses the"
    " memoized shingle/signature substrate — no new wide work beyond"
    " the candidate-only intersection join.",
)
def q_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_signatures(spark, sf_dir)
    # shared checkpointed pair substrate — see q_minhash_estimate
    cand = minhash_pairs_cached(spark, sf_dir)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"s{k}").alias(f"a{k}") for k in range(N_HASHES)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"s{k}").alias(f"b{k}") for k in range(N_HASHES)],
    )
    m = sum(
        (
            F.when(F.col(f"a{k}") == F.col(f"b{k}"), 1).otherwise(0)
            for k in range(N_HASHES)
        ),
        F.lit(0),
    ).cast("bigint")
    sh = _spark_shingle_hashes(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    xa = sh.select(F.col("doc_id").alias("doc_a"), "h")
    xb = sh.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        cand.join(xa, "doc_a")
        .join(xb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    i0 = F.coalesce(F.col("i"), F.lit(0).cast("bigint"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            m.alias("n_matching"),
            (
                (m * (F.col("na") + F.col("nb"))).cast("double")
                / ((F.lit(N_HASHES) + m) * F.col("na"))
            ).alias("containment_est_a"),
            (i0.cast("double") / F.col("na")).alias("containment_exact_a"),
        )
    )


@register(
    "q_minhash_scurve",
    oracle=_scurve_oracle(),
    doc="Banding S-curve audit: the distribution of LSH candidate pairs"
    f" over the signature-match count (estimate = matches/{N_HASHES}),"
    " with a cumulative pairs-at-or-above column — exactly the curve"
    " you read to re-tune bands/rows before a threshold change (how"
    " many pairs survive if the near-dup bar moves to 0.5? 0.75?)."
    " Everything is integer counts (the cumulative window runs over"
    f" <= {N_HASHES + 1} rows, never data-sized), so rows hash-match"
    " the oracle. Signatures and candidates reuse the stored-artifact"
    " path; no re-shingling, no all-pairs anywhere.",
)
def q_minhash_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    est = q_minhash_estimate(spark, sf_dir)
    counts = est.groupBy("n_matching").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    w = (
        Window.orderBy(F.desc("n_matching"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return counts.select(
        F.col("n_matching").cast("bigint").alias("n_matching"),
        (F.col("n_matching").cast("double") / N_HASHES).alias("jaccard_est"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.sum("n_pairs").over(w).cast("bigint").alias("n_pairs_at_least"),
    )


# ---------------------------------------------------------------------------
# Cluster-aware split assignment (leakage fix)
# ---------------------------------------------------------------------------

_CSP_SPARK_H100 = (
    "pmod(cast(conv(substr(md5(concat('csp_', cast(split_key as string))),"
    " 1, 15), 16, 10) as bigint), 100)"
)
_CSP_DUCK_H100 = (
    "CAST(('0x' || substr(md5('csp_' || CAST(split_key AS VARCHAR)), 1, 15))"
    " AS BIGINT) % 100"
)


@register(
    "q_cluster_split",
    oracle=f"""
        WITH RECURSIVE {_DUCK_SHINGLES_CTE},
        {_DUCK_CAPPED_CTE},
        pairs AS (
            SELECT doc_a, doc_b
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {_CLUSTER_THRESHOLD}
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach(n, r) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM edges)
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON reach.n = e.b
        ),
        clusters AS (
            SELECT n AS doc_id, min(r) AS cluster_rep
            FROM reach GROUP BY n
        ),
        keyed AS (
            SELECT d.doc_id,
                   COALESCE(c.cluster_rep, d.doc_id) AS split_key,
                   c.cluster_rep IS NOT NULL AS in_cluster
            FROM documents d LEFT JOIN clusters c USING (doc_id)
        )
        SELECT doc_id, split_key, in_cluster,
               CASE WHEN ({_CSP_DUCK_H100}) < 80 THEN 'train'
                    WHEN ({_CSP_DUCK_H100}) < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM keyed
    """,
    doc="Cluster-aware train/valid/test assignment — the FIX for what"
    " q_leakage_pairs measures: the split hash keys on the near-dup"
    " CLUSTER representative (jaccard >= 0.8 connected components),"
    " own doc_id for singletons, so every member of a duplicate"
    " cluster lands in the same split BY CONSTRUCTION and no eval doc"
    " has a >= 0.8 twin in train (asserted in tests/test_decontam.py;"
    " weaker LSH-band pairs can still straddle — tighten the cluster"
    " threshold to widen the guarantee). Shape: the verified CC"
    " pipeline + one left join + a salted hash — assignment itself"
    " adds no shuffle beyond the broadcast-able cluster map.",
)
def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    clusters = q_dedup_clusters(spark, sf_dir)
    keyed = docs.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_rep", "doc_id").alias("split_key"),
        F.col("cluster_rep").isNotNull().alias("in_cluster"),
    )
    h = F.expr(_CSP_SPARK_H100)
    return keyed.select(
        "doc_id",
        "split_key",
        "in_cluster",
        F.when(h < 80, "train")
        .when(h < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "q_span_cut",
    oracle=f"""
        WITH pos AS (
            -- n_words from the subquery (see q_dup_spans: a bare text
            -- reference here correlates the CTE to the outer documents
            -- scan and goes quadratic)
            SELECT doc_id, n_words, i,
                   {_DUCK_H.format(
                       expr=f"array_to_string(words[i : i + {SPAN_WORDS - 1}], ' ')"
                   )} AS h
            FROM (
                SELECT doc_id, string_split(text, ' ') AS words,
                       len(string_split(text, ' ')) AS n_words,
                       unnest(generate_series(
                           1, len(string_split(text, ' ')) - {SPAN_WORDS - 1}
                       )) AS i
                FROM documents
                WHERE len(string_split(text, ' ')) >= {SPAN_WORDS}
            )
        ),
        hot AS (SELECT h FROM pos GROUP BY h HAVING count(*) >= 2),
        dup AS (
            SELECT p.doc_id, p.i AS s, p.i + {SPAN_WORDS - 1} AS e
            FROM pos p JOIN hot USING (h)
        ),
        flagged AS (
            SELECT doc_id, s, e,
                   CASE WHEN s > max(e) OVER (
                       PARTITION BY doc_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) THEN 1 ELSE 0 END AS new_island
            FROM dup
        ),
        islands AS (
            SELECT doc_id, s, e,
                   sum(new_island) OVER (
                       PARTITION BY doc_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island_id
            FROM flagged
        ),
        merged AS (
            SELECT doc_id, island_id, min(s) AS s, max(e) AS e
            FROM islands GROUP BY doc_id, island_id
        ),
        spans AS (
            SELECT doc_id,
                   list({{'s': s, 'e': e}} ORDER BY s) AS sp
            FROM merged GROUP BY doc_id
        ),
        cut AS (
            SELECT d.doc_id,
                   string_split(d.text, ' ') AS words,
                   COALESCE(s.sp, []) AS sp
            FROM documents d LEFT JOIN spans s USING (doc_id)
        )
        SELECT doc_id,
               -- DuckDB's array_to_string of an empty list is NULL;
               -- a fully-cut doc is the empty string on both engines
               COALESCE(array_to_string(
                   list_filter(words,
                       (w, i) -> len(list_filter(sp,
                           x -> i >= x.s AND i <= x.e)) = 0),
                   ' '), '') AS clean_text,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(len(list_filter(words,
                       (w, i) -> len(list_filter(sp,
                           x -> i >= x.s AND i <= x.e)) = 0))
                    AS BIGINT) AS n_kept
        FROM cut
    """,
    doc="ExactSubstr span CUTTING — the action completing q_dup_spans'"
    " measurement (Lee et al. 2022 cut repeated passages instead of"
    " dropping whole documents): every merged duplicated span's words"
    " are removed and the survivors rejoin into clean_text, keeping"
    " unique prose from otherwise-boilerplate documents. The span list"
    " rides back onto the doc row as a small array (spans per doc are"
    " few after island-merging), and the cut is a per-row lambda"
    " filter over word positions — no second corpus shuffle beyond"
    " the span pipeline itself. Both engines run the identical"
    " positional filter (Spark's 0-based lambda index mapped to the"
    " oracle's 1-based).",
)
def q_span_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.split("text", " ")
    base = docs.select("doc_id", w.alias("words"), F.size(w).alias("n_words"))
    pos = (
        base.filter(F.col("n_words") >= SPAN_WORDS)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(words) - {SPAN_WORDS - 1}),"
                    f" i -> struct(i, concat_ws(' ', slice(words, i, {SPAN_WORDS}))"
                    " AS g))"
                )
            ).alias("p"),
        )
        .select(
            "doc_id",
            F.col("p.i").alias("s"),
            (F.col("p.i") + (SPAN_WORDS - 1)).alias("e"),
            F.expr(_SPARK_H.format(expr="p.g")).alias("h"),
        )
    )
    hot = pos.groupBy("h").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") >= 2
    )
    dup = pos.join(hot.select("h"), "h")
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    running = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        dup.withColumn(
            "new_island",
            F.when(F.col("s") > F.max("e").over(prev), 1).otherwise(0),
        )
        .withColumn("island_id", F.sum("new_island").over(running))
        .groupBy("doc_id", "island_id")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    spans = merged.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("sp")
    )
    cut = base.join(spans, "doc_id", "left").select(
        "doc_id",
        "words",
        F.coalesce(
            "sp", F.expr("CAST(array() AS array<struct<s:int,e:int>>)")
        ).alias("sp"),
    )
    keep = (
        "filter(words, (w, i) -> NOT exists(sp,"
        " x -> i + 1 >= x.s AND i + 1 <= x.e))"
    )
    return cut.select(
        "doc_id",
        F.expr(f"array_join({keep}, ' ')").alias("clean_text"),
        F.size("words").cast("bigint").alias("n_words"),
        F.expr(f"size({keep})").cast("bigint").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Shingle-size sensitivity audit
# ---------------------------------------------------------------------------

_SSZ_DOC_CAP = 600
_SSZ_WIDTHS = (2, 3, 4, 5)


def _ssz_oracle() -> str:
    blocks = []
    for w in _SSZ_WIDTHS:
        blocks.append(f"""
        SELECT {w} AS shingle_words,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT doc_a) + count(DISTINCT doc_b) AS BIGINT)
                   AS n_docs_touched,
               CAST(sum(i) AS BIGINT) AS sum_inter
        FROM (
            WITH samp AS (
                SELECT doc_id, text FROM documents
                ORDER BY md5('cap_' || CAST(doc_id AS VARCHAR)), doc_id
                LIMIT {_SSZ_DOC_CAP}
            ),
            {_duck_shingles_cte(src="samp", words=w)},
            hdf AS (SELECT h, count(*) AS df FROM sh GROUP BY h),
            capped AS (
                SELECT sh.doc_id, sh.h FROM sh JOIN hdf USING (h)
                WHERE hdf.df <= {DF_CAP}
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM capped
                      GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       count(*) AS i
                FROM capped a JOIN capped b
                  ON a.h = b.h AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, i
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE i * 5 >= (sa.n + sb.n - i) * 4
        )
        """)
    return " UNION ALL ".join(blocks)


@register(
    "q_dedup_shingle_size",
    oracle=_ssz_oracle(),
    doc=f"Shingle-width sensitivity audit for the near-dup pipeline:"
    f" exact jaccard >= 0.8 pair counts at word widths {_SSZ_WIDTHS},"
    f" on the standard md5-ordered {_SSZ_DOC_CAP}-doc sample (bounded"
    " BY CONSTRUCTION at any corpus size — the q_lsh_eval audit"
    " pattern). Wider shingles shrink the pair set (3-grams are the"
    " industry default; this measures how much the choice matters on"
    " YOUR corpus before a 100 TB run commits to one). Each width runs"
    " the prefix-filtered high-threshold path — candidates are prefix"
    " collisions, not bucket squares — and the brute-force oracle"
    " re-certifies losslessness at every width.",
)
def q_dedup_shingle_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE plan for all widths: width is a key column threaded through
    # every stage (shingle explode, df-cap, arrays, prefix, buckets,
    # verify), so the sampled corpus is scanned once instead of once
    # per width and Catalyst compiles one pipeline instead of four.
    docs = _sample_docs(load_table(spark, sf_dir, "documents"), _SSZ_DOC_CAP)
    docs = fan_out(docs, "doc_id")
    widths = F.array(*[F.lit(w) for w in _SSZ_WIDTHS])
    wdocs = docs.select(
        "doc_id", F.explode(widths).alias("w"), "text"
    )
    # width-parametrized shingles: slice length is the w COLUMN
    shingle_expr = (
        "array_distinct(transform("
        " sequence(1, greatest(size(split(text, ' ')) - (w - 1), 1)),"
        " i -> concat_ws(' ', slice(split(text, ' '), i, w))))"
    )
    sh = wdocs.select(
        "w", "doc_id", F.explode(F.expr(shingle_expr)).alias("s")
    ).select("w", "doc_id", F.expr(_SPARK_H.format(expr="s")).alias("h"))
    hdf = (
        sh.groupBy("w", "h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DF_CAP)
    )
    arrays = (
        sh.join(hdf, ["w", "h"])
        .groupBy("w", "doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "h"))).alias("tf"))
        .select(
            "w",
            "doc_id",
            F.expr("transform(tf, x -> x.h)").alias("toks"),
            F.size("tf").alias("n"),
        )
    )
    # lazy checkpoint, not .persist(): bounded materialization (first
    # consumer job computes the blocks, the prefix/pair branches read
    # them), no cache pinned for the session lifetime (r5 ADVICE leak)
    arrays = _checkpoint(arrays, eager=False)
    prefix_len = F.expr("n - ((n * 4 + 4) div 5) + 1")
    prefix = arrays.select(
        "w", "doc_id", "n",
        F.explode(F.slice("toks", F.lit(1), prefix_len)).alias("h"),
    )
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) ->"
        " filter(transform(slice(ids, i + 2, size(ids)),"
        " y -> struct(x.doc_id AS doc_a, x.n AS na,"
        " y.doc_id AS doc_b, y.n AS nb)),"
        " p -> p.na * 4 <= p.nb * 5 AND p.nb * 4 <= p.na * 5)))"
    )
    cand = (
        prefix.groupBy("w", "h")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select("w", F.explode(pair_expr).alias("p"))
        .select("w", "p.doc_a", "p.na", "p.doc_b", "p.nb")
        .distinct()
    )
    ta = arrays.select(
        "w", F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta")
    )
    tb = arrays.select(
        "w", F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb")
    )
    i = F.size(F.array_intersect("ta", "tb"))
    pairs = (
        cand.join(ta, ["w", "doc_a"])
        .join(tb, ["w", "doc_b"])
        .withColumn("n_inter", i)
        .filter(
            F.col("n_inter") * 5
            >= (F.col("na") + F.col("nb") - F.col("n_inter")) * 4
        )
    )
    agg = pairs.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (F.countDistinct("doc_a") + F.countDistinct("doc_b"))
        .cast("bigint")
        .alias("n_docs_touched"),
        F.sum("n_inter").cast("bigint").alias("sum_inter"),
    )
    # Width spine: the oracle is a UNION ALL of ungrouped aggregates and
    # therefore emits one row per width UNCONDITIONALLY (count=0, sum
    # NULL when no pair qualifies); a bare groupBy would drop a width
    # whose pair set is empty — exactly the zero the audit exists to
    # report on a clean corpus. Left-join the constant width list and
    # coalesce the counts to 0 (sum_inter stays NULL, matching SQL's
    # empty-aggregate sum).
    spine = spark.range(1).select(F.explode(widths).alias("w"))
    return (
        spine.join(agg, "w", "left")
        .select(
            F.col("w").cast("int").alias("shingle_words"),
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_docs_touched", F.lit(0))
            .cast("bigint")
            .alias("n_docs_touched"),
            "sum_inter",
        )
    )


# ---------------------------------------------------------------------------
# Cluster purity: does transitive consolidation over-merge?
# ---------------------------------------------------------------------------


@register(
    "q_cluster_purity",
    oracle=f"""
        WITH RECURSIVE {_DUCK_SHINGLES_CTE},
        {_DUCK_CAPPED_CTE},
        epairs AS (
            SELECT doc_a, doc_b
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i)
                  >= {_CLUSTER_THRESHOLD}
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM epairs
            UNION ALL SELECT doc_b, doc_a FROM epairs
        ),
        reach(n, r) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM edges)
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON reach.n = e.b
        ),
        clusters AS (
            SELECT n AS doc_id, min(r) AS rep FROM reach GROUP BY n
        ),
        cpairs AS (
            SELECT c1.rep, c1.doc_id AS doc_a, c2.doc_id AS doc_b
            FROM clusters c1 JOIN clusters c2
              ON c1.rep = c2.rep AND c1.doc_id < c2.doc_id
        ),
        scored AS (
            SELECT p.rep,
                   CASE WHEN coalesce(i.i, 0) * 5
                             >= (sa.n + sb.n - coalesce(i.i, 0)) * 4
                        THEN 1 ELSE 0 END AS ok
            FROM cpairs p
            JOIN sizes sa ON p.doc_a = sa.doc_id
            JOIN sizes sb ON p.doc_b = sb.doc_id
            LEFT JOIN inter i
              ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
        )
        SELECT rep AS cluster_rep,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(ok) AS BIGINT) AS n_pairs_ok,
               CAST(sum(ok) * 10000 // count(*) AS BIGINT) AS purity_bp
        FROM scored GROUP BY rep
    """,
    doc="Transitive-closure PURITY audit of the near-dup clusters:"
    " connected components merge by CHAINS (a~b, b~c puts a,c in one"
    " cluster even when jaccard(a,c) < 0.8), and this measures how"
    " much — for every intra-cluster doc pair, is the DIRECT exact"
    " jaccard still >= 0.8? purity_bp = 10000 * ok-pairs / pairs per"
    " cluster. Low-purity clusters are the over-merge candidates a"
    " keep-one-per-cluster policy silently destroys; the standard"
    " fix (re-split or raise the threshold) starts from exactly this"
    " table. Pair expansion is within-cluster only (near-dup"
    " components are df-cap-bounded); missing intersection rows are"
    " jaccard-0 pairs (LEFT JOIN + coalesce, both engines).",
)
def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = q_dedup_clusters(spark, sf_dir)
    c1 = clusters.select(
        F.col("cluster_rep").alias("rep"), F.col("doc_id").alias("doc_a")
    )
    c2 = clusters.select(
        F.col("cluster_rep").alias("rep"), F.col("doc_id").alias("doc_b")
    )
    cpairs = c1.join(c2, "rep").filter(F.col("doc_a") < F.col("doc_b"))
    # exact jaccard for the candidate pairs from the SHARED per-doc
    # capped token-array substrate (the same checkpointed table the
    # prefix-filtered pipeline uses — array_intersect is
    # order-insensitive, so the (df, h) sort is irrelevant here)
    arrays = _substrate(
        spark,
        ("ppjoin_arrays", sf_dir, None, SHINGLE_WORDS),
        lambda: _ppjoin_arrays_plan(spark, sf_dir, None, SHINGLE_WORDS),
    ).select("doc_id", "toks")
    ta = arrays.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta")
    )
    tb = arrays.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb")
    )
    i = F.size(F.array_intersect("ta", "tb"))
    u = F.size("ta") + F.size("tb") - i
    scored = (
        cpairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("rep", (i * 5 >= u * 4).cast("int").alias("ok"))
    )
    return scored.groupBy(F.col("rep").alias("cluster_rep")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("ok").cast("bigint").alias("n_pairs_ok"),
        F.expr("CAST(sum(ok) * 10000 div count(1) AS BIGINT)").alias(
            "purity_bp"
        ),
    )
