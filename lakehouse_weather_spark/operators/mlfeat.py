"""ML feature-engineering operators the training-data closure was still
missing: leakage-safe supervised encoding, contrastive-triplet
construction, and the hashing trick.

The reference pipeline feeds a RAG index (``dags/utils/seed_milvus.py``) and
stops at embeddings; a production training pipeline additionally
derives MODEL-INPUT features from the curated tables. These three are
the canonical shapes:

- q_target_encode_oof: out-of-fold target encoding — the standard
  leakage-safe way to turn a categorical column into a numeric feature
  (encode each row with statistics computed EXCLUDING its own CV fold,
  so the feature never sees its own label).
- q_contrastive_pairs: (anchor, positive, negative) triplet mining for
  embedding training — positive = the length-nearest same-source
  same-language document, negative = a rank-matched document from the
  NEXT source (deterministic "random" negative without rand()).
- q_feature_hashing: the hashing trick (Weinberger et al. 2009) —
  words hash into a fixed 32-bucket count vector, the unbounded
  vocabulary becomes a fixed-width dense feature with zero vocabulary
  state to ship.

Determinism: all arithmetic is int64 (fixed-point money, md5-derived
hashes, floor divisions on non-negative values), so every query
hash-matches its DuckDB oracle bit-for-bit.

Scale notes (100 TB framing):
- q_target_encode_oof: the encoding table is |segments| x |folds| = 25
  rows — two partial-agg shuffles build it, then it broadcasts back
  onto the customer scan. No window ever touches the fact table.
- q_contrastive_pairs: two windows partitioned by (source[, lang]) —
  the natural corpus sharding key — plus a broadcast of the tiny
  per-source directory. Skewed mega-sources would salt the rank
  window; the join fanout is exactly 1 row per anchor.
- q_feature_hashing: explode + one partial-agg shuffle on
  (doc_id, bucket); the dense 32-wide vector materializes per doc via
  an array transform, never a pivot. Bucket count is a constant, so
  output width is independent of vocabulary size — the entire point
  of the hashing trick at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_weather_spark.functions import SCALE
from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table, local_df

# Number of cross-validation folds for out-of-fold encoding.
N_FOLDS = 5
# Hashing-trick vector width: small enough to eyeball, same shape as
# any production 2^18-bucket config.
N_BUCKETS = 32


@register(
    "q_target_encode_oof",
    oracle=f"""
        WITH o AS (
            SELECT o_custkey,
                   CAST(round(o_totalprice * {SCALE}) AS BIGINT) AS vfx
            FROM orders
        ),
        cf AS (
            SELECT c_custkey, c_mktsegment AS mktsegment,
                   c_custkey % {N_FOLDS} AS fold
            FROM customer
        ),
        pf AS (
            SELECT mktsegment, fold,
                   CAST(sum(vfx) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM cf JOIN o ON o.o_custkey = cf.c_custkey
            GROUP BY mktsegment, fold
        ),
        tot AS (
            SELECT mktsegment,
                   CAST(sum(s) AS BIGINT) AS st,
                   CAST(sum(n) AS BIGINT) AS nt
            FROM pf GROUP BY mktsegment
        )
        SELECT cf.c_custkey, cf.mktsegment,
               CAST(cf.fold AS BIGINT) AS fold,
               CAST(tot.nt - COALESCE(pf.n, 0) AS BIGINT) AS n_oof,
               CAST((tot.st - COALESCE(pf.s, 0))
                    // NULLIF(tot.nt - COALESCE(pf.n, 0), 0)
                    AS BIGINT) AS oof_enc_fx
        FROM cf
        JOIN tot USING (mktsegment)
        LEFT JOIN pf USING (mktsegment, fold)
    """,
    doc="Out-of-fold target encoding: each customer's market segment"
    " becomes the mean fixed-point order total of OTHER folds'"
    " customers in the same segment (fold = custkey mod 5) — the"
    " leakage-safe categorical encoder every tabular training"
    " pipeline runs. Mean is floor division of non-negative int64"
    " (sums first, one division last), so Spark and DuckDB agree"
    " bit-for-bit. Plan: fact scan -> partial agg to a 25-row"
    " (segment, fold) table -> per-segment totals -> both broadcast"
    " back onto the customer scan; zero windows, zero shuffles of"
    " the wide side beyond the one agg.",
)
def q_target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * SCALE, 0).cast("bigint").alias("vfx"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("mktsegment"),
        (F.col("c_custkey") % N_FOLDS).alias("fold"),
    )
    per_fold = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("mktsegment", "fold")
        .agg(
            F.sum("vfx").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    tot = per_fold.groupBy("mktsegment").agg(
        F.sum("s").cast("bigint").alias("st"),
        F.sum("n").cast("bigint").alias("nt"),
    )
    return (
        cust.join(F.broadcast(tot), "mktsegment")
        .join(F.broadcast(per_fold), ["mktsegment", "fold"], "left")
        .select(
            "c_custkey",
            "mktsegment",
            F.col("fold").cast("bigint").alias("fold"),
            (F.col("nt") - F.coalesce(F.col("n"), F.lit(0)))
            .cast("bigint")
            .alias("n_oof"),
            F.expr(
                "CAST((st - coalesce(s, 0))"
                " div nullif(nt - coalesce(n, 0), 0) AS BIGINT)"
            ).alias("oof_enc_fx"),
        )
    )


@register(
    "q_contrastive_pairs",
    oracle="""
        WITH srcs AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY source
        ),
        s2 AS (
            SELECT source,
                   COALESCE(lead(source) OVER (ORDER BY source),
                            first_value(source) OVER (
                                ORDER BY source
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING)) AS neg_source,
                   COALESCE(lead(n) OVER (ORDER BY source),
                            first_value(n) OVER (
                                ORDER BY source
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING)) AS neg_n
            FROM srcs
        ),
        ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY doc_id) AS rn
            FROM documents
        ),
        pos AS (
            SELECT doc_id, source, lang, n_chars,
                   lead(doc_id) OVER (PARTITION BY source, lang
                                      ORDER BY n_chars, doc_id) AS pos_id,
                   lead(n_chars) OVER (PARTITION BY source, lang
                                       ORDER BY n_chars, doc_id) AS pos_chars
            FROM documents
        )
        SELECT p.doc_id AS anchor_id, p.pos_id, r2.doc_id AS neg_id,
               p.source, s2.neg_source,
               CAST(abs(p.pos_chars - p.n_chars) AS BIGINT)
                   AS pos_gap_chars
        FROM pos p
        JOIN ranked r USING (doc_id)
        JOIN s2 ON s2.source = p.source
        JOIN ranked r2 ON r2.source = s2.neg_source
                      AND r2.rn = (r.rn - 1) % s2.neg_n + 1
        WHERE p.pos_id IS NOT NULL
    """,
    doc="Contrastive-triplet mining for embedding training: anchor ="
    " every document with a same-source same-language successor in"
    " length order; positive = that length-nearest neighbor (cheap"
    " weak supervision: near-length same-provenance docs correlate);"
    " negative = the rank-matched document of the NEXT source"
    " (cyclic), a deterministic stand-in for a uniform cross-source"
    " negative — no rand(), so the triplet set is reproducible"
    " shuffle-for-shuffle. Plan: two windows on the natural corpus"
    " shard keys (source[, lang]) + a broadcast of the per-source"
    " directory; the negative join fans out exactly 1:1.",
)
def q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    srcs = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # The per-source directory is tiny (|sources| rows): a global
    # window over it is bounded, not a scale hazard.
    wsrc = Window.orderBy("source")
    wall = wsrc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    s2 = srcs.select(
        "source",
        F.coalesce(
            F.lead("source").over(wsrc), F.first("source").over(wall)
        ).alias("neg_source"),
        F.coalesce(F.lead("n").over(wsrc), F.first("n").over(wall)).alias(
            "neg_n"
        ),
    )
    wrank = Window.partitionBy("source").orderBy("doc_id")
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(wrank).alias("rn")
    )
    wpos = Window.partitionBy("source", "lang").orderBy("n_chars", "doc_id")
    pos = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.lead("doc_id").over(wpos).alias("pos_id"),
        F.lead("n_chars").over(wpos).alias("pos_chars"),
    ).filter(F.col("pos_id").isNotNull())
    r2 = ranked.select(
        F.col("doc_id").alias("neg_id"),
        F.col("source").alias("neg_source"),
        F.col("rn").alias("neg_rn"),
    )
    anchors = (
        pos.join(ranked.select("doc_id", "rn"), "doc_id")
        .join(F.broadcast(s2), "source")
        .withColumn("neg_rn", (F.col("rn") - 1) % F.col("neg_n") + 1)
    )
    return (
        anchors.join(r2, ["neg_source", "neg_rn"])
        .select(
            F.col("doc_id").alias("anchor_id"),
            "pos_id",
            "neg_id",
            "source",
            "neg_source",
            F.abs(F.col("pos_chars") - F.col("n_chars"))
            .cast("bigint")
            .alias("pos_gap_chars"),
        )
    )


# md5-derived bucket: identical int in Spark (conv base16->10) and
# DuckDB ('0x' cast); 15 hex digits = 60 bits, always non-negative.
_SPARK_BUCKET = (
    "pmod(cast(conv(substr(md5(concat('fh_', word)), 1, 15), 16, 10)"
    f" as bigint), {N_BUCKETS})"
)
_DUCK_BUCKET = (
    "CAST(('0x' || substr(md5('fh_' || word), 1, 15)) AS BIGINT)"
    f" % {N_BUCKETS}"
)


@register(
    "q_feature_hashing",
    oracle=f"""
        WITH words AS (
            SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS word
            FROM documents
        ),
        bucketed AS (
            SELECT doc_id, CAST({_DUCK_BUCKET} AS INTEGER) AS bucket,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM words GROUP BY 1, 2
        ),
        dense AS (
            SELECT d.doc_id, g.b,
                   COALESCE(bk.cnt, 0) AS cnt
            FROM (SELECT DISTINCT doc_id FROM documents) d
            CROSS JOIN (SELECT unnest(generate_series(0, {N_BUCKETS - 1}))
                        AS b) g
            LEFT JOIN bucketed bk
                   ON bk.doc_id = d.doc_id AND bk.bucket = g.b
        )
        SELECT doc_id,
               '[' || string_agg(CAST(cnt AS VARCHAR), ',' ORDER BY b)
                   || ']' AS features,
               CAST(sum(cnt) AS BIGINT) AS n_tokens
        FROM dense GROUP BY doc_id
    """,
    doc="Hashing-trick feature vectors (Weinberger et al. 2009): every"
    " word md5-hashes into one of 32 buckets; each document becomes a"
    " fixed-width dense count vector + token total — the"
    " vocabulary-free text featurizer (no dictionary to build, ship,"
    " or version; collisions are the accepted trade). md5-derived"
    " buckets make Spark and DuckDB agree exactly. Plan: explode +"
    " ONE partial-agg shuffle on (doc_id, bucket), then a per-row"
    " array transform densifies — no pivot, no second shuffle; output"
    " width is constant regardless of vocabulary, which is why this"
    " scales where one-hot cannot.",
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    )
    bucketed = (
        words.select("doc_id", F.expr(_SPARK_BUCKET).cast("int").alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    pairs = bucketed.groupBy("doc_id").agg(
        F.collect_list(F.struct("bucket", "cnt")).alias("pairs")
    )
    dense = F.expr(
        f"transform(sequence(0, {N_BUCKETS - 1}),"
        " i -> coalesce(element_at(map_from_entries(pairs), i),"
        " cast(0 as bigint)))"
    )
    # features ships as a JSON string: external row-hash harnesses
    # can't canonicalize list cells, and a compact JSON array is the
    # interchange shape a feature store would land anyway.
    return pairs.select(
        "doc_id",
        F.to_json(dense).alias("features"),
        F.expr("aggregate(pairs, cast(0 as bigint), (a, p) -> a + p.cnt)")
        .alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Distributed PCA: power iteration on an exact integer Gram matrix
# ---------------------------------------------------------------------------

_PI_X_SCALE = 1_000_000   # element quantization (exact in int64)
_PI_VNORM = 1 << 20       # vector renorm target after each matvec
_PI_ITERS = 8
_PI_VEC_CAP = 4000        # deterministic md5 vector sample (audit-bounded)


def _pi_fdiv_duck(a: str, b: str) -> str:
    """Exact FLOOR division for possibly-negative a (b > 0): subtract
    the non-negative mod first, then the division is exact, so ANY
    integer divider returns the floor result. Both engines truncate
    toward zero on negatives (Spark ``div`` AND DuckDB ``//``:
    -7 // 2 = -3 in DuckDB, not -4) — this helper exists to get floor
    semantics portably on both, not to paper over an engine
    difference."""
    return f"((({a}) - ((({a}) % ({b}) + ({b})) % ({b}))) // ({b}))"


def _pi_oracle() -> str:
    steps = []
    prev = "v0"
    for k in range(1, _PI_ITERS + 1):
        steps.append(f"""
        w{k} AS (
            SELECT g2.i AS pos, CAST(sum(g2.g * {prev}.v) AS BIGINT) AS w
            FROM g2 JOIN {prev} ON {prev}.pos = g2.j
            GROUP BY g2.i
        ),
        m{k} AS (
            SELECT greatest(max(abs(w)), 1) // {_PI_VNORM} + 1 AS d
            FROM w{k}
        ),
        v{k} AS (
            SELECT pos, CAST({_pi_fdiv_duck('w', 'd')} AS BIGINT) AS v
            FROM w{k}, m{k}
        )""")
        prev = f"v{k}"
    return f"""
        WITH samp AS (
            SELECT vec_id, embedding FROM embeddings
            ORDER BY md5('cap_' || CAST(vec_id AS VARCHAR)), vec_id
            LIMIT {_PI_VEC_CAP}
        ),
        u AS (
            SELECT vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS pos
            FROM samp
        ),
        xf AS (
            SELECT vec_id, pos,
                   CAST(round(CAST(embedding[pos] AS DOUBLE)
                              * {_PI_X_SCALE}) AS BIGINT) AS x
            FROM u
        ),
        g AS (
            SELECT a.pos AS i, b.pos AS j, CAST(sum(a.x * b.x) AS BIGINT) AS g
            FROM xf a JOIN xf b USING (vec_id)
            GROUP BY a.pos, b.pos
        ),
        gm AS (SELECT max(abs(g)) // {_PI_VNORM} + 1 AS d FROM g),
        g2 AS (
            SELECT i, j, CAST({_pi_fdiv_duck('g', 'd')} AS BIGINT) AS g
            FROM g, gm
        ),
        v0 AS (
            SELECT DISTINCT i AS pos, CAST({_PI_VNORM} AS BIGINT) AS v
            FROM g2
        ),{{them}}
        SELECT CAST(pos AS BIGINT) AS dim,
               v AS v_fx,
               CAST(v AS DOUBLE) / {_PI_VNORM} AS component
        FROM {prev}
    """.replace("{them}", ",".join(steps))


@register(
    "q_power_iteration",
    oracle=_pi_oracle(),
    doc=f"Distributed PCA direction estimate: {_PI_ITERS} power-"
    "iteration steps toward the dominant Gram eigenvector — a"
    " DETERMINISTIC k-step transform (on a flat spectrum like this"
    " fixture's random embeddings, full convergence needs ~1/log("
    "lambda1/lambda2) steps; k is the knob, the mechanics are what"
    " this query certifies). EXACT INTEGER throughout: embeddings are"
    f" fixed-point-quantized (x{_PI_X_SCALE}), the dim x dim Gram"
    " accumulates in int64 (associative — partition-order-free), and"
    " each matvec renormalizes with an exact floor division to the"
    f" 2^20 scale, so all {_PI_ITERS} iterations are pure integer"
    " arithmetic and DuckDB replays the eigenvector bit-for-bit —"
    " power iteration WITHOUT the float-accumulation nondeterminism"
    " that makes distributed PCA normally unreproducible. Scale shape:"
    " the Gram reduce is one partial-agg shuffle of dim^2-sized"
    " partials (the mapInPandas/BLAS form computes the same integers"
    " faster; the SQL form is the provable one); every iteration is a"
    " join+agg over the dim x dim matrix — executor-sized, never"
    " corpus-sized. The corpus side is a deterministic md5 sample"
    f" ({_PI_VEC_CAP} vectors), the standard bounded-audit pattern."
    " The floor-division helper subtracts the non-negative mod first,"
    " making the division exact — so the idiom yields FLOOR semantics"
    " portably on BOTH engines (Spark `div` and DuckDB `//` each"
    " truncate toward zero on negatives: -7 // 2 = -3 in DuckDB too;"
    " neither floors natively).",
)
def q_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    order = F.md5(F.concat(F.lit("cap_"), F.col("vec_id").cast("string")))
    samp = emb.orderBy(order, "vec_id").limit(_PI_VEC_CAP)
    # quantize JVM-SIDE (Spark round() == DuckDB round() by decimal
    # HALF_UP semantics) so the Arrow kernel below touches only exact
    # integers — no float rounding anywhere in Python
    xf = samp.select(
        F.expr(
            "transform(embedding,"
            f" v -> CAST(round(CAST(v AS DOUBLE) * {_PI_X_SCALE}) AS BIGINT))"
        ).alias("x")
    )

    def gram_partials(batches):
        # per-batch integer outer-product accumulation: X^T X in int64
        # (|x| <= 1e6 -> products <= 1e12, summed over <= 1e4 batch
        # rows -> < 2^63). Integer adds are associative, so the
        # partial-then-final-sum is partition-order-free and EXACT —
        # the BLAS-speed form of the same integers the SQL self-join
        # computes (sanctioned Arrow kernel, see test_plans allowlist).
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array([np.asarray(a, dtype=np.int64) for a in pdf["x"]])
            P = X.T @ X
            dim = P.shape[0]
            ii, jj = np.indices((dim, dim))
            yield pd.DataFrame(
                {
                    "i": (ii + 1).ravel().astype(np.int32),
                    "j": (jj + 1).ravel().astype(np.int32),
                    "g": P.ravel(),
                }
            )

    g = (
        xf.mapInPandas(gram_partials, "i int, j int, g long")
        .groupBy("i", "j")
        .agg(F.sum("g").cast("bigint").alias("g"))
    )
    # the Gram is dim x dim — a MODEL, not data. Fetch it and run the
    # iterations driver-local in exact python integers (MLlib's PCA
    # does exactly this: distributed covariance, local eigensolve);
    # DataFrame-per-iteration was 16 scheduler round-trips for 64-row
    # frames. python `//` IS floor division, matching the portable
    # fdiv the DuckDB oracle replays.
    rows = g.collect()
    if not rows:
        # empty embeddings: no Gram, no component — the oracle's vals
        # CTE is empty the same way
        return local_df(
            spark, [], "dim long, v_fx long, component double"
        )
    dim = max(r.i for r in rows)
    G = [[0] * dim for _ in range(dim)]
    for r in rows:
        G[r.i - 1][r.j - 1] = r.g
    gmax = max(abs(x) for row in G for x in row)
    d = gmax // _PI_VNORM + 1
    G2 = [[x // d for x in row] for row in G]
    v = [_PI_VNORM] * dim
    for _ in range(_PI_ITERS):
        w = [
            sum(G2[i][j] * v[j] for j in range(dim)) for i in range(dim)
        ]
        dd = max(max(abs(x) for x in w), 1) // _PI_VNORM + 1
        v = [x // dd for x in w]
    return local_df(
        spark,
        [(i + 1, v[i], v[i] / _PI_VNORM) for i in range(dim)],
        "dim long, v_fx long, component double",
    )


# ---------------------------------------------------------------------------
# Embedding-distribution drift: kernel MMD from integer moment matrices
# ---------------------------------------------------------------------------

# Maximum Mean Discrepancy (Gretton et al., JMLR'12) between the
# embedding distributions of every label pair — the drift monitor an
# embedding pipeline runs when a model / corpus version changes. The
# naive estimator sums kernels over O(n^2) pairs; for the linear and
# degree-2 polynomial kernels it collapses to MOMENTS:
#
#   linear:  MMD^2 = || mean_a - mean_b ||^2          (first moments)
#   poly-2 ((x.y)^2): sum_ij (x_i.x_j)^2 = tr(M M') with
#            M = sum_i x_i x_i^T                      (second moments)
#
# so one pass builds per-label integer sum vectors and dim x dim moment
# matrices (the q_power_iteration Gram shape — int64, associative,
# partition-order-free), and the statistic is a handful of exact
# integer contractions: poly-2 MMD^2 * (scale) =
# tr(M2_a M2_a)/n_a^2 + tr(M2_b M2_b)/n_b^2 - 2 tr(M2_a M2_b)/(n_a n_b).
# A COMMON floor-divided renorm (the _pi_fdiv idiom) keeps every
# product in int64, with the same divisor for all labels so the scaled
# statistics stay comparable. The corpus side is the standard bounded
# md5 sample; contractions are dim^2-sized — executor math, not data.

_MMD_X_SCALE = 10_000
_MMD_VNORM = 1 << 20
_MMD_CAP = 2000


def _mmd_fdiv_spark(a: str, b: str) -> str:
    return f"((({a}) - pmod(({a}), ({b}))) div ({b}))"


@register(
    "q_mmd_drift",
    oracle=f"""
        WITH samp AS (
            SELECT vec_id, label, embedding FROM embeddings
            ORDER BY md5('mmd_' || CAST(vec_id AS VARCHAR)), vec_id
            LIMIT {_MMD_CAP}
        ),
        xf AS (
            SELECT vec_id, label, pos,
                   CAST(round(CAST(embedding[pos] AS DOUBLE)
                              * {_MMD_X_SCALE}) AS BIGINT) AS x
            FROM (SELECT vec_id, label, embedding,
                         unnest(generate_series(1, len(embedding))) AS pos
                  FROM samp)
        ),
        ns AS (
            SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT) AS n
            FROM xf GROUP BY label
        ),
        s AS (
            SELECT label, pos, CAST(sum(x) AS BIGINT) AS s
            FROM xf GROUP BY label, pos
        ),
        m AS (
            SELECT a.label, a.pos AS i, b.pos AS j,
                   CAST(sum(a.x * b.x) AS BIGINT) AS m
            FROM xf a JOIN xf b USING (vec_id)
            WHERE a.label = b.label
            GROUP BY a.label, a.pos, b.pos
        ),
        dm AS (SELECT max(abs(m)) // {_MMD_VNORM} + 1 AS d FROM m),
        m2 AS (
            SELECT label, i, j,
                   CAST({_pi_fdiv_duck('m', 'd')} AS BIGINT) AS m
            FROM m, dm
        ),
        frob AS (
            SELECT label, CAST(sum(m * m) AS BIGINT) AS ff
            FROM m2 GROUP BY label
        ),
        lp AS (
            SELECT na.label AS label_a, nb.label AS label_b,
                   na.n AS n_a, nb.n AS n_b
            FROM ns na JOIN ns nb ON na.label < nb.label
        ),
        cross_t AS (
            SELECT p.label_a, p.label_b,
                   CAST(sum(ma.m * mb.m) AS BIGINT) AS ab
            FROM lp p
            JOIN m2 ma ON ma.label = p.label_a
            JOIN m2 mb ON mb.label = p.label_b
                      AND mb.i = ma.i AND mb.j = ma.j
            GROUP BY p.label_a, p.label_b
        ),
        sd AS (
            SELECT p.label_a, p.label_b,
                   max(abs(sa.s * p.n_b - sb.s * p.n_a))
                       // {_MMD_VNORM} + 1 AS dd
            FROM lp p
            JOIN s sa ON sa.label = p.label_a
            JOIN s sb ON sb.label = p.label_b AND sb.pos = sa.pos
            GROUP BY p.label_a, p.label_b
        ),
        lin AS (
            SELECT p.label_a, p.label_b,
                   CAST(sum(
                       {_pi_fdiv_duck('sa.s * p.n_b - sb.s * p.n_a', 'sd.dd')}
                       * {_pi_fdiv_duck('sa.s * p.n_b - sb.s * p.n_a', 'sd.dd')}
                   ) AS BIGINT) AS lin_fx
            FROM lp p
            JOIN sd ON sd.label_a = p.label_a AND sd.label_b = p.label_b
            JOIN s sa ON sa.label = p.label_a
            JOIN s sb ON sb.label = p.label_b AND sb.pos = sa.pos
            GROUP BY p.label_a, p.label_b
        )
        SELECT p.label_a, p.label_b, p.n_a, p.n_b,
               l.lin_fx,
               fa.ff AS poly_aa, fb.ff AS poly_bb, c.ab AS poly_ab,
               CAST(fa.ff AS DOUBLE) / (CAST(p.n_a AS DOUBLE) * p.n_a)
                   + CAST(fb.ff AS DOUBLE) / (CAST(p.n_b AS DOUBLE) * p.n_b)
                   - 2 * CAST(c.ab AS DOUBLE)
                       / (CAST(p.n_a AS DOUBLE) * p.n_b) AS mmd_poly
        FROM lp p
        JOIN frob fa ON fa.label = p.label_a
        JOIN frob fb ON fb.label = p.label_b
        JOIN cross_t c ON c.label_a = p.label_a AND c.label_b = p.label_b
        JOIN lin l ON l.label_a = p.label_a AND l.label_b = p.label_b
    """,
    doc="Embedding-distribution drift between every label pair:"
    " linear- and degree-2-polynomial-kernel MMD^2 computed from"
    " per-label integer MOMENTS instead of O(n^2) kernel pairs — one"
    " pass builds int64 sum vectors and dim x dim moment matrices"
    " (the q_power_iteration Gram shape, associative and"
    " partition-order-free), a COMMON exact floor-divided renorm"
    " bounds every contraction in int64, and the poly-2 statistic is"
    " tr(M_a M_b) algebra over dim^2-sized tables. The corpus side is"
    " the standard bounded md5 sample; everything after the moment"
    " reduce is executor-scale. Exact integers end-to-end; the final"
    " normalized MMD is a handful of mirrored IEEE ops the oracle"
    " replays bit-for-bit.",
)
def q_mmd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.operators.dedup import _checkpoint

    emb = load_table(spark, sf_dir, "embeddings")
    # capped sample (<= _MMD_CAP rows): checkpointed because THREE
    # subtrees consume it (xf -> ns and s, qx -> the moment kernel) —
    # without it each consumer re-ran the corpus scan + md5
    # TakeOrdered. eager=False (r11, guide §5): the first consumer's
    # job materializes the blocks and the other two read them — same
    # single computation, minus the dedicated materialization job the
    # r10 driver data showed dominates this query at sf0.1
    samp = _checkpoint(
        emb.select(
            "vec_id",
            "label",
            "embedding",
            F.expr(
                "md5(concat('mmd_', cast(vec_id as string)))"
            ).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(_MMD_CAP)
        .drop("h"),
        eager=False,
    )
    xf = samp.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "ev"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.expr(
            f"CAST(round(CAST(ev AS DOUBLE) * {_MMD_X_SCALE}) AS BIGINT)"
        ).alias("x"),
    )
    ns = xf.groupBy("label").agg(
        F.countDistinct("vec_id").cast("bigint").alias("n")
    )
    # |labels| x dim rows, consumed by BOTH sides of the sj self-join
    # (sa, sb) whose two downstream branches (sd, lin) each re-evaluate
    # it — checkpoint so the explode+agg runs once
    s = _checkpoint(
        xf.groupBy("label", "pos").agg(
            F.sum("x").cast("bigint").alias("s")
        ),
        eager=False,
    )
    # per-label moment matrices via the q_power_iteration Arrow kernel
    # (sanctioned, see test_plans allowlist): quantization happens
    # JVM-side so Python touches only exact integers, each batch
    # accumulates X^T X per label in int64 BLAS (associative — the
    # partial-then-final sum is partition-order-free), and only
    # |labels| x dim^2 cells ever shuffle
    import numpy as np
    import pandas as pd

    qx = samp.select(
        "label",
        F.expr(
            "transform(embedding, v ->"
            f" CAST(round(CAST(v AS DOUBLE) * {_MMD_X_SCALE}) AS BIGINT))"
        ).alias("x"),
    )

    def moment_partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            for lab, grp in pdf.groupby("label"):
                X = np.array(
                    [np.asarray(a, dtype=np.int64) for a in grp["x"]]
                )
                P = X.T @ X
                dim = P.shape[0]
                ii, jj = np.indices((dim, dim))
                yield pd.DataFrame(
                    {
                        "label": np.full(dim * dim, lab),
                        "i": (ii + 1).ravel().astype(np.int32),
                        "j": (jj + 1).ravel().astype(np.int32),
                        "g": P.ravel(),
                    }
                )

    m = (
        qx.mapInPandas(moment_partials, "label int, i int, j int, g long")
        .groupBy("label", "i", "j")
        .agg(F.sum("g").cast("bigint").alias("m"))
    )
    m = _checkpoint(m, eager=False)
    dm = m.agg(
        F.expr(f"max(abs(m)) div {_MMD_VNORM} + 1").alias("d")
    )
    m2 = m.crossJoin(F.broadcast(dm)).select(
        "label",
        "i",
        "j",
        F.expr(f"CAST({_mmd_fdiv_spark('m', 'd')} AS BIGINT)").alias("m"),
    )
    m2 = _checkpoint(m2, eager=False)
    frob = m2.groupBy("label").agg(
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("ff")
    )
    na = ns.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"))
    nb = ns.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"))
    lp = na.join(nb, F.col("label_a") < F.col("label_b"))
    ma = m2.select(
        F.col("label").alias("label_a"),
        "i",
        "j",
        F.col("m").alias("m_a"),
    )
    mb = m2.select(
        F.col("label").alias("mlb"),
        F.col("i").alias("bi"),
        F.col("j").alias("bj"),
        F.col("m").alias("m_b"),
    )
    cross_t = (
        lp.join(ma, "label_a")
        .join(
            mb,
            (F.col("mlb") == F.col("label_b"))
            & (F.col("bi") == F.col("i"))
            & (F.col("bj") == F.col("j")),
        )
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("m_a") * F.col("m_b")).cast("bigint").alias("ab"))
    )
    sa = s.select(
        F.col("label").alias("label_a"),
        "pos",
        F.col("s").alias("s_a"),
    )
    sb = s.select(
        F.col("label").alias("slb"),
        F.col("pos").alias("bpos"),
        F.col("s").alias("s_b"),
    )
    sj = (
        lp.join(sa, "label_a")
        .join(
            sb,
            (F.col("slb") == F.col("label_b"))
            & (F.col("bpos") == F.col("pos")),
        )
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            (F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a"))
            .alias("dnum"),
        )
    )
    sd = sj.groupBy("label_a", "label_b").agg(
        F.expr(f"max(abs(dnum)) div {_MMD_VNORM} + 1").alias("dd")
    )
    lin = (
        sj.join(sd, ["label_a", "label_b"])
        .select(
            "label_a",
            "label_b",
            F.expr(
                f"{_mmd_fdiv_spark('dnum', 'dd')}"
                f" * {_mmd_fdiv_spark('dnum', 'dd')}"
            ).alias("sq"),
        )
        .groupBy("label_a", "label_b")
        .agg(F.sum("sq").cast("bigint").alias("lin_fx"))
    )
    fa = frob.select(
        F.col("label").alias("label_a"), F.col("ff").alias("poly_aa")
    )
    fb = frob.select(
        F.col("label").alias("label_b"), F.col("ff").alias("poly_bb")
    )
    return (
        lp.join(F.broadcast(lin), ["label_a", "label_b"])
        .join(F.broadcast(fa), "label_a")
        .join(F.broadcast(fb), "label_b")
        .join(
            F.broadcast(
                cross_t.withColumnRenamed("ab", "poly_ab")
            ),
            ["label_a", "label_b"],
        )
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            "lin_fx",
            "poly_aa",
            "poly_bb",
            "poly_ab",
            F.expr(
                "CAST(poly_aa AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_a)"
                " + CAST(poly_bb AS DOUBLE) / (CAST(n_b AS DOUBLE) * n_b)"
                " - 2 * CAST(poly_ab AS DOUBLE)"
                " / (CAST(n_a AS DOUBLE) * n_b)"
            ).alias("mmd_poly"),
        )
    )
