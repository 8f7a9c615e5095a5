"""Blocked edit-distance similarity join (training-data closure).

Fuzzy near-dup detection over short keys (titles, URLs, document
prefixes) — the string-metric complement to the token-set dedup stack
in ``operators/dedup.py``. The reference dedups only on exact content
hashes (``dags/utils/crawl_web.py:51-59``); an edit-distance join
additionally catches keys that differ by a few characters (typos,
version suffixes, tracking junk).

Scale shape — PassJoin-style pigeonhole segment blocking (Li, Deng,
Feng, "PassJoin: A Partition-based Method for Similarity Joins",
PVLDB 2011): pad every key to a fixed length L and split it into
``D + 1`` equal segments. Any two keys within edit distance D have at
least one segment of one key untouched by every edit, and its image in
the other key is positionally shifted by at most D — so candidates are
exactly the pairs matching on (segment index, 8-char content) between
one side's FIXED segments and the other side's +-D-shifted substrings.
That is one equi-join shuffle on a high-cardinality short key (no
O(n^2) pair blow-up, no cartesian), then a narrow exact
``levenshtein`` verify. The DuckDB oracle runs the BRUTE-FORCE
all-pairs join, so the gate simultaneously proves the metric math and
that the blocking scheme has zero false negatives on real data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import fan_out, load_table, local_df

# Comparison key: padded 64-char lowercased text prefix. Segment WIDTH
# is the scale contract: natural-language prefixes have low entropy,
# so 8-char segments (KEY_LEN 32) produce hot blocking buckets — on
# the sf1 scale corpus the hottest (i, s) bucket held 1,805 docs and
# sum(c^2) was 5.4M, which at sf10 became a ~75 GB candidate shuffle
# that filled the disk (slope >> 1, caught by the sf1->sf10 decade).
# 16-char segments put enough words in each segment that buckets stay
# O(1): measured max bucket 7, sum(c^2) 283k ~ n on the same corpus.
# (Wider still regresses: at 96 chars the '~' padding of short docs
# re-creates hot all-pad tail segments, max bucket 253.)
KEY_LEN = 64  # comparison key: padded 64-char lowercased text prefix
EDIT_MAX = 3  # report pairs with levenshtein <= EDIT_MAX
N_SEG = EDIT_MAX + 1  # pigeonhole: D edits cannot touch D+1 segments
SEG_LEN = KEY_LEN // N_SEG  # 16 chars per segment
_PAD = "~"

_KEY_EXPR_SPARK = f"rpad(lower(substr(text, 1, {KEY_LEN})), {KEY_LEN}, '{_PAD}')"
_KEY_EXPR_DUCK = f"rpad(lower(substr(text, 1, {KEY_LEN})), {KEY_LEN}, '{_PAD}')"


@register(
    "q_editdist_neardup",
    oracle=f"""
        WITH k AS (
            SELECT doc_id, {_KEY_EXPR_DUCK} AS key FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(a.key, b.key) AS dist
        FROM k a JOIN k b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.key, b.key) <= {EDIT_MAX}
    """,
    doc=f"Blocked edit-distance self-join: pairs of documents whose"
    f" padded {KEY_LEN}-char lowercased prefixes are within levenshtein"
    f" {EDIT_MAX}. Candidates come from PassJoin pigeonhole blocking"
    f" ({N_SEG} fixed segments vs +-{EDIT_MAX}-shifted probe"
    " substrings — one equi-join shuffle, no all-pairs), then a narrow"
    " exact levenshtein verify. The oracle is the brute-force O(n^2)"
    " join, so a gate pass also certifies the blocking loses no pairs.",
)
def q_editdist_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    keyed = docs.select("doc_id", F.expr(_KEY_EXPR_SPARK).alias("key"))
    return editdist_join(keyed)


def editdist_join(keyed: DataFrame) -> DataFrame:
    """(doc_a, doc_b, dist) for every pair of rows of ``keyed``
    (columns: doc_id, key — keys must be exactly KEY_LEN chars) within
    levenshtein EDIT_MAX, via PassJoin segment blocking + exact verify.
    """
    # one side contributes its D+1 FIXED segments ...
    seg_exprs = ", ".join(
        f"struct({i} AS i, substr(key, {i * SEG_LEN + 1}, {SEG_LEN}) AS s)"
        for i in range(N_SEG)
    )
    segs = keyed.select(
        F.col("doc_id").alias("doc_s"),
        F.col("key").alias("key_s"),
        F.explode(F.expr(f"array({seg_exprs})")).alias("g"),
    ).select("doc_s", "key_s", F.col("g.i").alias("i"), F.col("g.s").alias("s"))

    # ... the other side probes every substring of segment length whose
    # start lies within +-D of that segment's home position (clamped to
    # the key bounds) — the shift window the pigeonhole theorem needs
    probe_exprs = ", ".join(
        f"struct({i} AS i, substr(key, {off}, {SEG_LEN}) AS s)"
        for i in range(N_SEG)
        for off in range(
            max(1, i * SEG_LEN + 1 - EDIT_MAX),
            min(KEY_LEN - SEG_LEN + 1, i * SEG_LEN + 1 + EDIT_MAX) + 1,
        )
    )
    probes = keyed.select(
        F.col("doc_id").alias("doc_p"),
        F.col("key").alias("key_p"),
        F.explode(F.expr(f"array({probe_exprs})")).alias("g"),
    ).select("doc_p", "key_p", F.col("g.i").alias("i"), F.col("g.s").alias("s"))

    cands = (
        segs.join(probes, ["i", "s"])
        .filter(F.col("doc_s") != F.col("doc_p"))
        .select(
            F.least("doc_s", "doc_p").alias("doc_a"),
            F.greatest("doc_s", "doc_p").alias("doc_b"),
            F.when(F.col("doc_s") < F.col("doc_p"), F.col("key_s"))
            .otherwise(F.col("key_p"))
            .alias("key_a"),
            F.when(F.col("doc_s") < F.col("doc_p"), F.col("key_p"))
            .otherwise(F.col("key_s"))
            .alias("key_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    dist = F.levenshtein("key_a", "key_b")
    return cands.select(
        "doc_a", "doc_b", dist.alias("dist")
    ).filter(F.col("dist") <= EDIT_MAX)


@register(
    "q_fuzzy_clusters",
    oracle=f"""
        WITH RECURSIVE k AS (
            SELECT doc_id, {_KEY_EXPR_DUCK} AS key FROM documents
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM k a JOIN k b ON a.doc_id < b.doc_id
            WHERE levenshtein(a.key, b.key) <= {EDIT_MAX}
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
    doc="Fuzzy-duplicate cluster consolidation: connected components"
    " over the blocked edit-distance graph (PassJoin candidates +"
    " exact levenshtein verify feed the same min-label propagation as"
    " the jaccard clusters) — typo families and near-identical titles"
    " collapse to one representative. Oracle replays brute-force pairs"
    " + a recursive-CTE closure, so both the blocking AND the"
    " clustering are certified end to end.",
)
def q_fuzzy_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.operators.dedup import (
        _checkpoint,
        label_propagate,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    keyed = docs.select("doc_id", F.expr(_KEY_EXPR_SPARK).alias("key"))
    pairs = editdist_join(keyed).select("doc_a", "doc_b")
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    labels = label_propagate(_checkpoint(edges, eager=False))
    return labels.select("doc_id", F.col("label").alias("cluster_rep"))


# ---------------------------------------------------------------------------
# Blocking audit: pair-budget accounting before an entity-resolution run
# ---------------------------------------------------------------------------

_EB_TOPK = 20


@register(
    "q_entity_blocks",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id,
                   string_split(text, ' ')[1] || '#' ||
                       CAST(n_chars // 100 AS VARCHAR) AS block_key
            FROM documents
        ),
        blocks AS (
            SELECT block_key, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(*) * (count(*) - 1) // 2 AS BIGINT)
                       AS pair_budget
            FROM keyed GROUP BY block_key
        ),
        tot AS (
            SELECT CAST(sum(pair_budget) AS BIGINT) AS total_budget
            FROM blocks
        )
        SELECT b.block_key, b.n_docs, b.pair_budget,
               CAST(b.pair_budget * 10000 // greatest(t.total_budget, 1)
                    AS BIGINT) AS budget_share_bp
        FROM blocks b, tot t
        ORDER BY b.pair_budget DESC, b.block_key
        LIMIT {_EB_TOPK}
    """,
    doc="Blocking-key audit BEFORE an entity-resolution / fuzzy-join"
    " run: block sizes and the quadratic pair budget n*(n-1)/2 per"
    " block (first-word + length-centile key), top blocks by budget"
    " with exact basis-point share of the total. The pair budget IS"
    " the cost model of every blocked matcher (q_editdist_neardup's"
    " PassJoin, the minhash bands): one skewed mega-block quietly"
    " turns a linear pipeline quadratic, and this audit is how you"
    " find it before paying for it at 100 TB — the block-size"
    " histogram decides df-caps and salting. One partial-agg shuffle"
    " + a TakeOrdered top-k.",
)
def q_entity_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        F.concat(
            F.expr("split(text, ' ')[0]"),
            F.lit("#"),
            F.expr("CAST(n_chars div 100 AS STRING)"),
        ).alias("block_key")
    )
    blocks = keyed.groupBy("block_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("CAST(count(1) * (count(1) - 1) div 2 AS BIGINT)").alias(
            "pair_budget"
        ),
    )
    tot = blocks.agg(
        F.sum("pair_budget").cast("bigint").alias("total_budget")
    )
    return (
        blocks.crossJoin(F.broadcast(tot))
        .select(
            "block_key",
            "n_docs",
            "pair_budget",
            F.expr(
                "CAST(pair_budget * 10000"
                " div greatest(total_budget, 1) AS BIGINT)"
            ).alias("budget_share_bp"),
        )
        .orderBy(F.desc("pair_budget"), "block_key")
        .limit(_EB_TOPK)
    )


# --- Fellegi-Sunter agreement-pattern table ---------------------------

# Probabilistic record linkage's statistical core (Fellegi & Sunter,
# JASA 1969; Splink et al. industrialize it): for blocked candidate
# pairs, tabulate the AGREEMENT PATTERN over comparison fields and each
# pattern's observed match rate — the m/u-probability input the EM
# weights are fit from. Here the "records" are documents, the
# comparison fields are (lang, source, length band), and ground truth
# is an exact word-bigram Jaccard on the candidate pair (the dedup
# family's similarity, so the table reads as: which cheap field
# agreements PREDICT expensive textual match). All counting is exact
# integers; the truth threshold compares cross-multiplied integers, so
# nothing floats anywhere.

_FS_CAP = 1500          # md5-bounded doc sample (audit-bounded pairs)
_FS_BLOCK_CAP = 64      # skip hot first-word blocks (bot headers, not
                        # signal — the dedup DF_CAP precedent)
_FS_LEN_BAND = 256      # n_chars band width
_FS_JACC_NUM = 1        # match truth: jaccard >= 1/4
_FS_JACC_DEN = 4


# Shared SQL for the Fellegi-Sunter family: blocked-pair construction
# (samp/g/blocks/pairs CTEs) and the 8-row agreement-pattern aggregate —
# q_linkage_patterns emits the table; q_linkage_em fits EM weights on it.
_FS_PREFIX_CTES = f"""samp AS (
            SELECT doc_id, lang, source, n_chars,
                   string_split(trim(text), ' ') AS toks
            FROM (SELECT * FROM documents
                  WHERE length(trim(text)) > 0
                  ORDER BY md5('fs_' || CAST(doc_id AS VARCHAR)), doc_id
                  LIMIT {_FS_CAP})
        ),
        g AS (
            SELECT doc_id, lang, source, n_chars,
                   lower(toks[1]) AS tok0,
                   list_distinct([toks[k] || '#' || toks[k + 1]
                                  FOR k IN generate_series(1, len(toks) - 1)])
                       AS grams
            FROM samp
        ),
        blocks AS (
            SELECT tok0 FROM g GROUP BY tok0
            HAVING count(*) <= {_FS_BLOCK_CAP}
        ),
        pairs AS (
            SELECT a.doc_id AS da, b.doc_id AS db,
                   CAST(a.lang = b.lang AS INTEGER) AS f_lang,
                   CAST(a.source = b.source AS INTEGER) AS f_source,
                   CAST(a.n_chars // {_FS_LEN_BAND}
                        = b.n_chars // {_FS_LEN_BAND} AS INTEGER)
                       AS f_band,
                   len(list_intersect(a.grams, b.grams)) AS inter,
                   len(a.grams) + len(b.grams)
                       - len(list_intersect(a.grams, b.grams)) AS uni
            FROM g a
            JOIN blocks bl ON bl.tok0 = a.tok0
            JOIN g b ON b.tok0 = a.tok0 AND a.doc_id < b.doc_id
        )"""

_FS_PATTERN_SELECT = f"""SELECT CAST(f_lang * 4 + f_source * 2 + f_band AS BIGINT)
                   AS pattern,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CASE WHEN inter * {_FS_JACC_DEN}
                             >= uni * {_FS_JACC_NUM}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
               CAST(sum(CASE WHEN inter * {_FS_JACC_DEN}
                             >= uni * {_FS_JACC_NUM}
                        THEN 1 ELSE 0 END) * 1000
                    // count(*) AS BIGINT) AS match_pm
        FROM pairs GROUP BY 1"""


@register(
    "q_linkage_patterns",
    oracle=f"""
        WITH {_FS_PREFIX_CTES}
        {_FS_PATTERN_SELECT}
    """,
    doc="Fellegi-Sunter agreement-pattern table over blocked document"
    " pairs: candidates block on the lowercased first token"
    f" (hot blocks past {_FS_BLOCK_CAP} skipped — the DF_CAP"
    " precedent), each pair's pattern packs (lang, source,"
    f" {_FS_LEN_BAND}-char length band) agreements into 3 bits, and"
    " ground truth is an exact word-bigram Jaccard"
    f" >= {_FS_JACC_NUM}/{_FS_JACC_DEN} decided by cross-multiplied"
    " integers — the per-pattern match-rate (m-probability) table EM"
    " linkage weights are fit from, reading as 'which cheap field"
    " agreements predict expensive textual match'. The corpus side is"
    " the standard md5-bounded sample; pair fan-out is block-capped;"
    " everything aggregates map-side to 8 pattern rows.",
)
def q_linkage_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_weather_spark.operators.dedup import _checkpoint

    docs = load_table(spark, sf_dir, "documents")
    # Cap FIRST on (h, doc_id) alone, THEN compute tok0/grams on the
    # survivors (guide §2.3 — project/compute after the cut, not
    # before): the old single-select built the bigram arrays for EVERY
    # corpus row and carried them through the global TakeOrdered heap.
    # Checkpointed because the self-join below consumes it twice (both
    # sides re-evaluated the whole subtree — measured 6.2 s exec).
    capped = (
        docs.filter(F.expr("length(trim(text)) > 0"))
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            "text",
            F.expr(
                "md5(concat('fs_', cast(doc_id as string)))"
            ).alias("h"),
        )
        .orderBy("h", "doc_id")
        .limit(_FS_CAP)
        .drop("h")
    )
    samp = _checkpoint(
        eager=False,
        df=capped.select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.expr("lower(split(trim(text), ' ')[0])").alias("tok0"),
            F.expr(
                "array_distinct(transform("
                " slice(split(trim(text), ' '), 1,"
                "       size(split(trim(text), ' ')) - 1),"
                " (w, k) -> concat(w, '#',"
                "     element_at(split(trim(text), ' '), k + 2))))"
            ).alias("grams"),
        )
    )
    blocks = (
        samp.groupBy("tok0")
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= _FS_BLOCK_CAP)
        .select("tok0")
    )
    a = samp.join(blocks, "tok0")
    b = samp.join(blocks, "tok0").select(
        F.col("tok0").alias("btok"),
        F.col("doc_id").alias("db"),
        F.col("lang").alias("blang"),
        F.col("source").alias("bsource"),
        F.col("n_chars").alias("bchars"),
        F.col("grams").alias("bgrams"),
    )
    pairs = (
        a.join(
            b,
            (F.col("btok") == F.col("tok0"))
            & (F.col("doc_id") < F.col("db")),
        )
        .select(
            (
                (F.col("lang") == F.col("blang")).cast("int") * 4
                + (F.col("source") == F.col("bsource")).cast("int") * 2
                + (
                    F.expr(f"n_chars div {_FS_LEN_BAND}")
                    == F.expr(f"bchars div {_FS_LEN_BAND}")
                ).cast("int")
            )
            .cast("bigint")
            .alias("pattern"),
            F.expr("size(array_intersect(grams, bgrams))").alias("inter"),
            F.expr(
                "size(grams) + size(bgrams)"
                " - size(array_intersect(grams, bgrams))"
            ).alias("uni"),
        )
    )
    hit = (
        F.col("inter") * _FS_JACC_DEN >= F.col("uni") * _FS_JACC_NUM
    ).cast("int")
    return pairs.groupBy("pattern").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(hit).cast("bigint").alias("n_match"),
        F.expr(
            f"CAST(sum(CASE WHEN inter * {_FS_JACC_DEN}"
            f" >= uni * {_FS_JACC_NUM} THEN 1 ELSE 0 END) * 1000"
            " div count(*) AS BIGINT)"
        ).alias("match_pm"),
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter EM weight fitting over the agreement-pattern table
# ---------------------------------------------------------------------------

_EM_S = 1_000_000   # probability fixed point
_EM_ROUNDS = 5
_EM_P0 = _EM_S // 10
_EM_M0 = 8 * _EM_S // 10
_EM_U0 = _EM_S // 10


def _em_round_sql(k: int) -> str:
    """One EM round as a CTE pair: resp{k} (per-pattern responsibility
    under the r{k-1} parameters) and r{k} (the M-step update). All
    integer floor divisions at the _EM_S fixed point — identical
    truncation on both engines."""
    S = f"CAST({_EM_S} AS BIGINT)"
    prev = f"r{k - 1}"

    def w(pcol: str, f2: str, f1: str, f0: str) -> str:
        t2 = f"(CASE WHEN b2 = 1 THEN {f2} ELSE {S} - {f2} END)"
        t1 = f"(CASE WHEN b1 = 1 THEN {f1} ELSE {S} - {f1} END)"
        t0 = f"(CASE WHEN b0 = 1 THEN {f0} ELSE {S} - {f0} END)"
        return (
            f"((((({pcol} * {t2}) // {S}) * {t1}) // {S})"
            f" * {t0}) // {S}"
        )

    wm = w("r.p", "r.m2", "r.m1", "r.m0")
    wu = w(f"({S} - r.p)", "r.u2", "r.u1", "r.u0")
    return f"""resp{k} AS (
            SELECT n_pairs, b2, b1, b0,
                   (({wm}) * {S})
                       // greatest(({wm}) + ({wu}), 1) AS resp
            FROM pats CROSS JOIN {prev} r
        ),
        r{k} AS (
            SELECT
              CAST(sum(n_pairs * resp)
                   // greatest(sum(n_pairs), 1) AS BIGINT) AS p,
              CAST(sum(n_pairs * resp * b2) * {S}
                   // greatest(sum(n_pairs * resp), 1) AS BIGINT) AS m2,
              CAST(sum(n_pairs * resp * b1) * {S}
                   // greatest(sum(n_pairs * resp), 1) AS BIGINT) AS m1,
              CAST(sum(n_pairs * resp * b0) * {S}
                   // greatest(sum(n_pairs * resp), 1) AS BIGINT) AS m0,
              CAST(sum(n_pairs * ({S} - resp) * b2) * {S}
                   // greatest(sum(n_pairs * ({S} - resp)), 1)
                   AS BIGINT) AS u2,
              CAST(sum(n_pairs * ({S} - resp) * b1) * {S}
                   // greatest(sum(n_pairs * ({S} - resp)), 1)
                   AS BIGINT) AS u1,
              CAST(sum(n_pairs * ({S} - resp) * b0) * {S}
                   // greatest(sum(n_pairs * ({S} - resp)), 1)
                   AS BIGINT) AS u0
            FROM resp{k}
        )"""


def _em_oracle() -> str:
    rounds = ",\n        ".join(
        _em_round_sql(k) for k in range(1, _EM_ROUNDS + 1)
    )
    last = f"r{_EM_ROUNDS}"
    S = f"CAST({_EM_S} AS BIGINT)"
    # final responsibilities under the LAST round's parameters (one
    # more E-step, no M-step), emitted per pattern with the params
    t2 = f"(CASE WHEN b2 = 1 THEN r.m2 ELSE {S} - r.m2 END)"
    t1 = f"(CASE WHEN b1 = 1 THEN r.m1 ELSE {S} - r.m1 END)"
    t0 = f"(CASE WHEN b0 = 1 THEN r.m0 ELSE {S} - r.m0 END)"
    s2 = f"(CASE WHEN b2 = 1 THEN r.u2 ELSE {S} - r.u2 END)"
    s1 = f"(CASE WHEN b1 = 1 THEN r.u1 ELSE {S} - r.u1 END)"
    s0 = f"(CASE WHEN b0 = 1 THEN r.u0 ELSE {S} - r.u0 END)"
    wm = f"(((((r.p * {t2}) // {S}) * {t1}) // {S}) * {t0}) // {S}"
    wu = (
        f"((((({S} - r.p) * {s2}) // {S}) * {s1}) // {S})"
        f" * {s0} // {S}"
    )
    return f"""
        WITH {{prefix}},
        patterns AS (
            {{pattern_select}}
        ),
        pats AS (
            SELECT pattern, n_pairs,
                   pattern // 4 % 2 AS b2,
                   pattern // 2 % 2 AS b1,
                   pattern % 2 AS b0
            FROM patterns
        ),
        r0 AS (SELECT CAST({_EM_P0} AS BIGINT) AS p,
                      CAST({_EM_M0} AS BIGINT) AS m2,
                      CAST({_EM_M0} AS BIGINT) AS m1,
                      CAST({_EM_M0} AS BIGINT) AS m0,
                      CAST({_EM_U0} AS BIGINT) AS u2,
                      CAST({_EM_U0} AS BIGINT) AS u1,
                      CAST({_EM_U0} AS BIGINT) AS u0),
        {rounds}
        SELECT pats.pattern, pats.n_pairs,
               CAST((({wm}) * {S})
                    // greatest(({wm}) + ({wu}), 1) AS BIGINT)
                   AS resp_fx,
               CAST(r.p AS BIGINT) AS p_hat_fx,
               CAST(r.m2 AS BIGINT) AS m_lang_fx,
               CAST(r.m1 AS BIGINT) AS m_source_fx,
               CAST(r.m0 AS BIGINT) AS m_band_fx,
               CAST(r.u2 AS BIGINT) AS u_lang_fx,
               CAST(r.u1 AS BIGINT) AS u_source_fx,
               CAST(r.u0 AS BIGINT) AS u_band_fx
        FROM pats CROSS JOIN {last} r
    """


@register(
    "q_linkage_em",
    oracle=_em_oracle().format(
        prefix=_FS_PREFIX_CTES, pattern_select=_FS_PATTERN_SELECT
    ),
    doc="Fellegi-Sunter EM weight fitting — the UNSUPERVISED step the"
    " agreement-pattern table (q_linkage_patterns) exists to feed:"
    f" {_EM_ROUNDS} EM rounds estimate the latent match prevalence p"
    " and per-field m/u probabilities from pattern frequencies alone"
    " (no ground-truth labels), then a final E-step emits each"
    " pattern's match responsibility. The whole fit runs in"
    f" {_EM_S:.0e}-scale integer fixed point — every product chain"
    " floor-divides at each step, so the parameter trajectory is"
    " bit-identical on Spark (bounded Python ints over the COLLECTED"
    " 8-row pattern table — the markov/dbscan bounded-driver"
    " precedent) and DuckDB (fully unrolled CTE rounds). Scale: the"
    " corpus-side work is q_linkage_patterns' blocked pair build;"
    " the EM itself is 8-row arithmetic wherever it runs.",
)
def q_linkage_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    S = _EM_S
    pat_rows = (
        q_linkage_patterns(spark, sf_dir)
        .select("pattern", "n_pairs")
        .collect()  # bounded: <= 8 agreement patterns, documented
    )
    pats = [
        (
            int(r["pattern"]),
            int(r["n_pairs"]),
            (int(r["pattern"]) // 4) % 2,
            (int(r["pattern"]) // 2) % 2,
            int(r["pattern"]) % 2,
        )
        for r in pat_rows
    ]
    p, m, u = _EM_P0, [_EM_M0] * 3, [_EM_U0] * 3

    def weights(pv, fv, b):
        # fv indexed [b2, b1, b0] to mirror the SQL's m2/m1/m0 order
        t = [fv[i] if b[i] == 1 else S - fv[i] for i in range(3)]
        return ((((pv * t[0]) // S) * t[1]) // S) * t[2] // S

    for _ in range(_EM_ROUNDS):
        sn = sr = 0
        srb = [0, 0, 0]
        snr = 0
        snrb = [0, 0, 0]
        for _pat, n, b2, b1, b0 in pats:
            b = (b2, b1, b0)
            wm = weights(p, m, b)
            wu = weights(S - p, u, b)
            resp = (wm * S) // max(wm + wu, 1)
            sn += n
            sr += n * resp
            snr += n * (S - resp)
            for i, bit in enumerate(b):
                srb[i] += n * resp * bit
                snrb[i] += n * (S - resp) * bit
        p = sr // max(sn, 1)
        m = [(srb[i] * S) // max(sr, 1) for i in range(3)]
        u = [(snrb[i] * S) // max(snr, 1) for i in range(3)]

    out = []
    for pat, n, b2, b1, b0 in pats:
        b = (b2, b1, b0)
        wm = weights(p, m, b)
        wu = weights(S - p, u, b)
        resp = (wm * S) // max(wm + wu, 1)
        out.append(
            (pat, n, resp, p, m[0], m[1], m[2], u[0], u[1], u[2])
        )
    return local_df(
        spark,
        out,
        "pattern bigint, n_pairs bigint, resp_fx bigint,"
        " p_hat_fx bigint, m_lang_fx bigint, m_source_fx bigint,"
        " m_band_fx bigint, u_lang_fx bigint, u_source_fx bigint,"
        " u_band_fx bigint",
    )
