"""Repetition-based document quality filters (training-data closure).

Gopher/C4-style corpus hygiene: beyond the length/punctuation/stopword
signals in ``q_text_quality`` (operators/textops.py), production
pretraining filters remove documents dominated by *repetition* — a few
words or phrases looping (boilerplate, keyword stuffing, scraper junk).
The canonical signals (Rae et al. 2021 "Scaling Language Models:
Gopher", §A1.1) are the duplicate-word fraction, the top-word /
top-bigram concentration, and mean word length bounds.

Everything here is built-in array algebra (split / array_distinct /
transform / filter / aggregate) — per-row, shuffle-free, whole-stage
codegen, no UDF — so the filter runs at scan speed at 100 TB. Ratios
are single IEEE divisions of exact integer counts, so the DuckDB oracle
matches bit-for-bit (see tools/check_oracle.py hashing).

The reference has no quality filtering at all (every crawled page is
chunked and embedded as-is, ``dags/utils/chunks_data.py:24-44``); this
module is the missing pre-training hygiene stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import fan_out, load_table

# Keep-thresholds: a document survives when it is long enough and not
# repetition-dominated. Values chosen to split the synthetic corpus
# (word-soup docs: 10-99 words, dup-word median ~0.54).
MIN_WORDS = 30
MAX_DUP_WORD_FRAC = 0.6
MAX_TOP_WORD_FRAC = 0.15
MAX_TOP_BIGRAM_FRAC = 0.10
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0

_QUALITY_ORACLE = f"""
    WITH s AS (
        SELECT doc_id,
               string_split(text, ' ') AS w,
               len(string_split(text, ' ')) AS n
        FROM documents
    ), b AS (
        SELECT doc_id, w, n,
               CASE WHEN n > 1
                    THEN list_transform(generate_series(1, n - 1),
                                        i -> w[i] || ' ' || w[i + 1])
                    ELSE [] END AS bg
        FROM s
    ), m AS (
        SELECT doc_id,
               CAST(n AS INTEGER) AS n_words,
               1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / n
                   AS dup_word_frac,
               CAST(list_max(list_transform(list_distinct(w),
                        u -> len(list_filter(w, x -> x = u)))) AS DOUBLE)
                   / n AS top_word_frac,
               CASE WHEN n > 1
                    THEN CAST(list_max(list_transform(list_distinct(bg),
                             u -> len(list_filter(bg, x -> x = u)))) AS DOUBLE)
                         / (n - 1)
                    ELSE NULL END AS top_bigram_frac,
               CAST(list_sum(list_transform(w, u -> len(u))) AS DOUBLE) / n
                   AS mean_word_len
        FROM b
    )
    SELECT doc_id, n_words, dup_word_frac, top_word_frac,
           top_bigram_frac, mean_word_len,
           CAST(CASE WHEN n_words >= {MIN_WORDS}
                      AND dup_word_frac <= {MAX_DUP_WORD_FRAC}
                      AND top_word_frac <= {MAX_TOP_WORD_FRAC}
                      AND top_bigram_frac <= {MAX_TOP_BIGRAM_FRAC}
                      AND mean_word_len BETWEEN {MIN_MEAN_WORD_LEN}
                                            AND {MAX_MEAN_WORD_LEN}
                THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM m
"""


@register(
    "q_quality_repetition",
    oracle=_QUALITY_ORACLE,
    doc="Gopher-style repetition filter: duplicate-word fraction,"
    " top-word and top-bigram concentration, mean word length, and the"
    " combined keep decision — all per-row array algebra inside"
    " whole-stage codegen (no shuffle, no UDF), i.e. scan-speed corpus"
    " hygiene at 100 TB. keep emitted as int for engine-neutral"
    " hashing.",
)
def q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    with_words = docs.select(
        "doc_id",
        F.split("text", " ").alias("w"),
        F.size(F.split("text", " ")).alias("n"),
    )
    # n <= 1 guard: sequence(1, 0) is DESCENDING [1, 0] in Spark (not
    # empty like DuckDB's generate_series), so a single-word doc would
    # otherwise produce a garbage bigram array and a top_bigram count
    # of 1 where the oracle yields NULL. Emit an empty array and (below)
    # a NULL top_bigram_frac for degenerate docs on both engines.
    with_bigrams = with_words.select(
        "doc_id",
        "w",
        "n",
        F.expr(
            "IF(n > 1,"
            " transform(sequence(1, n - 1),"
            "  i -> concat(element_at(w, i), ' ', element_at(w, i + 1))),"
            " array())"
        ).alias("bg"),
    )
    w = F.col("w")

    def top_count(arr: str) -> F.Column:
        # max occurrence count of any element: sort + one run-length
        # fold pass — O(n log n) with ~3 lambda evals per element,
        # vs the naive distinct x filter scan's O(n^2). Same integer
        # as the oracle's max-count (max run of a sorted array ==
        # max multiplicity).
        return F.expr(
            f"aggregate(array_sort({arr}),"
            " named_struct('prev', cast(null as string), 'run', 0, 'best', 0),"
            " (acc, x) -> named_struct("
            "   'prev', x,"
            "   'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1),"
            "   'best', greatest(acc.best,"
            "     IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1))),"
            " acc -> acc.best)"
        )

    sum_lens = F.aggregate(
        F.transform(w, lambda u: F.length(u)), F.lit(0), lambda a, x: a + x
    )
    metrics = with_bigrams.select(
        "doc_id",
        F.col("n").alias("n_words"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(w)).cast("double") / F.col("n")
        ).alias("dup_word_frac"),
        (top_count("w").cast("double") / F.col("n")).alias("top_word_frac"),
        F.when(
            F.col("n") > 1, top_count("bg").cast("double") / (F.col("n") - 1)
        ).alias("top_bigram_frac"),
        (sum_lens.cast("double") / F.col("n")).alias("mean_word_len"),
    )
    keep = (
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("dup_word_frac") <= MAX_DUP_WORD_FRAC)
        & (F.col("top_word_frac") <= MAX_TOP_WORD_FRAC)
        & (F.col("top_bigram_frac") <= MAX_TOP_BIGRAM_FRAC)
        & (F.col("mean_word_len") >= MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_WORD_LEN)
    )
    return metrics.withColumn("keep", keep.cast("int"))


def apply_quality_filter(docs: DataFrame) -> DataFrame:
    """Pipeline form: drop repetition-dominated documents. Same
    expressions as q_quality_repetition, reusable in the medallion
    silver stage (pipeline/medallion.py) ahead of dedup + embedding.
    """
    w = F.split("text", " ")
    n = F.size(w)
    dup = F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / n
    topw = (
        F.array_max(
            F.transform(
                F.array_distinct(w),
                lambda u: F.size(F.filter(w, lambda x: x == u)),
            )
        ).cast("double")
        / n
    )
    return docs.filter(
        (n >= MIN_WORDS)
        & (dup <= MAX_DUP_WORD_FRAC)
        & (topw <= MAX_TOP_WORD_FRAC)
    )


# ---------------------------------------------------------------------------
# Cross-document bigram novelty (boilerplate detection)
# ---------------------------------------------------------------------------

# The per-document signals above cannot see text repeated ACROSS
# documents (site chrome, scraper boilerplate, license blocks). Bigram
# novelty measures it without a near-dup pass: the fraction of a
# document's distinct bigrams appearing in no other document. Low
# novelty => the document is assembled from corpus-common phrases.
# All-integer counts and one final IEEE division keep it oracle-exact —
# no perplexity-style log() whose libm rounding differs per engine.
# Scale shape: narrow distinct-bigram explode, ONE df groupBy, one
# join back keyed on the bigram hash (high-cardinality, no skew), one
# per-doc partial-agg groupBy.

# Single-word docs have ZERO bigrams: the n < 2 branch must return an
# EMPTY array (the greatest(n-1, 1) trick that dodges Spark's
# descending sequence(1, 0) would instead fabricate a phantom
# "bigram" out of the lone word, a row the oracle rightly lacks).
_BIGRAMS_SQL = (
    "case when size(split(text, ' ')) < 2"
    " then cast(array() as array<string>)"
    " else array_distinct(transform("
    " sequence(1, size(split(text, ' ')) - 1),"
    " i -> concat_ws(' ', slice(split(text, ' '), i, 2)))) end"
)


@register(
    "q_bigram_novelty",
    oracle="""
        WITH bg AS (
            SELECT DISTINCT doc_id,
                   words[i] || ' ' || words[i + 1] AS b
            FROM (
                SELECT doc_id, string_split(text, ' ') AS words,
                       unnest(generate_series(
                           1, greatest(len(string_split(text, ' ')) - 1, 1)
                       )) AS i
                FROM documents
            )
        ),
        df AS (SELECT b, count(*) AS n_docs FROM bg GROUP BY b),
        per_doc AS (
            SELECT bg.doc_id,
                   count(*) AS n_bigrams,
                   CAST(sum(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_unique
            FROM bg JOIN df USING (b)
            GROUP BY bg.doc_id
        )
        SELECT doc_id, n_bigrams, n_unique,
               CAST(n_unique AS DOUBLE) / n_bigrams AS novelty
        FROM per_doc
    """,
    doc="Cross-document bigram novelty: per doc, the fraction of its"
    " distinct word bigrams that appear in NO other document — the"
    " boilerplate/site-chrome signal per-document metrics cannot see."
    " Narrow distinct-bigram explode, one document-frequency groupBy,"
    " one hash-keyed join back, one per-doc partial agg; integer"
    " counts + a single IEEE division, oracle-exact.",
)
def q_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    bg = docs.select(
        "doc_id", F.explode(F.expr(_BIGRAMS_SQL)).alias("b")
    )
    df = bg.groupBy("b").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        bg.join(df, "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum((F.col("n_docs") == 1).cast("bigint")).alias("n_unique"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "n_unique",
        (F.col("n_unique").cast("double") / F.col("n_bigrams")).alias(
            "novelty"
        ),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (pretraining hygiene)
# ---------------------------------------------------------------------------

# C4/RefinedWeb-style redaction: emails, phone numbers, and bare IPv4
# addresses are replaced with typed placeholder tokens before training.
# Pure regexp_replace — narrow, codegen'd, scan-speed — with patterns
# restricted to constructs whose semantics are identical in Java regex
# (Spark) and RE2 (DuckDB): explicit character classes, no lookaround.
# The fixture corpus has no PII, so the query plants deterministic PII
# spans first and then scrubs them — the oracle replays both steps, so
# the match boundaries themselves are verified cross-engine.

# no backslashes: Spark SQL string literals eat them, DuckDB's don't —
# bracketed classes ([.], [+], [(]) mean the same pattern text works
# verbatim inside both engines' quoted literals
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_PII_IP = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
_PII_PHONE = "[+][0-9]{1,2} [(][0-9]{3}[)] [0-9]{3}-[0-9]{4}"

# plant: every 2nd doc gets an email, every 3rd a phone, every 5th an IP
_PII_PLANT_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 2 = 0 THEN concat(' reach user', doc_id,"
    "   '@mail.example.org') ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' call +1 (555) 010-',"
    "   lpad(cast(doc_id % 10000 as string), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' from 10.1.',"
    "   cast(doc_id % 256 as string), '.7') ELSE '' END)"
)
_PII_PLANT_DUCK = (
    "concat(text,"
    " CASE WHEN doc_id % 2 = 0 THEN concat(' reach user', doc_id,"
    "   '@mail.example.org') ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' call +1 (555) 010-',"
    "   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' from 10.1.',"
    "   CAST(doc_id % 256 AS VARCHAR), '.7') ELSE '' END)"
)


@register(
    "q_pii_redact",
    oracle=f"""
        WITH planted AS (
            SELECT doc_id, {_PII_PLANT_DUCK} AS text FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_PII_EMAIL}'))
                    AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(text, '{_PII_PHONE}'))
                    AS INTEGER) AS n_phones,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{_PII_EMAIL}', '[EMAIL]', 'g'),
                       '{_PII_PHONE}', '[PHONE]', 'g'),
                   '{_PII_IP}', '[IP]', 'g') AS scrubbed
        FROM planted
    """,
    doc="PII scrubbing: emails, phone numbers, and IPv4 addresses"
    " replaced with typed placeholders via chained regexp_replace —"
    " narrow codegen'd scan-speed hygiene. Patterns avoid every"
    " Java-vs-RE2 divergence (no lookaround, explicit classes), and"
    " the oracle replays plant + scrub so match boundaries are"
    " verified cross-engine. Redaction counts emitted per doc.",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id", F.expr(_PII_PLANT_SPARK).alias("text")
    )
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(text,"
        f" '{_PII_EMAIL}', '[EMAIL]'),"
        f" '{_PII_PHONE}', '[PHONE]'),"
        f" '{_PII_IP}', '[IP]')"
    )
    return planted.select(
        "doc_id",
        F.expr(f"size(regexp_extract_all(text, '{_PII_EMAIL}', 0))")
        .cast("int")
        .alias("n_emails"),
        F.expr(f"size(regexp_extract_all(text, '{_PII_PHONE}', 0))")
        .cast("int")
        .alias("n_phones"),
        F.expr(scrub).alias("scrubbed"),
    )


# ---------------------------------------------------------------------------
# Lexical diversity: word-level Simpson index (rational — no log/entropy)
# ---------------------------------------------------------------------------


@register(
    "q_word_diversity",
    oracle="""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        wc AS (
            SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
        )
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_words,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(1 AS DOUBLE)
                   - (CAST(sum(c * c) AS BIGINT)
                      / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)))
                   AS simpson_diversity
        FROM wc GROUP BY doc_id
    """,
    doc="Word-level Simpson diversity index per document:"
    " 1 - sum(c_i^2)/n^2 over word counts — the collision-probability"
    " complement. Low diversity flags template/boilerplate/repetitive"
    " docs that per-word dedup misses (the quality companion to"
    " q_quality_repetition's run-length view). Deliberately Simpson,"
    " not Shannon: entropy needs libm log whose last-ulp rounding"
    " differs per engine, while Simpson is integer sums + one IEEE"
    " multiply/divide/subtract — hash-exact against the oracle. Scale"
    " shape: explode + two partial-agg shuffles keyed on doc_id; at"
    " 100 TB the first agg map-side-combines within partitions, so the"
    " wide explode never hits the shuffle at full width.",
)
def q_word_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c").cast("bigint")
    return wc.groupBy("doc_id").agg(
        n.alias("n_words"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        (
            F.lit(1).cast("double")
            - (
                F.sum(F.col("c") * F.col("c")).cast("bigint")
                / (F.sum("c").cast("double") * F.sum("c").cast("double"))
            )
        ).alias("simpson_diversity"),
    )


# ---------------------------------------------------------------------------
# Gopher rule bundle: per-rule pass/fail booleans
# ---------------------------------------------------------------------------

# Published Gopher repetition-free quality gates (Rae et al. 2021 §A1.1)
# applied as an auditable per-rule scorecard: curation pipelines keep
# the individual booleans (not just the final keep) so ablations can
# re-weight rules without re-scanning the corpus.
G_MIN_WORDS = 50
G_MAX_WORDS = 100_000
G_MIN_MWL = 3.0   # mean word length bounds
G_MAX_MWL = 10.0
G_MAX_SYMBOL_RATIO = 0.1   # '#' or '...' per word
G_MIN_ALPHA_FRAC = 0.8     # words containing >= 1 [a-z]
G_MIN_STOPWORDS = 2        # distinct required stopwords present
_G_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


@register(
    "q_gopher_rules",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS words,
                   length(text) AS n_chars_t
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   len(words) AS n_words,
                   CAST(len(list_filter(words, x -> regexp_matches(x, '[a-z]')))
                        AS BIGINT) AS n_alpha_words,
                   CAST(len(list_filter(words,
                        x -> x IN {_G_STOPS!r})) AS BIGINT) AS n_stop_hits,
                   CAST(len(list_distinct(list_filter(words,
                        x -> x IN {_G_STOPS!r}))) AS BIGINT)
                       AS n_distinct_stops,
                   CAST(list_sum(list_transform(words, x -> length(x)))
                        AS BIGINT) AS sum_word_len,
                   CAST(len(regexp_extract_all(text, '#|\\.\\.\\.'))
                        AS BIGINT) AS n_symbols
            FROM w JOIN documents USING (doc_id)
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               n_words BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS}
                   AS pass_word_count,
               CAST(sum_word_len AS DOUBLE) / n_words AS mean_word_len,
               CAST(sum_word_len AS DOUBLE) / n_words
                   BETWEEN {G_MIN_MWL} AND {G_MAX_MWL} AS pass_mean_word_len,
               CAST(n_symbols AS DOUBLE) / n_words AS symbol_ratio,
               CAST(n_symbols AS DOUBLE) / n_words <= {G_MAX_SYMBOL_RATIO}
                   AS pass_symbol_ratio,
               CAST(n_alpha_words AS DOUBLE) / n_words AS alpha_word_frac,
               CAST(n_alpha_words AS DOUBLE) / n_words >= {G_MIN_ALPHA_FRAC}
                   AS pass_alpha_words,
               n_distinct_stops AS n_distinct_stops,
               n_distinct_stops >= {G_MIN_STOPWORDS} AS pass_stopwords,
               (n_words BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS})
               AND (CAST(sum_word_len AS DOUBLE) / n_words
                    BETWEEN {G_MIN_MWL} AND {G_MAX_MWL})
               AND (CAST(n_symbols AS DOUBLE) / n_words
                    <= {G_MAX_SYMBOL_RATIO})
               AND (CAST(n_alpha_words AS DOUBLE) / n_words
                    >= {G_MIN_ALPHA_FRAC})
               AND (n_distinct_stops >= {G_MIN_STOPWORDS}) AS keep
        FROM m
    """,
    doc="Gopher quality-gate scorecard (Rae et al. 2021 §A1.1): word-"
    " count bounds, mean-word-length bounds, symbol-to-word ratio,"
    " alphabetic-word fraction, and required-stopword presence — each"
    " rule emitted as its own boolean plus the conjunctive keep, the"
    " auditable form curation ablations need (re-weight rules without"
    " re-scanning). Pure per-row array algebra at scan speed (no"
    " shuffle, no UDF, codegen end-to-end); every ratio is one IEEE"
    " division of exact integer counts so the oracle hash-matches.",
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    stops = F.array(*[F.lit(s) for s in _G_STOPS])
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[a-z]")))
    n_dstops = F.size(
        F.array_distinct(F.filter(words, lambda x: F.array_contains(stops, x)))
    )
    sum_wl = F.expr(
        "aggregate(transform(split(text, ' '), x -> length(x)),"
        " 0L, (a, b) -> a + CAST(b AS BIGINT))"
    )
    n_sym = F.size(F.regexp_extract_all("text", F.lit(r"#|\.\.\."), F.lit(0)))
    mwl = sum_wl.cast("double") / n_words
    sym_ratio = n_sym.cast("double") / n_words
    alpha_frac = n_alpha.cast("double") / n_words
    p_wc = n_words.between(G_MIN_WORDS, G_MAX_WORDS)
    p_mwl = (mwl >= G_MIN_MWL) & (mwl <= G_MAX_MWL)
    p_sym = sym_ratio <= G_MAX_SYMBOL_RATIO
    p_alpha = alpha_frac >= G_MIN_ALPHA_FRAC
    p_stop = n_dstops >= G_MIN_STOPWORDS
    return docs.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        p_wc.alias("pass_word_count"),
        mwl.alias("mean_word_len"),
        p_mwl.alias("pass_mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        p_sym.alias("pass_symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        p_alpha.alias("pass_alpha_words"),
        n_dstops.cast("bigint").alias("n_distinct_stops"),
        p_stop.alias("pass_stopwords"),
        (p_wc & p_mwl & p_sym & p_alpha & p_stop).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Code-vs-prose classification signals
# ---------------------------------------------------------------------------

# integer weights for the code-likeness score (fx scale: ratios x 1000,
# floor-divided — exact on both engines)
_CODE_W_SYM = 5
_CODE_W_DIGIT = 2
_CODE_W_LONGTOK = 3


@register(
    "q_text_code_score",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(regexp_replace(
                       text, '[^{{}}()\\[\\];=<>|&]', '', 'g'))
                       AS BIGINT) AS sym_cnt,
                   CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                       AS BIGINT) AS digit_cnt,
                   CAST(length(text) - length(replace(text, '_', ''))
                       AS BIGINT) AS underscore_cnt,
                   CAST(len(list_filter(string_split(text, ' '),
                                        w -> length(w) >= 20))
                       AS BIGINT) AS long_tokens
            FROM documents
        )
        SELECT doc_id, n_chars, sym_cnt, digit_cnt, underscore_cnt,
               long_tokens,
               CAST(
                 ({_CODE_W_SYM} * sym_cnt * 1000) // nullif(n_chars, 0)
                 + ({_CODE_W_DIGIT} * digit_cnt * 1000)
                     // nullif(n_chars, 0)
                 + {_CODE_W_LONGTOK} * long_tokens
               AS BIGINT) AS code_score_fx
        FROM feats
    """,
    doc="Code-vs-prose classification signals per document — the"
    " routing pass an LLM data pipeline runs to send code to a code"
    " tokenizer/quality stack and prose to the Gopher rules: density"
    " of code punctuation ({}()[];=<>|&), digit density, underscore"
    " (snake_case) count, and pathologically long tokens"
    " (minified/encoded blobs), combined into an integer fixed-point"
    " score (ratios x1000, floor-divided — no float drift). Pure"
    " regexp_replace + length arithmetic: narrow, codegen'd,"
    " scan-speed, no explode (the same shape as the PII pass). On"
    " this prose-only fixture scores sit near zero — the signal"
    " columns are the point; thresholds are a consumer policy.",
)
def q_text_code_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.expr("cast(length(text) as bigint)")
    sym = F.expr(
        r"cast(length(regexp_replace(text,"
        r" '[^{}()\\[\\];=<>|&]', '')) as bigint)"
    )
    digit = F.expr(
        "cast(length(regexp_replace(text, '[^0-9]', '')) as bigint)"
    )
    under = F.expr(
        "cast(length(text) - length(replace(text, '_', '')) as bigint)"
    )
    longtok = F.expr(
        "cast(size(filter(split(text, ' '),"
        " w -> length(w) >= 20)) as bigint)"
    )
    feats = docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        sym.alias("sym_cnt"),
        digit.alias("digit_cnt"),
        under.alias("underscore_cnt"),
        longtok.alias("long_tokens"),
    )
    return feats.select(
        "*",
        F.expr(
            f"cast(({_CODE_W_SYM} * sym_cnt * 1000)"
            " div nullif(n_chars, 0)"
            f" + ({_CODE_W_DIGIT} * digit_cnt * 1000)"
            " div nullif(n_chars, 0)"
            f" + {_CODE_W_LONGTOK} * long_tokens as bigint)"
        ).alias("code_score_fx"),
    )


# ---------------------------------------------------------------------------
# Document structure profile (round 9)
# ---------------------------------------------------------------------------

# (name, regex) — counted as split-segments minus one, the portable
# occurrence count (Spark split(limit=-1) and DuckDB
# regexp_split_to_array both keep trailing empties)
_STRUCT_PATTERNS = (
    ("n_lines", r"\n"),
    ("n_headings", r"\n#"),
    ("n_bullets", r"\n[-*] "),
    ("n_code_fences", r"```"),
    ("n_links", r"https?://"),
)


@register(
    "q_doc_structure",
    oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               {sums}
        FROM documents
        GROUP BY source
    """.format(
        sums=",\n               ".join(
            f"CAST(sum(len(regexp_split_to_array(text, '{pat}')) - 1)"
            f" AS BIGINT) AS {name}"
            for name, pat in _STRUCT_PATTERNS
        )
    ),
    doc="Structure-aware document profile per source: line, heading,"
    " bullet, code-fence, and link occurrence counts — the cheap"
    " structural features markdown/code-aware corpus filters cut on"
    " (a 'prose' corpus full of code fences or link farms is a"
    " composition bug q_text_quality's token ratios can't see)."
    " Counting is the portable split-segments-minus-one idiom, one"
    " regex pass per pattern inside the SAME projection — narrow,"
    " shuffle-free until the per-source partial agg; scan-speed at"
    " 100 TB.",
)
def q_doc_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs")]
    for name, pat in _STRUCT_PATTERNS:
        aggs.append(
            F.sum(
                F.expr(f"size(split(text, '{pat}', -1)) - 1")
            ).cast("bigint").alias(name)
        )
    return docs.groupBy("source").agg(*aggs)
