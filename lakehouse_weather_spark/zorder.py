"""Z-order (Morton-code) multi-dimensional clustering — the engine's
equivalent of Delta's OPTIMIZE ZORDER BY.

Sorting a table by the bit-interleaved rank of several columns makes
every written file cover a small hyper-rectangle of the key space, so
min/max file statistics can skip files for predicates on ANY of the
z-ordered columns (a plain sort only helps the leading column). At
100 TB this is the difference between scanning 1% and 100% of files for
a selective 2-column predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 bits/dim = 256 quantile buckets per column, 65536 z-cells — plenty
# of resolution for file-level min/max skipping while keeping the
# boundary arrays small
_BITS = 8


def _quantile_cuts(
    df: DataFrame, cols: list[str], bits: int, relative_error: float = 0.001
) -> dict[str, list[float]]:
    """2^bits-quantile cut points per column via approxQuantile
    (Greenwald-Khanna sketch: one distributed pass, tiny driver
    result). Rank-based normalization handles skew; a global
    ``percent_rank`` window would funnel the whole table through ONE
    task — the opposite of this module's purpose."""
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    all_cuts = df.approxQuantile(cols, probs, relative_error)
    return dict(zip(cols, all_cuts))


def _bucket_by_cuts(col: str, cuts: list[float]) -> Column:
    """0..len(cuts) bucket index of ``col`` against sorted cut points:
    a narrow per-row fold over the boundary array literal (no shuffle,
    no window)."""
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(F.col(col).cast("double") >= b, 1).otherwise(0).cast("long"),
    )


def morton_code(a: Column, b: Column, bits: int = _BITS) -> Column:
    """Interleave the low ``bits`` bits of two long columns (a even
    positions, b odd) into a single z-order rank."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_write(
    df: DataFrame, out_dir: str, col_a: str, col_b: str, n_files: int = 8
) -> None:
    """Write ``df`` into ``n_files`` files clustered by the z-order of
    (col_a, col_b): quantile-bucket both columns (one sketch pass),
    interleave bits, and range-partition + sort by the Morton code."""
    cuts = _quantile_cuts(df, [col_a, col_b], _BITS)
    ranked = df.withColumn("_za", _bucket_by_cuts(col_a, cuts[col_a])).withColumn(
        "_zb", _bucket_by_cuts(col_b, cuts[col_b])
    )
    coded = ranked.withColumn("_z", morton_code(F.col("_za"), F.col("_zb")))
    (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_za", "_zb", "_z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


# ---------------------------------------------------------------------------
# Registered z-order effectiveness audit (deterministic, oracle-checked)
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from lakehouse_weather_spark.registry import register  # noqa: E402
from lakehouse_weather_spark.sources.tables import load_table  # noqa: E402

_ZP_BITS = 4                 # 16 buckets/dim, 256 z-cells
_ZP_FILES = 64               # simulated file count per layout
_ZP_SAMPLE = 1009
_ZP_PRED_BUCKET = 7          # predicate: totalprice in bucket 7 of 16

_ZP_H_SPARK = (
    "cast(conv(substr(md5(concat('zp_', cast(o_orderkey as string))),"
    " 1, 15), 16, 10) as bigint)"
)
_ZP_H_DUCK = (
    "CAST(('0x' || substr(md5('zp_' || CAST(o_orderkey AS VARCHAR)),"
    " 1, 15)) AS BIGINT)"
)


def _interleave_sql(zc: str, zp: str, bits: int, idiv: str = "div") -> str:
    """Morton interleave via pure integer-division/mod arithmetic
    (bitwise operator precedence differs between the two SQL parsers,
    arithmetic doesn't). ``idiv`` is the engine's integer-division
    operator: Spark ``div``, DuckDB ``//`` — operands are non-negative
    so trunc/floor agree."""
    terms = []
    for b in range(bits):
        terms.append(f"((({zc}) {idiv} {1 << b}) % 2) * {1 << (2 * b + 1)}")
        terms.append(f"((({zp}) {idiv} {1 << b}) % 2) * {1 << (2 * b)}")
    return " + ".join(terms)


def _zp_cuts_sql(col: str, engine: str, typ: str) -> str:
    """Engine SQL for the deterministic equi-depth cut points of one
    column (the q_range_split_points machinery at 2^_ZP_BITS buckets).
    COALESCE to an empty list: on tables smaller than the sample's cut
    positions DuckDB's list() over zero rows is NULL while Spark's
    collect_list is an empty array — both must bucket everything to 0."""
    n = 1 << _ZP_BITS
    ks = ", ".join(
        str((k * _ZP_SAMPLE) // n) for k in range(1, n)
    )
    if engine == "duck":
        return f"""
            SELECT COALESCE(list_sort(list(v)), CAST([] AS {typ}[]))
                       AS cuts FROM (
                SELECT v, row_number() OVER (ORDER BY v) AS rn FROM (
                    SELECT {col} AS v FROM orders
                    ORDER BY {_ZP_H_DUCK}, o_orderkey
                    LIMIT {_ZP_SAMPLE}
                )
            ) WHERE rn IN ({ks})
        """
    raise ValueError(engine)


def _zp_cuts_df(orders: DataFrame, col: str) -> DataFrame:
    """Spark side of _zp_cuts_sql: deterministic sampled equi-depth cut
    points of one orders column (shared by q_zorder_prune and
    q_hilbert_prune — one whitelisted bounded-window site)."""
    from pyspark.sql import Window

    sample = (
        orders.select(
            F.col(col).alias("v"),
            F.expr(_ZP_H_SPARK).alias("h"),
            "o_orderkey",
        )
        .orderBy("h", "o_orderkey")
        .limit(_ZP_SAMPLE)
    )
    ranked = sample.select(
        "v", F.row_number().over(Window.orderBy("v")).alias("rn")
    )
    n = 1 << _ZP_BITS
    ks = [(k * _ZP_SAMPLE) // n for k in range(1, n)]
    return ranked.filter(F.col("rn").isin(ks)).agg(
        F.sort_array(F.collect_list("v")).alias("cuts")
    )


def warm_zorder_cuts(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the two equi-depth cut tables (o_custkey /
    o_totalprice) that both layout audits consume — per-corpus ingest
    layout statistics, warmed from the bench's single substrate list."""
    from lakehouse_weather_spark.operators.dedup import _substrate

    orders = load_table(spark, sf_dir, "orders")
    for col in ("o_custkey", "o_totalprice"):
        _substrate(
            spark,
            ("zp_cuts", sf_dir, col),
            lambda col=col: _zp_cuts_df(orders, col),
            table="orders",
        )


def _zp_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(zc, zp, hmod) grid coordinates of every order — the shared
    front half of both layout-effectiveness audits.

    The two 1-row cut tables (a deterministic sampled TakeOrdered +
    rank window over orders each) are substrate-memoized per corpus:
    q_zorder_prune and q_hilbert_prune both consume the identical
    cuts, and each broadcast otherwise re-ran the sample job per
    query (guide §5 — the repo's substrate pattern)."""
    from lakehouse_weather_spark.operators.dedup import _substrate

    orders = load_table(spark, sf_dir, "orders")
    cc = _substrate(
        spark,
        ("zp_cuts", sf_dir, "o_custkey"),
        lambda: _zp_cuts_df(orders, "o_custkey"),
        table="orders",
    ).withColumnRenamed("cuts", "cuts_c")
    cp = _substrate(
        spark,
        ("zp_cuts", sf_dir, "o_totalprice"),
        lambda: _zp_cuts_df(orders, "o_totalprice"),
        table="orders",
    ).withColumnRenamed("cuts", "cuts_p")
    return (
        orders.crossJoin(F.broadcast(cc))
        .crossJoin(F.broadcast(cp))
        .select(
            F.expr("size(filter(cuts_c, c -> c < o_custkey))").alias("zc"),
            F.expr("size(filter(cuts_p, c -> c < o_totalprice))").alias("zp"),
            (F.expr(_ZP_H_SPARK) % (1 << _ZP_BITS)).alias("hmod"),
        )
    )


@register(
    "q_zorder_prune",
    oracle=f"""
        WITH cc AS ({_zp_cuts_sql('o_custkey', 'duck', 'BIGINT')}),
        cp AS ({_zp_cuts_sql('o_totalprice', 'duck', 'DOUBLE')}),
        bucketed AS (
            SELECT len(list_filter(cc.cuts, c -> c < o.o_custkey)) AS zc,
                   len(list_filter(cp.cuts, c -> c < o.o_totalprice)) AS zp,
                   ({_ZP_H_DUCK.replace('o.', '')}) % {1 << _ZP_BITS} AS hmod
            FROM orders o, cc, cp
        ),
        filed AS (
            SELECT zc, zp,
                   ({_interleave_sql('zc', 'zp', _ZP_BITS, '//')})
                       * {_ZP_FILES} // {1 << (2 * _ZP_BITS)} AS file_z,
                   (zc * {1 << _ZP_BITS} + zp)
                       * {_ZP_FILES} // {1 << (2 * _ZP_BITS)} AS file_lin2,
                   (zc * {1 << _ZP_BITS} + hmod)
                       * {_ZP_FILES} // {1 << (2 * _ZP_BITS)} AS file_lin1
            FROM bucketed
        )
        SELECT layout,
               CAST(count(DISTINCT f) AS BIGINT) AS n_files,
               CAST(count(DISTINCT CASE WHEN zp = {_ZP_PRED_BUCKET}
                                        THEN f END) AS BIGINT)
                   AS files_touched,
               CAST(sum(CASE WHEN zp = {_ZP_PRED_BUCKET} THEN 1 ELSE 0 END)
                    AS BIGINT) AS rows_matched
        FROM (
            SELECT 'sort_custkey_only' AS layout, file_lin1 AS f, zp
            FROM filed
            UNION ALL
            SELECT 'sort_custkey_price', file_lin2, zp FROM filed
            UNION ALL
            SELECT 'zorder', file_z, zp FROM filed
        )
        GROUP BY layout
    """,
    doc=f"Z-ORDER file-skipping effectiveness, measured: bucket orders"
    f" into a {1 << _ZP_BITS}x{1 << _ZP_BITS} (custkey, totalprice)"
    f" grid via deterministic sampled equi-depth cuts, lay the rows"
    f" into {_ZP_FILES} simulated files three ways — custkey sort with"
    " unordered remainder, (custkey, price) compound sort, and"
    " Morton-interleaved z-value — and count how many files a"
    " selective predicate on the SECOND column (one totalprice band,"
    " no custkey constraint) must touch. Measured on the fixture:"
    " custkey-only touches ALL files (the band smears across every"
    " stripe), the compound sort touches one file per stripe, and"
    " z-order halves that again by folding both dimensions into"
    " every file's extent — the justification for zorder.py's"
    " OPTIMIZE ZORDER writer at 100 TB, where file-skip ratios are"
    " the scan bill. Deterministic end-to-end (sampled cuts,"
    " arithmetic bit interleave), so even file assignments"
    " oracle-match.",
)
def q_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucketed = _zp_bucketed(spark, sf_dir)
    filed = bucketed.select(
        "zp",
        F.expr(
            f"({_interleave_sql('zc', 'zp', _ZP_BITS)})"
            f" * {_ZP_FILES} div {1 << (2 * _ZP_BITS)}"
        ).alias("file_z"),
        F.expr(
            f"(zc * {1 << _ZP_BITS} + zp)"
            f" * {_ZP_FILES} div {1 << (2 * _ZP_BITS)}"
        ).alias("file_lin2"),
        F.expr(
            f"(zc * {1 << _ZP_BITS} + hmod)"
            f" * {_ZP_FILES} div {1 << (2 * _ZP_BITS)}"
        ).alias("file_lin1"),
    )
    both = (
        filed.select(
            F.lit("sort_custkey_only").alias("layout"),
            F.col("file_lin1").alias("f"),
            "zp",
        )
        .unionByName(
            filed.select(
                F.lit("sort_custkey_price").alias("layout"),
                F.col("file_lin2").alias("f"),
                "zp",
            )
        )
        .unionByName(
            filed.select(
                F.lit("zorder").alias("layout"),
                F.col("file_z").alias("f"),
                "zp",
            )
        )
    )
    hit = F.when(F.col("zp") == _ZP_PRED_BUCKET, F.col("f"))
    return both.groupBy("layout").agg(
        F.countDistinct("f").cast("bigint").alias("n_files"),
        F.countDistinct(hit).cast("bigint").alias("files_touched"),
        F.sum((F.col("zp") == _ZP_PRED_BUCKET).cast("int"))
        .cast("bigint")
        .alias("rows_matched"),
    )


# ---------------------------------------------------------------------------
# Hilbert-curve layout audit: the locality upgrade over Morton order
# ---------------------------------------------------------------------------

# 128 files over the 256-cell grid (2 cells/file): the granularity at
# which Morton's diagonal jumps split the one-band predicate across
# 16 files while Hilbert's continuous walk keeps it in 10 — at the
# 64-file granularity of q_zorder_prune the two tie, which is itself a
# finding: curve choice only pays once files are small vs the grid.
_HP_FILES = 128

def _hilbert_level_sql(s: int, n: int, idiv: str) -> tuple[str, str, str]:
    """One level of the canonical xy2d Hilbert walk over columns
    (hx, hy, hd), as engine-portable arithmetic SQL: rx/ry are the
    level's bits via integer division (operands stay in [0, n), so
    trunc and floor agree), the d increment is the 2-bit Gray code
    ((3*rx) XOR ry) written as a CASE, and the rotation swaps/flips
    the frame for the next level."""
    rx = f"(((hx) {idiv} {s}) % 2)"
    ry = f"(((hy) {idiv} {s}) % 2)"
    d = (
        f"hd + {s * s} * (CASE {rx} * 2 + {ry}"
        " WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 2 END)"
    )
    x = f"CASE WHEN {ry} = 1 THEN hx WHEN {rx} = 1 THEN {n - 1} - hy ELSE hy END"
    y = f"CASE WHEN {ry} = 1 THEN hy WHEN {rx} = 1 THEN {n - 1} - hx ELSE hx END"
    return x, y, d


def _hilbert_duck_ctes() -> str:
    """Chained DuckDB CTEs h1..h{bits} evaluating the Hilbert index of
    (zc, zp) level by level, carrying zp for the predicate."""
    n = 1 << _ZP_BITS
    out = ["h0 AS (SELECT zp, zc AS hx, zp AS hy, 0 AS hd FROM bucketed)"]
    s = n // 2
    lvl = 0
    while s > 0:
        x, y, d = _hilbert_level_sql(s, n, "//")
        out.append(
            f"h{lvl + 1} AS (SELECT zp, {x} AS hx, {y} AS hy,"
            f" {d} AS hd FROM h{lvl})"
        )
        s //= 2
        lvl += 1
    return ",\n        ".join(out), f"h{lvl}"


_HILBERT_CTES, _HILBERT_LAST = _hilbert_duck_ctes()


@register(
    "q_hilbert_prune",
    oracle=f"""
        WITH cc AS ({_zp_cuts_sql('o_custkey', 'duck', 'BIGINT')}),
        cp AS ({_zp_cuts_sql('o_totalprice', 'duck', 'DOUBLE')}),
        bucketed AS (
            SELECT len(list_filter(cc.cuts, c -> c < o.o_custkey)) AS zc,
                   len(list_filter(cp.cuts, c -> c < o.o_totalprice)) AS zp
            FROM orders o, cc, cp
        ),
        {_HILBERT_CTES},
        filed AS (
            SELECT zp,
                   ({_interleave_sql('hx0.zc', 'hx0.zp', _ZP_BITS, '//')})
                       * {_HP_FILES} // {1 << (2 * _ZP_BITS)} AS file_z,
                   NULL AS _unused
            FROM (SELECT zc, zp FROM bucketed) hx0
        ),
        filed_h AS (
            SELECT zp, hd * {_HP_FILES} // {1 << (2 * _ZP_BITS)} AS f
            FROM {_HILBERT_LAST}
        )
        SELECT layout,
               CAST(count(DISTINCT f) AS BIGINT) AS n_files,
               CAST(count(DISTINCT CASE WHEN zp = {_ZP_PRED_BUCKET}
                                        THEN f END) AS BIGINT)
                   AS files_touched,
               CAST(sum(CASE WHEN zp = {_ZP_PRED_BUCKET} THEN 1 ELSE 0 END)
                    AS BIGINT) AS rows_matched
        FROM (
            SELECT 'zorder' AS layout, file_z AS f, zp FROM filed
            UNION ALL
            SELECT 'hilbert', f, zp FROM filed_h
        )
        GROUP BY layout
    """,
    doc=f"Hilbert-curve vs Morton (z-order) file-skipping audit on the"
    f" SAME {1 << _ZP_BITS}x{1 << _ZP_BITS} deterministic equi-depth"
    f" grid as q_zorder_prune, at the finer {_HP_FILES}-file"
    " granularity (2 cells/file) where curve choice actually shows:"
    " the Hilbert index is the canonical xy2d walk unrolled into"
    f" {_ZP_BITS} levels of pure integer CASE/div/mod arithmetic"
    " (validated cell-by-cell against the textbook recursion), so"
    " both engines assign identical file ids and the audit is"
    " bit-exact. Hilbert's no-jump property gives each file a tighter"
    " bounding box than Morton's diagonal discontinuities — this"
    " audit MEASURES that (files touched by a one-band predicate on"
    " the second dimension) instead of asserting it; it is the"
    " decision input for choosing the layout under Delta-style"
    " OPTIMIZE at 100 TB, where the scan bill is the file-skip"
    " ratio.",
)
def q_hilbert_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucketed = _zp_bucketed(spark, sf_dir).select("zc", "zp")
    n = 1 << _ZP_BITS
    # z-order arm: identical to q_zorder_prune's zorder layout
    filed_z = bucketed.select(
        "zp",
        F.expr(
            f"({_interleave_sql('zc', 'zp', _ZP_BITS)})"
            f" * {_HP_FILES} div {1 << (2 * _ZP_BITS)}"
        ).alias("f"),
    ).select(F.lit("zorder").alias("layout"), "f", "zp")
    # hilbert arm: the same unrolled walk, level by level
    h = bucketed.select(
        "zp",
        F.col("zc").alias("hx"),
        F.col("zp").alias("hy"),
        F.lit(0).alias("hd"),
    )
    s = n // 2
    while s > 0:
        x, y, d = _hilbert_level_sql(s, n, "div")
        h = h.select(
            "zp",
            F.expr(x).alias("hx"),
            F.expr(y).alias("hy"),
            F.expr(d).alias("hd"),
        )
        s //= 2
    filed_h = h.select(
        F.lit("hilbert").alias("layout"),
        F.expr(f"hd * {_HP_FILES} div {1 << (2 * _ZP_BITS)}").alias("f"),
        "zp",
    )
    both = filed_z.unionByName(filed_h)
    hit = F.when(F.col("zp") == _ZP_PRED_BUCKET, F.col("f"))
    return both.groupBy("layout").agg(
        F.countDistinct("f").cast("bigint").alias("n_files"),
        F.countDistinct(hit).cast("bigint").alias("files_touched"),
        F.sum((F.col("zp") == _ZP_PRED_BUCKET).cast("int"))
        .cast("bigint")
        .alias("rows_matched"),
    )
