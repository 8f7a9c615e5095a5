"""Scalar-function queries (SURVEY.md §2.8): string / regex / hash / URL /
date / JSON / array / math surface, each mirroring a reference behavior.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen; no Python UDFs anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_weather_spark.registry import register
from lakehouse_weather_spark.sources.tables import load_table


@register(
    "q_str_regex_clean",
    oracle="""
        SELECT doc_id,
               trim(regexp_replace(text, '\\s+', ' ', 'g')) AS clean_text
        FROM documents
    """,
    doc="Whitespace collapse (ref: crawl_web.py:23 re.sub('\\n\\n+', ...)"
    " .strip()) as a vectorized regexp_replace.",
)
def q_str_regex_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim(F.regexp_replace("text", r"\s+", " ")).alias("clean_text"),
    )


@register(
    "q_html_strip",
    oracle="""
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
                                   '\\s+', ' ', 'g')) AS extracted_text
        FROM (
            SELECT doc_id,
                   '<html><head><title>t</title></head><body><p>' || text
                       || '</p><a href="/x">link</a></body></html>' AS html
            FROM documents
        )
    """,
    doc="HTML -> text extraction, SQL-expressible core (ref:"
    " crawl_web.py:14-23 bs4 .text + whitespace collapse): tag-strip"
    " regexp_replace + whitespace collapse, fully codegen'd. The full"
    " bs4 path (entity decoding, script/style removal) lives in the"
    " crawl fetcher behind an import-try.",
)
def q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><head><title>t</title></head><body><p>'),
        F.col("text"),
        F.lit('</p><a href="/x">link</a></body></html>'),
    )
    with_html = docs.select("doc_id", html.alias("html"))
    return with_html.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace("html", "<[^>]*>", " "), r"\s+", " "
            )
        ).alias("extracted_text"),
    )


@register(
    "q_str_sha2",
    oracle="SELECT doc_id, sha256(text) AS content_hash FROM documents",
    doc="sha256 content fingerprint (ref: bronze.py:22, crawl_web.py:59).",
)
def q_str_sha2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.sha2("text", 256).alias("content_hash")
    )


@register(
    "q_str_parse_url",
    oracle="""
        SELECT doc_id,
               regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1) AS path,
               replace(regexp_extract(url, '^[a-z]+://[^/]+(/.*)$', 1), '/', '_')
                   AS mangled
        FROM (
            SELECT doc_id,
                   'https://kttv.gov.vn/' || source || '/post' || doc_id || '.html'
                       AS url
            FROM documents
        )
    """,
    doc="URL host/path parse + '/'→'_' name mangling (ref: bronze.py:75-81"
    " urlparse(url).netloc/path + replace). Spark's parse_url is the"
    " native form; the oracle uses the equivalent regexes.",
)
def q_str_parse_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://kttv.gov.vn/"),
        F.col("source"),
        F.lit("/post"),
        F.col("doc_id").cast("string"),
        F.lit(".html"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.replace(
            F.parse_url("url", F.lit("PATH")), F.lit("/"), F.lit("_")
        ).alias("mangled"),
    )


@register(
    "q_str_filename",
    oracle="""
        SELECT doc_id, key,
               regexp_extract(key, '([^/]+)$', 1) AS basename,
               regexp_extract(key, '([^/]+)\\.[a-z]+$', 1) AS stem,
               regexp_extract(key, '([^/]+)\\.[a-z]+$', 1) || '_chunked.json'
                   AS chunked_name
        FROM (
            SELECT doc_id,
                   'crawl_web/2024-12-26/' || source || '_' || doc_id || '.json'
                       AS key
            FROM documents
        )
    """,
    doc="Filename munging: strip prefix, basename, splitext, '_chunked'"
    " suffix (ref: chunks_data.py:7-26).",
)
def q_str_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.concat(
        F.lit("crawl_web/2024-12-26/"),
        F.col("source"),
        F.lit("_"),
        F.col("doc_id").cast("string"),
        F.lit(".json"),
    )
    with_key = docs.select("doc_id", key.alias("key"))
    stem = F.regexp_extract("key", r"([^/]+)\.[a-z]+$", 1)
    return with_key.select(
        "doc_id",
        "key",
        F.regexp_extract("key", r"([^/]+)$", 1).alias("basename"),
        stem.alias("stem"),
        F.concat(stem, F.lit("_chunked.json")).alias("chunked_name"),
    )


@register(
    "q_str_endswith",
    oracle="""
        SELECT doc_id, fname,
               (lower(fname) LIKE '%.pdf') AS is_pdf
        FROM (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN source || '.PDF'
                        ELSE source || '.html' END AS fname
            FROM documents
        )
    """,
    doc="Extension / content-type dispatch test (ref: crawl_web.py:127,"
    "135,138 url.lower().endswith('.pdf')).",
)
def q_str_endswith(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fname = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.col("source"), F.lit(".PDF"))
    ).otherwise(F.concat(F.col("source"), F.lit(".html")))
    with_f = docs.select("doc_id", fname.alias("fname"))
    return with_f.select(
        "doc_id", "fname", F.lower("fname").endswith(".pdf").alias("is_pdf")
    )


@register(
    "q_str_extra",
    oracle="""
        SELECT doc_id,
               levenshtein(source, 'src0') AS edit_dist,
               lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
               reverse(source) AS rev_source,
               translate(source, 'rs', 'RS') AS swapped,
               repeat('ab', 3) || source AS prefixed
        FROM documents
    """,
    doc="Extended string surface: levenshtein edit distance (fuzzy-match"
    " dedup primitive), lpad (stable ids), reverse, translate, repeat —"
    " all JVM built-ins with exact cross-engine semantics.",
)
def q_str_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.levenshtein("source", F.lit("src0")).alias("edit_dist"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("padded_id"),
        F.reverse("source").alias("rev_source"),
        F.translate("source", "rs", "RS").alias("swapped"),
        F.concat(F.repeat(F.lit("ab"), 3), F.col("source")).alias("prefixed"),
    )


@register(
    "q_histogram",
    oracle="""
        SELECT CAST(least(floor((o_totalprice - 1000.0) / 50000.0), 9) AS INTEGER)
                   AS bucket,
               count(*) AS cnt,
               min(o_totalprice) AS bucket_min,
               max(o_totalprice) AS bucket_max
        FROM orders
        GROUP BY 1
    """,
    doc="Value-distribution histogram: arithmetic bucketing of order"
    " totals into 10 fixed-width bins (the data-profiling histogram"
    " pass; identical floor arithmetic both engines).",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor((F.col("o_totalprice") - 1000.0) / 50000.0), F.lit(9)
    ).cast("int")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("o_totalprice").alias("bucket_min"),
        F.max("o_totalprice").alias("bucket_max"),
    )


@register(
    "q_date_format",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_day,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
        FROM orders
    """,
    doc="Date formatting / extraction (ref: bronze.py:53 strftime"
    " '%Y-%m-%d' partition values).",
)
def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    )


@register(
    "q_json_roundtrip",
    oracle="""
        SELECT event_id,
               CAST(try_cast(props AS JSON)->>'k' AS BIGINT) AS k,
               (try_cast(props AS JSON)->>'k') IS NOT NULL AS has_k
        FROM events
    """,
    doc="JSON field extraction (ref: json.loads at minio_io_manager.py:79;"
    " canonical json.dumps at bronze.py:21). from_json/get_json_object"
    " on the events.props JSON column.",
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.cast("bigint").alias("k"),
        k.isNotNull().alias("has_k"),
    )


@register(
    "q_variant_extract",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(try_cast(props AS JSON)->>'k') AS BIGINT)
                   AS n_with_k,
               CAST(sum(CAST(try_cast(props AS JSON)->>'k' AS BIGINT))
                   AS BIGINT) AS sum_k,
               CAST(min(CAST(try_cast(props AS JSON)->>'k' AS BIGINT))
                   AS BIGINT) AS min_k,
               CAST(max(CAST(try_cast(props AS JSON)->>'k' AS BIGINT))
                   AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
    """,
    doc="Semi-structured VARIANT path (Spark 4): props parses ONCE into"
    " an open VariantType value (try_parse_json — malformed/empty rows"
    " become NULL, never an error) and fields extract with"
    " try_variant_get, the schema-on-read shape that replaces"
    " per-field get_json_object re-parsing when a payload has many"
    " fields. Variant's binary encoding decodes ~10x faster than"
    " repeated JSON string parsing and predicate pushdown survives"
    " shredding; output stays scalar per event type so the audit is"
    " cells, not rows. Companion to q_json_roundtrip (the string-path"
    " twin).",
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.expr(
        "try_variant_get(try_parse_json(props), '$.k', 'bigint')"
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count(k).cast("bigint").alias("n_with_k"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


@register(
    "q_array_explode",
    oracle="""
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    """,
    doc="Array construction + explode (ref: links list build + doc-list"
    " flatten, crawl_web.py:90-94,143-158) — flatMap as explode.",
)
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))


@register(
    "q_scalar_mix",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
               abs(l_discount - 0.05) AS disc_dev,
               CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
               CAST(year(l_shipdate) AS INTEGER) AS ship_year,
               CAST(datediff('day', TIMESTAMP '1995-01-01', l_shipdate) AS INTEGER)
                   AS days_since_95,
               upper(l_returnflag) || '-' || lower(l_linestatus) AS flag_status,
               substr(l_returnflag, 1, 1) AS flag1
        FROM lineitem
    """,
    doc="Core math/date/string scalar mix (DERIVED closure, SURVEY §2.8):"
    " arithmetic, abs, floor, year, datediff, concat, upper/lower, substr."
    " Per-row arithmetic is left unrounded: IEEE ops in identical order"
    " are bit-identical across engines.",
)
def q_scalar_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.year("l_shipdate").alias("ship_year"),
        F.datediff(
            F.col("l_shipdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        ).alias("days_since_95"),
        F.concat(
            F.upper("l_returnflag"), F.lit("-"), F.lower("l_linestatus")
        ).alias("flag_status"),
        F.substring("l_returnflag", 1, 1).alias("flag1"),
    )


@register(
    "q_map_histogram",
    oracle="""
        SELECT user_id,
               CAST(coalesce(sum(CASE WHEN event_type = 'click'
                                      THEN 1 END), 0) AS BIGINT) AS n_click,
               CAST(coalesce(sum(CASE WHEN event_type = 'error'
                                      THEN 1 END), 0) AS BIGINT) AS n_error,
               CAST(count(DISTINCT event_type) AS INTEGER) AS n_types,
               CAST(count(*) AS BIGINT) AS n_total
        FROM events
        -- complete cases: Spark's map_from_entries THROWS on a NULL
        -- map key, so NULL event_type rows are excluded on both sides
        WHERE event_type IS NOT NULL
        GROUP BY user_id
    """,
    doc="Map-type surface: per-user event-type histogram built as a"
    " MAP column (map_from_entries over collected (type, count)"
    " structs), then consumed with element_at / size / map_values +"
    " aggregate. The map is an intermediate — outputs are scalars, so"
    " the result is deterministic even though map iteration order is"
    " not, and the DuckDB oracle replays it with plain conditional"
    " aggregation. The per-user map is the feature-vector shape"
    " downstream ML featurization reads.",
)
def q_map_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL event_type excluded (mirrored in the oracle): a NULL map
    # key makes map_from_entries throw at runtime
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mapped = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("type_map")
    )
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at("type_map", F.lit("click")), F.lit(0)).alias(
            "n_click"
        ),
        F.coalesce(F.element_at("type_map", F.lit("error")), F.lit(0)).alias(
            "n_error"
        ),
        F.size("type_map").alias("n_types"),
        F.aggregate(
            F.map_values("type_map"),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("n_total"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-pipeline closure)
# ---------------------------------------------------------------------------

# The reference's visited-set dedup compares raw URL strings
# (``dags/utils/crawl_web.py:114-122``), so `HTTP://Host/a/` and
# `http://host/a?b=1&a=2` recrawl the same page. Canonicalization is
# pure engine-portable string algebra: lowercase scheme+host, strip the
# scheme's default port and a leading `www.`, drop the fragment,
# normalize an empty path to `/` and strip a trailing slash elsewhere,
# and sort the query parameters. Narrow, shuffle-free, codegen'd —
# scan-speed at 100 TB; the canonical key is what the visited-set
# anti-join and content dedup should group on.


def _canon_url_sql(url: str) -> str:
    """Spark SQL expression for the canonical form of ``url``."""
    proto = f"lower(regexp_extract({url}, '^([A-Za-z]+)://', 1))"
    hostport = f"lower(regexp_extract({url}, '^[A-Za-z]+://([^/?#]+)', 1))"
    host = (
        f"regexp_replace(regexp_replace({hostport},"
        f" CASE WHEN {proto} = 'http' THEN ':80$'"
        f"      WHEN {proto} = 'https' THEN ':443$'"
        f"      ELSE 'a^' END, ''),"
        " '^www\\\\.', '')"
    )
    raw_path = f"regexp_extract({url}, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)"
    path = (
        f"CASE WHEN {raw_path} = '' THEN '/'"
        f" WHEN length({raw_path}) > 1 AND {raw_path} LIKE '%/'"
        f" THEN substr({raw_path}, 1, length({raw_path}) - 1)"
        f" ELSE {raw_path} END"
    )
    query = f"regexp_extract({url}, '\\\\?([^#]*)', 1)"
    sorted_q = f"concat_ws('&', sort_array(split({query}, '&')))"
    return (
        f"concat({proto}, '://', {host}, {path},"
        f" CASE WHEN {query} = '' THEN '' ELSE concat('?', {sorted_q}) END)"
    )


def canonical_url_col(url_col: str) -> F.Column:
    """Canonical URL as a Column — usable standalone (e.g. keying the
    crawl visited set) and by q_url_canonical."""
    return F.expr(_canon_url_sql(url_col))


def _canon_url_duck(url: str) -> str:
    """The identical canonicalization in DuckDB SQL."""
    proto = f"lower(regexp_extract({url}, '^([A-Za-z]+)://', 1))"
    hostport = f"lower(regexp_extract({url}, '^[A-Za-z]+://([^/?#]+)', 1))"
    host = (
        f"regexp_replace(regexp_replace({hostport},"
        f" CASE WHEN {proto} = 'http' THEN ':80$'"
        f"      WHEN {proto} = 'https' THEN ':443$'"
        f"      ELSE 'a^' END, ''),"
        " '^www\\.', '')"
    )
    raw_path = f"regexp_extract({url}, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)"
    path = (
        f"CASE WHEN {raw_path} = '' THEN '/'"
        f" WHEN length({raw_path}) > 1 AND {raw_path} LIKE '%/'"
        f" THEN substr({raw_path}, 1, length({raw_path}) - 1)"
        f" ELSE {raw_path} END"
    )
    query = f"regexp_extract({url}, '\\?([^#]*)', 1)"
    sorted_q = (
        f"array_to_string(list_sort(string_split({query}, '&')), '&')"
    )
    return (
        f"concat({proto}, '://', {host}, {path},"
        f" CASE WHEN {query} = '' THEN '' ELSE concat('?', {sorted_q}) END)"
    )


# deterministic messy-URL synthesis: five shapes cycling by doc_id,
# exercising every canonicalization rule (case, default port, www,
# trailing slash, unsorted query, fragment)
_RAW_URL_SQL = (
    "CASE doc_id % 5"
    " WHEN 0 THEN concat('HTTP://WWW.', source, ':80/a/', doc_id, '/')"
    " WHEN 1 THEN concat('https://', source, ':443/a/', doc_id,"
    "   '?z=9&a=1&m=', lang)"
    " WHEN 2 THEN concat('http://', upper(source), '/a/', doc_id,"
    "   '#frag')"
    " WHEN 3 THEN concat('https://www.', source, '')"
    " ELSE concat('http://', source, ':8080/a/', doc_id, '/?b=2&a=1#x')"
    " END"
)


@register(
    "q_url_canonical",
    oracle=f"""
        WITH u AS (
            SELECT doc_id, {_RAW_URL_SQL} AS url FROM documents
        )
        SELECT doc_id, url, {_canon_url_duck('url')} AS canon_url
        FROM u
    """,
    doc="URL canonicalization: lowercase scheme/host, strip default"
    " port + leading www., drop fragment, normalize path slash, sort"
    " query params — all narrow codegen'd string algebra, replayed"
    " bit-identically in DuckDB. The canonical key is what the crawl"
    " visited-set and URL-level dedup should compare on (the reference"
    " compares raw strings and recrawls trivially-different URLs).",
)
def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_url = docs.select("doc_id", F.expr(_RAW_URL_SQL).alias("url"))
    return with_url.select(
        "doc_id", "url", canonical_url_col("url").alias("canon_url")
    )
