"""Distributed BFS crawl source (ref: ``dags/utils/crawl_web.py:103-167``).

The reference crawls recursively in one Python process with driver-held
``visited_urls`` / ``visited_hashes`` sets. The Spark-first design keeps
only the *depth loop* on the driver; each level is a distributed batch:

1. frontier DataFrame -> repartition -> ``mapInPandas(fetch_batch)``
   (network I/O parallel per partition; the fetcher is injectable so
   tests run a deterministic in-memory link graph, no network).
2. content-hash dedup: ``dropDuplicates(sha2(page_content))`` — the
   distributed form of ``visited_hashes`` (ref: crawl_web.py:51-59).
3. next frontier = exploded links, scheme-filtered (ref: :90-94),
   left-anti-joined against the visited table — the distributed form of
   ``visited_urls`` (ref: :114-122).

At 100 TB-scale crawls the visited set lives in a Delta table and the
anti join is a shuffle join; nothing accumulates on the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

# fetcher: url -> (page_content, content_type, links)
FetchFn = Callable[[str], tuple[str, str, list[str]]]

PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("page_content", StringType()),
        StructField("content_type", StringType()),
        StructField("links", ArrayType(StringType())),
    ]
)


def _fetch_map_factory(fetch_fn: FetchFn):
    def fetch_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url in pdf["url"]:
                try:
                    content, ctype, links = fetch_fn(url)
                except Exception:  # noqa: BLE001 — failure quarantine, ref bronze.py:104-108
                    content, ctype, links = "", "error/failed", []
                rows.append((url, content, ctype, links))
            yield pd.DataFrame(rows, columns=["url", "page_content", "content_type", "links"])

    return fetch_map


def crawl(
    spark: SparkSession,
    seeds: list[str],
    depth: int,
    fetch_fn: FetchFn | None = None,
    fetch_partitions: int = 8,
    bloom_prefilter: bool = False,
    canonicalize: bool = False,
) -> DataFrame:
    """BFS crawl to ``depth`` levels; returns the deduped page table
    (url, page_content, content_type, links, crawl_depth).

    ``fetch_fn`` defaults to the real HTTP backend
    (``sources.fetchers.http_fetch_fn``: requests/bs4/pypdf when
    installed, stdlib fallbacks otherwise) — point ``seeds`` at live
    URLs and this crawls them. Tests inject deterministic fetchers.

    ``bloom_prefilter=True`` screens harvested links through a Bloom
    filter of the visited set (operators/bloom.py) before the exact
    anti-join. Links whose bits miss are *definitely* unvisited and
    bypass the join; only the bloom-maybe subset (true hits + the
    bounded false-positive tail) pays the shuffle. At crawl scale the
    visited table is the billion-row side — the bit set is <= M rows
    and broadcasts — so the anti-join input shrinks from |links| to
    |maybe-visited|. Results are identical either way (Bloom has no
    false negatives; the exact join settles the maybes).

    ``canonicalize=True`` keys the visited set on canonical URL form
    (operators/scalars.canonical_url_col: case, default port, www,
    trailing slash, query order, fragment) so trivially-different
    spellings of one page are fetched once — the reference compares raw
    strings (crawl_web.py:114-122) and recrawls them."""
    if fetch_fn is None:
        from lakehouse_weather_spark.sources.fetchers import http_fetch_fn

        fetch_fn = http_fetch_fn()

    def _canon(df: DataFrame) -> DataFrame:
        if not canonicalize:
            return df
        from lakehouse_weather_spark.operators.scalars import canonical_url_col

        return df.select(canonical_url_col("url").alias("url"))

    visited = spark.createDataFrame([(u,) for u in seeds], "url string").limit(0)
    frontier = _canon(
        spark.createDataFrame([(u,) for u in seeds], "url string")
    ).distinct()
    pages: DataFrame | None = None

    for level in range(depth):
        if frontier.isEmpty():
            break
        fetched = (
            frontier.repartition(fetch_partitions)
            .mapInPandas(_fetch_map_factory(fetch_fn), schema=PAGE_SCHEMA)
            .withColumn("crawl_depth", F.lit(level))
        )
        # page-content dedup within and across levels (ref: crawl_web.py:51-59)
        fetched = fetched.withColumn("content_hash", F.sha2("page_content", 256))
        pages = fetched if pages is None else pages.unionByName(fetched)
        visited = visited.union(frontier).distinct()

        # next frontier: harvested links minus visited, scheme-filtered
        # (ref: crawl_web.py:90-94 drops mailto:/tel:/#)
        links = _canon(
            fetched.select(F.explode("links").alias("url")).filter(
                ~F.col("url").startswith("mailto:")
                & ~F.col("url").startswith("tel:")
                & ~F.col("url").startswith("#")
            )
        ).distinct()
        if bloom_prefilter:
            from lakehouse_weather_spark.operators.bloom import (
                bloom_build,
                bloom_probe,
            )

            verdicts = bloom_probe(bloom_build(visited, "url"), links, "url")
            definitely_new = verdicts.filter(~F.col("bloom_maybe")).select("url")
            maybe = verdicts.filter(F.col("bloom_maybe")).select("url")
            frontier = definitely_new.union(
                maybe.join(visited, "url", "left_anti")
            ).distinct()
        else:
            frontier = links.join(visited, "url", "left_anti")

    if pages is None:
        return spark.createDataFrame([], PAGE_SCHEMA).withColumn(
            "crawl_depth", F.lit(0)
        )
    deduped = pages.dropDuplicates(["content_hash"]).drop("content_hash")
    return deduped
