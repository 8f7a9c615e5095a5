"""End-to-end medallion pipeline and crawl-source tests (SURVEY.md §3):
bronze -> silver -> gold rebuild on a temp dir, chunk invariants across
layers, vector search over gold, and the BFS crawl with a deterministic
in-memory link graph (no network)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.operators.textops import CHUNK_SIZE
from lakehouse_weather_spark.pipeline.crawl import crawl
from lakehouse_weather_spark.pipeline.medallion import (
    BRONZE_SCHEMA,
    hash_embed,
    run_pipeline,
    vector_search,
)


@pytest.fixture(scope="module")
def pipeline_out(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("medallion"))
    counts = run_pipeline(spark, sf_dir, out)
    return out, counts


def test_pipeline_counts(pipeline_out, spark, sf_dir):
    out, counts = pipeline_out
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert counts["bronze"] <= n_docs  # content-hash dedup can only shrink
    assert counts["bronze"] > 0
    assert counts["silver"] >= counts["bronze"]  # chunking fans out
    assert counts["gold"] == counts["silver"]  # clean+embed is 1:1 here


def test_silver_chunk_invariants(pipeline_out, spark):
    out, _ = pipeline_out
    silver = spark.read.parquet(f"{out}/silver")
    bad = silver.filter(f"length(split_content) > {CHUNK_SIZE}").count()
    assert bad == 0
    # chunk ordinals are dense per doc (0..n-1)
    from pyspark.sql import functions as F

    agg = silver.groupBy("doc_id").agg(
        F.min("chunk_id").alias("lo"),
        F.max("chunk_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    assert agg.filter("lo != 0 OR hi != n - 1").count() == 0


def test_gold_embeddings_normalized(pipeline_out, spark):
    out, _ = pipeline_out
    gold = spark.read.parquet(f"{out}/gold_embeddings")
    from pyspark.sql import functions as F

    nrm = F.expr(
        "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    stats = gold.select(nrm.alias("n")).agg(
        F.min("n").alias("lo"), F.max("n").alias("hi")
    ).first()
    assert 0.999 <= stats.lo <= stats.hi <= 1.001


def test_gold_pk_deterministic(pipeline_out, spark):
    out, _ = pipeline_out
    gold = spark.read.parquet(f"{out}/gold_embeddings")
    assert gold.select("pk").distinct().count() == gold.count()


def test_vector_search_finds_own_text(pipeline_out, spark):
    out, _ = pipeline_out
    gold = spark.read.parquet(f"{out}/gold_embeddings")
    probe = gold.orderBy("pk").first()
    hits = vector_search(spark, out, probe.text, k=3).collect()
    assert hits, "expected results"
    assert hits[0].score > 0.999  # its own embedding must be the top hit
    assert hits[0].text == probe.text


def test_embed_determinism():
    a = hash_embed("spark rows columns")
    b = hash_embed("spark rows columns")
    assert a == b
    assert abs(sum(x * x for x in a) - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# Crawl source
# ---------------------------------------------------------------------------


def _fake_graph() -> dict[str, tuple[str, str, list[str]]]:
    g = {}
    # seed -> 3 children -> 9 grandchildren; one duplicate-content pair;
    # link lists salted with mailto:/tel:/# (must be dropped)
    g["https://root"] = ("root page", "text/html", [
        "https://a", "https://b", "https://c", "mailto:x@y", "#frag",
    ])
    for i, u in enumerate(["https://a", "https://b", "https://c"]):
        children = [f"{u}/{j}" for j in range(3)]
        g[u] = (f"page {i}", "text/html", children + ["tel:+1", "https://root"])
        for j, cu in enumerate(children):
            # duplicate content between a/0 and b/0
            content = "dup page" if cu.endswith("/0") and u < "https://c" else f"leaf {i}-{j}"
            g[cu] = (content, "text/html", [])
    return g


def test_crawl_bfs_dedup(spark):
    graph = _fake_graph()

    def fetch(url):
        return graph[url]

    pages = crawl(spark, ["https://root"], depth=3, fetch_fn=fetch, fetch_partitions=2)
    rows = pages.collect()
    urls = {r.url for r in rows}
    contents = [r.page_content for r in rows]
    # all 13 urls visited, but duplicate contents collapse
    assert "https://root" in urls
    assert len(contents) == len(set(contents))  # content-hash dedup applied
    assert "dup page" in contents
    # depth respected: leaves at depth 2
    depths = {r.url: r.crawl_depth for r in rows}
    assert depths["https://root"] == 0
    assert depths.get("https://a/1") == 2


def test_crawl_failure_quarantine(spark):
    def fetch(url):
        if url.endswith("bad"):
            raise RuntimeError("boom")
        return ("ok", "text/html", ["https://bad"])

    pages = crawl(spark, ["https://good"], depth=2, fetch_fn=fetch, fetch_partitions=1)
    rows = {r.url: r for r in pages.collect()}
    assert rows["https://bad"].content_type == "error/failed"


def test_gold_clean_fn_is_injectable(pipeline_out, spark):
    """The LLM-cleaning seam: a custom clean_fn plugs into run_gold just
    like embed_fn (the production backend is the agent contract,
    agent_clean_data.py:13-48)."""
    from lakehouse_weather_spark.pipeline.medallion import run_gold

    out, _ = pipeline_out
    gold = run_gold(spark, out, clean_fn=lambda s: s.str.upper())
    sample = [r.text for r in gold.limit(20).collect()]
    assert sample and all(t == t.upper() for t in sample)


def test_seed_vector_store_foreach_partition(pipeline_out, spark, tmp_path):
    """foreachPartition vector sink: every gold row reaches the store in
    batches, one client per partition (ref seed_milvus.py:71-84)."""
    import glob
    import json
    import os
    import uuid

    from lakehouse_weather_spark.pipeline.medallion import (
        EMBED_BATCH,
        seed_vector_store,
    )

    sink_dir = str(tmp_path / "ann_store")
    os.makedirs(sink_dir, exist_ok=True)

    def insert_factory():
        # one "client" (file handle) per partition, like a Milvus conn
        path = os.path.join(sink_dir, f"part-{uuid.uuid4().hex}.jsonl")

        def insert(batch: list[dict]) -> None:
            assert len(batch) <= EMBED_BATCH
            with open(path, "a") as fh:
                for row in batch:
                    fh.write(json.dumps({"pk": row["pk"]}) + "\n")

        return insert

    out, counts = pipeline_out
    gold = spark.read.parquet(f"{out}/gold_embeddings")
    seed_vector_store(gold.repartition(4), insert_factory)

    inserted = []
    for f in glob.glob(f"{sink_dir}/*.jsonl"):
        with open(f) as fh:
            inserted += [json.loads(line)["pk"] for line in fh]
    assert sorted(inserted) == sorted(r.pk for r in gold.select("pk").collect())


def test_crawl_bloom_prefilter_identical(spark):
    graph = _fake_graph()

    def fetch(url):
        return graph[url]

    plain = crawl(spark, ["https://root"], depth=3, fetch_fn=fetch, fetch_partitions=2)
    bloom = crawl(
        spark,
        ["https://root"],
        depth=3,
        fetch_fn=fetch,
        fetch_partitions=2,
        bloom_prefilter=True,
    )
    a = {(r.url, r.page_content, r.crawl_depth) for r in plain.collect()}
    b = {(r.url, r.page_content, r.crawl_depth) for r in bloom.collect()}
    assert a == b


def test_crawl_canonicalize_fetches_each_page_once(spark):
    """canonicalize=True keys the visited set on canonical URL form, so
    trivially-different spellings (case, :443, www., trailing slash,
    query order, fragment) of one page fetch exactly once."""
    spellings = [
        "HTTPS://WWW.site:443/page/",
        "https://site/page",
        "https://site/page#frag",
    ]
    graph = {
        # graph is keyed by CANONICAL form: the seed's empty path
        # normalizes to '/'
        "https://root/": ("root page", "text/html", spellings),
        "https://site/page": ("the page", "text/html", []),
    }

    def fetch(url):
        # the graph has ONLY canonical keys: any non-canonical spelling
        # reaching the fetcher raises and lands as an error/failed row
        return graph[url]

    pages = crawl(
        spark,
        ["https://root"],
        depth=2,
        fetch_fn=fetch,
        fetch_partitions=1,
        canonicalize=True,
    )
    rows = {r.url: r for r in pages.collect()}
    # exactly the two canonical URLs, no quarantined raw spellings
    assert set(rows) == {"https://root/", "https://site/page"}
    assert rows["https://site/page"].page_content == "the page"
    assert all(r.content_type != "error/failed" for r in rows.values())


def test_canonical_url_is_idempotent(spark):
    """canon(canon(u)) == canon(u): the visited set stays stable when
    already-canonical URLs are re-canonicalized (links harvested from a
    canonicalized crawl frontier pass through _canon again)."""
    from pyspark.sql import functions as F

    from lakehouse_weather_spark.operators.scalars import canonical_url_col

    urls = [
        "HTTP://WWW.Example.COM:80/A/b/./c/?z=1&a=2#frag",
        "https://example.com:443/",
        "https://example.com",
        "http://example.com:8080/path/",
        "https://www.sub.example.com/x?b=2&a=1&a=0",
        "ftp://example.com:21/file",
        "https://example.com/trailing/",
        "http://example.com/?",
        "https://example.com/UPPER/Case/Path",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        "url",
        canonical_url_col("url").alias("c1"),
    ).select(
        "url", "c1", canonical_url_col("c1").alias("c2")
    )
    for r in out.collect():
        assert r.c1 == r.c2, (r.url, r.c1, r.c2)
    got = {r.url: r.c1 for r in out.collect()}
    # spot semantics: case, default port, www., sort, fragment
    assert got["HTTP://WWW.Example.COM:80/A/b/./c/?z=1&a=2#frag"] == (
        "http://example.com/A/b/./c?a=2&z=1"
    )
    assert got["https://example.com:443/"] == "https://example.com/"
    assert got["https://example.com"] == "https://example.com/"
    assert got["http://example.com:8080/path/"] == "http://example.com:8080/path"


def test_bronze_schema_evolution_between_runs(spark, sf_dir, tmp_path):
    """Schema drift tolerance (ref parity: chunks_data.py:82 and
    seed_milvus.py:53-59 tolerate missing keys defensively): a later
    bronze producer generation ADDS a field (crawl_depth) and DROPS one
    (content_type). The evolution-tolerant read must union both
    generations, default the dropped field to NULL, type every declared
    field, carry the new field through, and silver must still chunk the
    mixed input."""
    import json as jsonlib
    import os

    from pyspark.sql import functions as F

    from lakehouse_weather_spark.pipeline.medallion import (
        read_bronze,
        run_bronze,
        run_silver,
    )

    out = str(tmp_path / "lake")
    run_bronze(spark, sf_dir, out)
    n_gen1 = read_bronze(spark, out).count()

    # generation 2: a new producer writes JSON objects with crawl_depth
    # but no content_type, into a fresh ingest_date partition
    gen2_dir = os.path.join(out, "bronze", "ingest_date=2025-01-01")
    os.makedirs(gen2_dir, exist_ok=True)
    with open(os.path.join(gen2_dir, "part-gen2.json"), "w") as fh:
        for i in range(5):
            fh.write(
                jsonlib.dumps(
                    {
                        "doc_id": 10_000_000 + i,
                        "page_content": f"evolved document {i} body text",
                        "source": "gen2.example",
                        "crawl_depth": i,
                    }
                )
                + "\n"
            )

    bronze = read_bronze(spark, out)
    assert bronze.count() == n_gen1 + 5
    # declared field dropped by gen2 -> typed NULL, not a crash
    assert bronze.schema["content_type"].dataType.typeName() == "string"
    gen2 = bronze.filter(F.col("doc_id") >= 10_000_000)
    assert gen2.filter(F.col("content_type").isNull()).count() == 5
    # new field carried through for consumers that know about it
    assert "crawl_depth" in bronze.columns
    assert gen2.agg(F.max("crawl_depth")).first()[0] == 4
    # old generation reads the new field as NULL
    assert (
        bronze.filter(F.col("doc_id") < 10_000_000)
        .filter(F.col("crawl_depth").isNotNull())
        .count()
        == 0
    )

    # downstream silver still builds over the mixed generations
    chunks = run_silver(spark, out)
    assert (
        chunks.filter(F.col("doc_id") >= 10_000_000).count() == 5
    )  # short docs -> one chunk each


def test_gold_defaults_metadata_for_older_silver(spark, sf_dir, tmp_path):
    """A silver generation that predates the title/description columns
    (and even content_type) still seeds gold with the documented
    defaults — absent COLUMN and NULL value behave identically."""
    from pyspark.sql import functions as F

    from lakehouse_weather_spark.pipeline.medallion import run_gold

    out = str(tmp_path / "lake2")
    spark.createDataFrame(
        [(1, 0, "s.example", "some chunk body")],
        "doc_id long, chunk_id int, source string, split_content string",
    ).write.parquet(f"{out}/silver")

    gold = run_gold(spark, out)
    row = gold.collect()[0]
    assert row.title == "Untitled"
    assert row.description == "No description available"
    assert row.content_type == "text/plain"
    assert len(row.embedding) > 0
