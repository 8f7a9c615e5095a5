"""Medallion pipeline: bronze -> silver -> gold, re-expressed Spark-first.

Reference parity (SURVEY.md §3):
- bronze (``dags/bronze.py:24-108``): crawl landing, content-hash dedup,
  date-partitioned JSON objects in the bronze bucket.
- silver (``dags/silver.py:21-36`` + ``dags/utils/chunks_data.py``):
  read bronze JSON -> validate -> chunk (5000/500 splitter) -> overwrite
  silver. The reference's delete-then-write overwrite window
  (``chunks_data.py:58-59``) becomes an atomic ``mode("overwrite")``.
- gold (``dags/gold.py:26-38`` + ``dags/utils/seed_milvus.py``): read
  silver -> metadata defaults -> LLM clean (shadow entry point; prompt
  at ``dags/agent/agent_clean_data.py:16-27``) -> embed (batch=100,
  ``seed_milvus.py:78``) -> drop-old + reseed the vector collection
  (here: overwrite of an embeddings parquet/Delta table).

External services (LLM cleaning, OpenAI embeddings) are pluggable
transforms: the default backends are deterministic stand-ins (regex
footer-strip; hash-bag embedding) so the pipeline is testable hermetic;
a production backend plugs in behind the same batch signature without
touching the dataflow.

Scale notes: every stage is a narrow map over a partitioned scan except
the bronze dedup (one shuffle on the content hash). Embedding runs in
``mapInPandas`` with internal batching — on a cluster, per-task batch
calls bound external-API concurrency by partition count
(``repartition(n)`` is the throttle, exactly like the reference's
batch=100 loop but parallel).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakehouse_weather_spark.operators.textops import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    CHUNK_STRIDE,
)

EMBED_DIM = 16
EMBED_BATCH = 100  # ref: seed_milvus.py:78 insert/embed batch size

BRONZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("page_content", StringType()),
        StructField("source", StringType()),
        StructField("content_type", StringType()),
        StructField("ingest_date", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Schema evolution (additive drift tolerance)
# ---------------------------------------------------------------------------


def conform(df: DataFrame, schema: StructType, keep_extra: bool = True) -> DataFrame:
    """Defaulted projection onto ``schema``: declared fields that are
    missing from ``df`` come back as typed NULLs, declared fields that
    exist are cast to their declared type, and (by default) new fields
    the producer added are carried through untouched.

    This is the engine's version of the reference's defensive field
    access (``chunks_data.py:82`` ``.get(...)`` with defaults,
    ``seed_milvus.py:53-59`` metadata defaulting): a medallion layer
    keeps working when an upstream run adds or drops a column, instead
    of hard-failing on a closed StructType. Purely a projection — no
    shuffle, no data rewrite; historical files are never touched."""
    declared = {f.name for f in schema.fields}
    have = set(df.columns)
    cols = [
        (
            F.col(f.name).cast(f.dataType)
            if f.name in have
            else F.lit(None).cast(f.dataType)
        ).alias(f.name)
        for f in schema.fields
    ]
    if keep_extra:
        cols += [F.col(n) for n in df.columns if n not in declared]
    return df.select(*cols)


def read_bronze(spark: SparkSession, out_dir: str) -> DataFrame:
    """Evolution-tolerant bronze read: JSON schema inference unions the
    keys seen across all file generations (old files simply lack the
    new keys), then ``conform`` pins the declared bronze fields to
    their types and defaults the ones a given generation is missing."""
    return conform(spark.read.json(f"{out_dir}/bronze"), BRONZE_SCHEMA)


# ---------------------------------------------------------------------------
# Pluggable transforms (deterministic defaults; prod backends plug in)
# ---------------------------------------------------------------------------

_FOOTER_RE = re.compile(r"(?s)\s*--\s*footer.*$")
_CONTACT_RE = re.compile(r"\S+@\S+|\btel:\S+")


def clean_text_batch(texts: pd.Series) -> pd.Series:
    """Deterministic stand-in for the LLM cleaning agent
    (``dags/agent/agent_clean_data.py:16-27``: remove footer/contact
    info, keep content verbatim). Same contract, regex-based."""
    return texts.map(
        lambda t: _CONTACT_RE.sub("", _FOOTER_RE.sub("", t or "")).strip()
    )


def hash_embed(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic hash-bag embedding stand-in for
    ``text-embedding-3-large`` (``seed_milvus.py:19,33``): token ->
    md5 bucket, L2-normalized counts with sign from a second hash bit."""
    vec = np.zeros(dim, dtype=np.float64)
    for tok in (text or "").split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        idx = h % dim
        sign = 1.0 if (h >> 8) & 1 else -1.0
        vec[idx] += sign
    nrm = float(np.linalg.norm(vec))
    if nrm > 0:
        vec /= nrm
    return [float(x) for x in vec]


EmbedFn = Callable[[list[str]], list[list[float]]]
# cleaning transform: batch of raw texts -> batch of cleaned texts.
# The production backend is the LLM agent (agent_clean_data.py:13-48);
# the default is the deterministic regex stand-in with the same contract.
CleanFn = Callable[[pd.Series], pd.Series]


def hash_embed_batch(texts: list[str]) -> list[list[float]]:
    return [hash_embed(t) for t in texts]


# ---------------------------------------------------------------------------
# Pipeline stages
# ---------------------------------------------------------------------------


def run_bronze(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """Land documents into bronze: project to the bronze doc schema,
    content-hash dedup (ref: bronze.py:13-22,65-70), append-partitioned
    by ingest_date (ref: bronze.py:53,91 date-keyed object paths)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bronze = (
        docs.select(
            "doc_id",
            F.col("text").alias("page_content"),
            "source",
            F.lit("text/html").alias("content_type"),
            F.date_format(
                F.date_add(F.lit("2024-12-12").cast("date"), (F.col("doc_id") % 5).cast("int")),
                "yyyy-MM-dd",
            ).alias("ingest_date"),
        )
        .withColumn("content_hash", F.sha2("page_content", 256))
        .dropDuplicates(["content_hash"])
        .drop("content_hash")
    )
    bronze.write.mode("overwrite").partitionBy("ingest_date").json(f"{out_dir}/bronze")
    return bronze


def run_silver(spark: SparkSession, out_dir: str) -> DataFrame:
    """Bronze JSON -> validated chunks -> atomic overwrite of silver
    (ref: chunks_data.py:69-124; the non-atomic delete-then-write at
    :58-59 becomes mode('overwrite')). Reads bronze through the
    evolution-tolerant path, so a bronze generation that added or
    dropped a field still chunks cleanly."""
    bronze = read_bronze(spark, out_dir)
    chunks = (
        bronze.filter(F.col("page_content").isNotNull() & (F.length("page_content") > 0))
        .select(
            "doc_id",
            "source",
            "content_type",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, int(greatest((length(page_content)"
                    f" - {CHUNK_OVERLAP} + {CHUNK_STRIDE - 1}) div {CHUNK_STRIDE}, 1)) - 1),"
                    f" i -> substring(page_content, i * {CHUNK_STRIDE} + 1, {CHUNK_SIZE}))"
                )
            ).alias("chunk_id", "split_content"),
        )
    )
    chunks.write.mode("overwrite").parquet(f"{out_dir}/silver")
    return chunks


def _embed_map_factory(embed_fn: EmbedFn):
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("chunk_id", IntegerType()),
            StructField("pk", StringType()),
            StructField("text", StringType()),
            StructField("source", StringType()),
            StructField("content_type", StringType()),
            StructField("title", StringType()),
            StructField("description", StringType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def embed_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), EMBED_BATCH):
                part = pdf.iloc[start : start + EMBED_BATCH]
                vecs = embed_fn(part["cleaned_content"].tolist())
                yield pd.DataFrame(
                    {
                        "doc_id": part["doc_id"].values,
                        "chunk_id": part["chunk_id"].values,
                        # deterministic pk (ref uses uuid4 at seed_milvus.py:81;
                        # deterministic fn of (doc_id, chunk_id) for testability)
                        "pk": [
                            hashlib.md5(f"{d}_{c}".encode()).hexdigest()
                            for d, c in zip(part["doc_id"], part["chunk_id"])
                        ],
                        "text": part["cleaned_content"].values,
                        "source": part["source"].values,
                        "content_type": part["content_type"].values,
                        "title": part["title"].values,
                        "description": part["description"].values,
                        "embedding": vecs,
                    }
                )

    return embed_map, out_schema


def run_gold(
    spark: SparkSession,
    out_dir: str,
    embed_fn: EmbedFn = hash_embed_batch,
    clean_fn: CleanFn = clean_text_batch,
) -> DataFrame:
    """Silver chunks -> clean -> metadata defaults -> embed -> overwrite
    the embeddings table (ref: gold.py:26-38; drop_old reseed at
    seed_milvus.py:71-84; metadata defaults at :53-59). Both external
    transforms are injectable with deterministic defaults: ``clean_fn``
    is the LLM-cleaning seam (agent_clean_data.py:13-48), ``embed_fn``
    the embedding-model seam (seed_milvus.py:19,33).

    Metadata defaulting mirrors ``seed_milvus.py:53-59``: title /
    description / content_type fall back to their defaults whether the
    column is absent entirely (older silver generation) or NULL for a
    given row — the mergeSchema read plus ``conform`` handles both."""
    silver = conform(
        spark.read.option("mergeSchema", "true").parquet(f"{out_dir}/silver"),
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("chunk_id", IntegerType()),
                StructField("source", StringType()),
                StructField("content_type", StringType()),
                StructField("split_content", StringType()),
                StructField("title", StringType()),
                StructField("description", StringType()),
            ]
        ),
    )

    clean_udf = F.pandas_udf(clean_fn, StringType())
    cleaned = silver.select(
        "doc_id",
        "chunk_id",
        "source",
        clean_udf(F.col("split_content")).alias("cleaned_content"),
        F.coalesce(F.col("content_type"), F.lit("text/plain")).alias("content_type"),
        F.coalesce(F.col("title"), F.lit("Untitled")).alias("title"),
        F.coalesce(
            F.col("description"), F.lit("No description available")
        ).alias("description"),
    ).filter(F.length("cleaned_content") > 0)

    embed_map, out_schema = _embed_map_factory(embed_fn)
    gold = cleaned.mapInPandas(embed_map, schema=out_schema)
    gold.write.mode("overwrite").parquet(f"{out_dir}/gold_embeddings")
    return gold


def run_pipeline(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, int]:
    """Full bronze -> silver -> gold rebuild; returns row counts."""
    bronze = run_bronze(spark, sf_dir, out_dir)
    silver = run_silver(spark, out_dir)
    gold = run_gold(spark, out_dir)
    return {
        "bronze": read_bronze(spark, out_dir).count(),
        "silver": spark.read.parquet(f"{out_dir}/silver").count(),
        "gold": spark.read.parquet(f"{out_dir}/gold_embeddings").count(),
    }


def seed_vector_store(
    gold: DataFrame,
    insert_factory: Callable[[], Callable[[list[dict]], None]],
    batch: int = EMBED_BATCH,
) -> None:
    """External vector-store sink via ``foreachPartition`` (ref:
    ``seed_milvus.py:71-84`` drops and reseeds a Milvus collection with
    batch inserts). Each partition builds its OWN client via
    ``insert_factory`` (clients are not picklable and must not cross
    the driver/executor boundary) and inserts row-dict batches of
    ``batch``. Partition count is the concurrency throttle against the
    external service — ``repartition(n)`` upstream to tune. The real
    Milvus/pgvector/ES backend plugs in as an ``insert_factory``; tests
    inject a file-backed recorder."""

    def write_partition(rows) -> None:
        insert = insert_factory()
        buf: list[dict] = []
        for row in rows:
            buf.append(row.asDict())
            if len(buf) >= batch:
                insert(buf)
                buf = []
        if buf:
            insert(buf)

    gold.foreachPartition(write_partition)


def vector_search(
    spark: SparkSession, out_dir: str, query_text: str, k: int = 5
) -> DataFrame:
    """Similarity search over the gold embeddings table (ref: the Milvus
    retriever, seed_milvus.py:7-25) — brute-force cosine top-k."""
    emb = spark.read.parquet(f"{out_dir}/gold_embeddings")
    qvec = hash_embed(query_text)
    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.expr(
        "aggregate(zip_with(embedding, qv, (x, y) -> CAST(x AS DOUBLE) * y),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    nrm = F.expr(
        "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    return (
        emb.withColumn("qv", q)
        .select("pk", "doc_id", "chunk_id", "text", (dot / nrm).alias("score"))
        .orderBy(F.desc("score"), F.asc("pk"))
        .limit(k)
    )
