"""Failure-quarantine behavior (ref: bronze.py:102-108 collects
failed_urls; chunks_data.py:120-124 try/except-log): malformed records
are captured, not fatal, and the good rows still land."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def test_corrupt_json_quarantine(spark, tmp_path):
    raw = tmp_path / "landing"
    raw.mkdir()
    (raw / "good_and_bad.json").write_text(
        '{"doc_id": "a", "page_content": "hello"}\n'
        "this is not json at all\n"
        '{"doc_id": "b", "page_content": "world"}\n'
        '{"doc_id": "c"}\n'  # missing field -> null, not corrupt
    )
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("page_content", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(raw))
        .cache()
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 3  # a, b, and the missing-field record c
    assert bad.count() == 1
    assert "not json" in bad.first()._corrupt_record
    df.unpersist()


def test_failfast_mode_raises(spark, tmp_path):
    import pytest

    raw = tmp_path / "landing2"
    raw.mkdir()
    (raw / "bad.json").write_text('{"doc_id": "a"}\nnot json\n')
    schema = StructType([StructField("doc_id", StringType())])
    with pytest.raises(Exception, match="FAILFAST|Malformed|FAILED_READ"):
        spark.read.schema(schema).option("mode", "FAILFAST").json(str(raw)).collect()


def test_substrate_memo_invalidates_on_corpus_rewrite(spark, tmp_path):
    """The dedup substrate memo folds a file fingerprint into its key:
    rewriting the corpus under the SAME path mid-session must rebuild
    the checkpointed substrate, not serve the stale snapshot."""
    import shutil

    from lakehouse_weather_spark.operators.dedup import (
        _spark_shingle_hashes,
    )

    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(0, "alpha beta gamma delta", "en", "s", 22)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    n1 = _spark_shingle_hashes(spark, d).count()
    shutil.rmtree(f"{d}/documents.parquet")
    spark.createDataFrame(
        [
            (0, "alpha beta gamma delta", "en", "s", 22),
            (1, "epsilon zeta eta theta iota kappa", "en", "s", 33),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    n2 = _spark_shingle_hashes(spark, d).count()
    assert n2 > n1  # stale memo would have returned n1 again
