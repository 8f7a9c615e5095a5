"""Custom Python DataSource (Spark 4): the weather-observation feed as
a first-class batch + streaming source — distributed partition-per-
station-day ingest replacing the reference's driver-side HTTP task
(dags/bronze.py:24-32)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.sources.weather_api import (  # noqa: E402
    _obs_rows,
    register_weather_source,
)


def test_batch_read_partitions_and_determinism(spark):
    register_weather_source(spark)
    df = (
        spark.read.format("weather_api")
        .option("start_date", "2026-03-01")
        .option("days", "3")
        .option("stations", "HAN,SGN")
        .load()
    )
    # 2 stations x 3 days x 24 hours
    assert df.count() == 2 * 3 * 24
    # one Spark input partition per station-day
    assert df.rdd.getNumPartitions() == 6
    # values are md5-deterministic: spot-check against the generator
    got = {
        (r.station, r.obs_date, r.hour): (r.temp_c, r.humidity)
        for r in df.collect()
    }
    for row in _obs_rows("HAN", "2026-03-02"):
        station, day, hour, temp, humidity = row
        assert got[(station, day, hour)] == (temp, humidity)
    # schema is the declared one
    assert [f.name for f in df.schema.fields] == [
        "station", "obs_date", "hour", "temp_c", "humidity",
    ]


def test_batch_read_filters_push_into_spark_plan(spark):
    register_weather_source(spark)
    df = (
        spark.read.format("weather_api")
        .option("days", "2")
        .load()
        .filter("station = 'DAD' AND hour < 6")
        .groupBy("station")
        .count()
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["count"] == 2 * 6


def test_stream_reads_one_day_per_microbatch(spark, tmp_path):
    register_weather_source(spark)
    stream = (
        spark.readStream.format("weather_api")
        .option("start_date", "2026-03-01")
        .option("stations", "HAN")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("weather_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("weather_stream").collect()
    # availableNow drains exactly the batches the source admitted —
    # at least the first day's 24 rows, in whole-day multiples
    assert len(out) >= 24 and len(out) % 24 == 0
    days = {r.obs_date for r in out}
    assert "2026-03-01" in days
    # offsets advance day-by-day from the configured start
    assert sorted(days)[0] == "2026-03-01"
