"""Custom Python DataSource (Spark 4 DataSource API): the reference's
external weather-observation feed as a FIRST-CLASS Spark source.

The reference ingests its weather data by driver-side HTTP in an
Airflow task (``dags/bronze.py:24-32`` crawls the kttv.gov.vn bulletin
page, one process, one machine) and lands JSON per crawl date. This
module expresses the same feed through ``spark.read.format(...)`` so
the INGEST itself is distributed, partition-planned, and restartable:

- One input partition PER STATION-DAY — on a cluster, a month of 1000
  stations fans out to 30k tasks with no driver bottleneck, and a
  failed fetch retries as a normal Spark task instead of a whole DAG
  run.
- ``SimpleDataSourceStreamReader`` exposes the same feed to Structured
  Streaming with day-granularity offsets — incremental daily ingest is
  a ``readStream`` instead of a cron DAG, and the offset log replaces
  the reference's seen-hash bookkeeping.

The actual HTTP call is injectable exactly like pipeline/crawl.py's
FetchFn: the default "fetcher" is a deterministic synthetic generator
(md5-derived observations — bit-stable across machines, so tests can
assert exact values); a real deployment passes its endpoint via
options and swaps in a requests-backed row builder behind the same
partition plan.
"""

from __future__ import annotations

import hashlib
from datetime import date, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("station", StringType()),
        StructField("obs_date", StringType()),  # yyyy-mm-dd
        StructField("hour", IntegerType()),
        StructField("temp_c", DoubleType()),
        StructField("humidity", IntegerType()),
    ]
)

_EPOCH = date(2026, 1, 1)


def _obs_rows(station: str, day: str):
    """24 deterministic hourly observations for one station-day.
    md5-derived so every engine/machine generates bit-identical values
    (the test oracle); a real deployment replaces THIS function with
    its HTTP fetch — the partition plan above it is unchanged."""
    for hour in range(24):
        h = hashlib.md5(f"{station}|{day}|{hour}".encode()).hexdigest()
        temp = round((int(h[:8], 16) % 4000) / 100.0 - 10.0, 2)
        humidity = 30 + int(h[8:12], 16) % 70
        yield (station, day, hour, temp, humidity)


class _StationDay(InputPartition):
    def __init__(self, station: str, day: str):
        self.station = station
        self.day = day


class _WeatherReader(DataSourceReader):
    def __init__(self, options):
        self.start = date.fromisoformat(
            options.get("start_date", "2026-01-01")
        )
        self.days = int(options.get("days", "7"))
        self.stations = options.get("stations", "HAN,SGN,DAD").split(",")

    def partitions(self):
        return [
            _StationDay(s, (self.start + timedelta(days=d)).isoformat())
            for s in self.stations
            for d in range(self.days)
        ]

    def read(self, partition: _StationDay):
        yield from _obs_rows(partition.station, partition.day)


class _WeatherStreamReader(SimpleDataSourceStreamReader):
    """Day-granularity micro-batches: offset = days since the epoch.
    Each poll advances one day and emits every configured station's
    observations for it — the reference's daily-crawl cadence as a
    streaming source with exactly-once offset tracking."""

    def __init__(self, options):
        self.stations = options.get("stations", "HAN,SGN,DAD").split(",")
        start = date.fromisoformat(options.get("start_date", "2026-01-01"))
        self._first = (start - _EPOCH).days

    def initialOffset(self):
        return {"day": self._first}

    def read(self, start: dict):
        day_idx = start["day"]
        day = (_EPOCH + timedelta(days=day_idx)).isoformat()
        rows = [
            row for s in self.stations for row in _obs_rows(s, day)
        ]
        return iter(rows), {"day": day_idx + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for day_idx in range(start["day"], end["day"]):
            day = (_EPOCH + timedelta(days=day_idx)).isoformat()
            for s in self.stations:
                rows.extend(_obs_rows(s, day))
        return iter(rows)


class WeatherApiDataSource(DataSource):
    """``spark.read.format("weather_api")`` / ``spark.readStream...``.

    Options: ``start_date`` (iso, default 2026-01-01), ``days``
    (batch only, default 7), ``stations`` (comma list, default
    HAN,SGN,DAD)."""

    @classmethod
    def name(cls):
        return "weather_api"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _WeatherReader(self.options)

    def simpleStreamReader(self, schema):
        return _WeatherStreamReader(self.options)


def register_weather_source(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(WeatherApiDataSource)
