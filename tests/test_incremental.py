"""Incremental maintenance: merge/upsert semantics, idempotent partition
append, compaction."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from lakehouse_weather_spark.pipeline.incremental import (
    append_partition,
    compact_partitions,
    merge_upsert,
)


def _assert_clean_room_conformant(spark, table_dir: str) -> None:
    """Protocol conformance on a WRITER MUTATION PATH: export the
    Delta log, then require the clean-room from-spec reader
    (tools/delta_reader.py — zero code shared with the writer) to
    validate() clean AND read back exactly the rows read_current sees.
    Called after every mutation kind — merge, schema evolution,
    compaction (flat + partitioned), retention expiry — so conformance
    is asserted per path, not only on the publish->export gate query."""
    tools = str(Path(__file__).resolve().parent.parent / "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    from delta_reader import DeltaTable

    from lakehouse_weather_spark.pipeline.atomic import (
        export_delta_log,
        read_current,
    )

    export_delta_log(table_dir)
    dt = DeltaTable(table_dir)
    problems = dt.validate()
    assert problems == [], problems
    tbl = dt.to_arrow()
    cols = sorted(tbl.schema.names)
    foreign = sorted(
        tuple(str(row[c]) for c in cols) for row in tbl.to_pylist()
    )
    cur = read_current(spark, table_dir)
    ours = sorted(
        tuple(str(r[c]) for c in cols) for r in cur.collect()
    )
    assert foreign == ours, (len(foreign), len(ours))


def test_merge_upsert(spark, sf_dir, tmp_path):
    base_dir = str(tmp_path / "base")
    out_dir = str(tmp_path / "merged")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cust.write.parquet(base_dir)

    updates = (
        cust.filter("c_custkey <= 5")
        .withColumn("c_name", F.concat(F.lit("UPDATED_"), F.col("c_name")))
        .unionByName(
            cust.limit(1).select(
                (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
                F.lit("NEW_CUSTOMER").alias("c_name"),
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            )
        )
    )
    n_updated = cust.filter("c_custkey <= 5").count()
    merged = merge_upsert(spark, base_dir, updates, "c_custkey", out_dir)
    assert merged.count() == cust.count() + 1  # updates in place, 1 inserted
    assert merged.filter("c_name LIKE 'UPDATED_%'").count() == n_updated
    assert merged.filter("c_name = 'NEW_CUSTOMER'").count() == 1
    # untouched rows survive byte-identically
    untouched = merged.filter("c_custkey > 5 AND c_custkey < 1000000")
    assert untouched.exceptAll(cust.filter("c_custkey > 5")).isEmpty()


def test_append_partition_idempotent(spark, sf_dir, tmp_path):
    out = str(tmp_path / "parted")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "d", F.lit("2024-12-12")
    )
    append_partition(docs, out, "d")
    n1 = spark.read.parquet(out).count()
    # rerun of the same partition replaces, not duplicates
    append_partition(docs, out, "d")
    assert spark.read.parquet(out).count() == n1
    # a new partition appends without touching the old one
    docs2 = docs.withColumn("d", F.lit("2024-12-13"))
    append_partition(docs2, out, "d")
    assert spark.read.parquet(out).count() == 2 * n1


def test_compaction(spark, sf_dir, tmp_path):
    from lakehouse_weather_spark.pipeline.atomic import (
        publish,
        read_current,
        resolve,
    )

    out = str(tmp_path / "frag")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    publish(
        out, lambda p: docs.repartition(16).write.mode("errorifexists").parquet(p)
    )
    before = len([f for f in os.listdir(resolve(out)) if f.endswith(".parquet")])
    assert before >= 16
    after = compact_partitions(spark, out, target_files=2)
    assert after <= 2
    assert read_current(spark, out).count() == docs.count()


def test_atomic_publish_never_exposes_half_state(spark, sf_dir, tmp_path):
    """Crash-safety of the versioned-table commit protocol: a writer
    that dies mid-write (version directory written, pointer not yet
    replaced) leaves readers on the old committed version; the next
    successful publish supersedes and prunes the orphan."""
    from lakehouse_weather_spark.pipeline.atomic import (
        current_version,
        publish_df,
        read_current,
    )

    table = str(tmp_path / "vt")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    publish_df(docs.limit(100), table)
    assert read_current(spark, table).count() == 100

    # simulate a crash BETWEEN the data write and the pointer commit:
    # the new version dir exists in full, but _CURRENT was never updated
    v_before = current_version(table)
    crashed = os.path.join(table, "v999999")
    docs.limit(7).write.parquet(crashed)
    assert current_version(table) == v_before
    assert read_current(spark, table).count() == 100  # reader unaffected

    # next successful publish wins and prunes the orphan
    publish_df(docs.limit(55), table)
    assert read_current(spark, table).count() == 55
    assert not os.path.exists(crashed)


def test_atomic_publish_retains_previous_versions(spark, sf_dir, tmp_path):
    from lakehouse_weather_spark.pipeline.atomic import publish_df, resolve

    table = str(tmp_path / "vt2")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    paths = [publish_df(docs.limit(n), table) for n in (10, 20, 30, 40)]
    assert resolve(table) == paths[-1]
    # latest + `keep`=2 predecessors retained; the oldest is pruned
    live = {d for d in os.listdir(table) if d.startswith("v")}
    assert os.path.basename(paths[-1]) in live
    assert os.path.basename(paths[-2]) in live
    assert os.path.basename(paths[0]) not in live


def test_time_travel_reads_retained_versions(spark, sf_dir, tmp_path):
    from lakehouse_weather_spark.pipeline.atomic import (
        list_versions,
        publish_df,
        read_current,
        read_version,
    )

    table = str(tmp_path / "tt")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    publish_df(docs.limit(10), table)
    publish_df(docs.limit(20), table)
    publish_df(docs.limit(30), table)
    versions = list_versions(table)
    assert read_current(spark, table).count() == 30
    assert read_version(spark, table, versions[-2]).count() == 20
    import pytest

    with pytest.raises(FileNotFoundError):
        read_version(spark, table, "v000099")


def test_write_sized_targets_file_size(spark, sf_dir, tmp_path):
    from lakehouse_weather_spark.pipeline.incremental import write_sized

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "sized")
    # tiny target forces multiple files sized near the target
    n = write_sized(spark, docs, out, target_mb=1)
    import glob

    sizes = [os.path.getsize(f) for f in glob.glob(f"{out}/*.parquet")]
    assert n == len(sizes) >= 1
    assert spark.read.parquet(out).count() == docs.count()
    # no file wildly above target (2x slack for row-group granularity)
    assert max(sizes) <= 2 * 1024 * 1024


def test_table_changes_cdc_between_versions(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from lakehouse_weather_spark.pipeline.atomic import (
        list_versions,
        publish_df,
        table_changes,
    )

    table = str(tmp_path / "cdc")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    publish_df(cust.filter("c_custkey < 100"), table)
    v2 = (
        cust.filter("c_custkey >= 5 AND c_custkey < 103")  # drop 0-4, add 100-102
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") == 7, F.col("c_acctbal") + 1).otherwise(
                F.col("c_acctbal")
            ),
        )
    )
    publish_df(v2, table)
    v_old, v_new = list_versions(table)[-2:]
    changes = table_changes(spark, table, "c_custkey", v_old, v_new)
    by_kind = {
        k: sorted(r.c_custkey for r in rows)
        for k, rows in __import__("itertools").groupby(
            sorted(changes.collect(), key=lambda r: r._change),
            key=lambda r: r._change,
        )
    }
    assert by_kind["delete"] == [0, 1, 2, 3, 4]
    assert by_kind["insert"] == [100, 101, 102]
    assert by_kind["update"] == [7]
    # updated row carries the NEW values
    assert changes.filter("c_custkey = 7").first().c_acctbal == \
        cust.filter("c_custkey = 7").first().c_acctbal + 1


def test_update_clusters_equals_full_recompute(spark):
    """Incremental cluster maintenance: folding a new edge batch into a
    stored clustering via the quotient-rep graph gives EXACTLY the
    labels a full CC recompute over all edges gives — including merges
    of two previously-separate old clusters and brand-new docs."""
    from pyspark.sql import functions as F

    from lakehouse_weather_spark.operators.dedup import (
        label_propagate,
        update_clusters,
    )

    def pairs_df(pairs):
        return spark.createDataFrame(pairs, "doc_a long, doc_b long")

    def bidir(df):
        return df.unionByName(
            df.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )

    # old graph: {1,2,3} and {10,11}; {20} untouched elsewhere, {30,31}
    old_pairs = [(1, 2), (2, 3), (10, 11), (30, 31)]
    old_labels = label_propagate(bidir(pairs_df(old_pairs))).select(
        "doc_id", F.col("label").alias("cluster_rep")
    )
    # singleton doc 20 exists in the stored artifact too
    old_labels = old_labels.unionByName(
        spark.createDataFrame([(20, 20)], "doc_id long, cluster_rep long")
    )

    # new batch: merges old clusters {1,2,3}+{10,11} via (3,10); links
    # a NEW doc 99 into {30,31}; creates a fresh pair (40,41)
    new_pairs = [(3, 10), (99, 31), (40, 41)]
    got = {
        (r.doc_id, r.cluster_rep)
        for r in update_clusters(old_labels, pairs_df(new_pairs)).collect()
    }

    full = label_propagate(bidir(pairs_df(old_pairs + new_pairs)))
    want = {(r.doc_id, r.label) for r in full.collect()}
    want.add((20, 20))  # the untouched singleton
    assert got == want
    # spot: merged cluster takes the global min rep
    assert (11, 1) in got and (99, 30) in got and (41, 40) in got


def test_concurrent_publish_last_writer_wins(tmp_path):
    """Two (here: eight) simultaneous publish calls must all commit
    distinct versions with no lost table: the staged write happens
    unlocked, the version claim + pointer swap serialize under the
    table lock, and the final pointer names a complete version from
    one of the racing writers (last lock-holder wins; its predecessors
    stay readable as retained versions)."""
    import json
    from concurrent.futures import ThreadPoolExecutor

    from lakehouse_weather_spark.pipeline.atomic import (
        current_version,
        list_versions,
        publish,
        resolve,
    )

    table = str(tmp_path / "vt_race")
    n_writers = 8

    def write_one(writer_id):
        def write_fn(path):
            os.makedirs(path)
            # multi-file write: a torn publish would be visible as a
            # missing part or mixed writer_ids within one version
            for part in range(3):
                with open(os.path.join(path, f"part-{part}.json"), "w") as fh:
                    json.dump({"writer": writer_id, "part": part}, fh)

        return publish(table, write_fn, keep=n_writers)

    with ThreadPoolExecutor(max_workers=n_writers) as pool:
        paths = list(pool.map(write_one, range(n_writers)))

    # every writer committed a DISTINCT version directory
    assert len(set(paths)) == n_writers
    versions = [os.path.basename(p) for p in paths]
    assert sorted(versions) == sorted(list_versions(table))

    # the pointer names the highest-numbered (last-committed) version
    assert current_version(table) == max(versions)
    assert resolve(table) == os.path.join(table, max(versions))

    # no torn version anywhere: each retained version is complete and
    # single-writer
    for v in list_versions(table):
        vdir = os.path.join(table, v)
        parts = sorted(p for p in os.listdir(vdir) if p.startswith("part-"))
        assert parts == ["part-0.json", "part-1.json", "part-2.json"]
        writers = {
            json.load(open(os.path.join(vdir, p)))["writer"] for p in parts
        }
        assert len(writers) == 1

    # no leftover staging or lock artifacts
    leftovers = [
        d for d in os.listdir(table) if d.startswith((".stage-", "._LOCK"))
    ]
    assert leftovers == []


def test_concurrent_publish_prune_respects_live_claims(tmp_path):
    """keep=0 pruning under contention: racing writers must never
    delete a version another writer just committed as current, and the
    surviving pointer always resolves to a complete directory."""
    from concurrent.futures import ThreadPoolExecutor

    from lakehouse_weather_spark.pipeline.atomic import (
        publish,
        read_version,  # noqa: F401  (import proves API intact)
        resolve,
    )

    table = str(tmp_path / "vt_race2")

    def write_one(writer_id):
        def write_fn(path):
            os.makedirs(path)
            with open(os.path.join(path, "data.txt"), "w") as fh:
                fh.write(str(writer_id))

        return publish(table, write_fn, keep=0)

    with ThreadPoolExecutor(max_workers=6) as pool:
        list(pool.map(write_one, range(6)))

    final = resolve(table)
    assert os.path.isdir(final)
    assert open(os.path.join(final, "data.txt")).read() in {
        str(i) for i in range(6)
    }


def test_manifest_history_and_schema_tracking(spark, sf_dir, tmp_path):
    """Each committed version carries a manifest (inside the version
    dir, so it commits/prunes atomically with the data and is invisible
    to parquet readers): history() exposes the commit chain with
    schemas, enabling drift detection between versions."""
    from lakehouse_weather_spark.pipeline.atomic import (
        history,
        publish_df,
        read_current,
    )

    table = str(tmp_path / "vt_hist")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    publish_df(docs.select("doc_id", "lang"), table, count_rows=True)
    publish_df(docs.select("doc_id", "lang", "source"), table)

    h = history(table)
    assert [e["version"] for e in h] == ["v000001", "v000002"]
    assert h[1]["parent"] == "v000001"
    assert h[0]["n_rows"] == docs.count()
    cols1 = [f["name"] for f in h[0]["schema"]["fields"]]
    cols2 = [f["name"] for f in h[1]["schema"]["fields"]]
    assert cols2 == cols1 + ["source"]  # additive drift visible

    # manifest is invisible to the parquet read path
    assert set(read_current(spark, table).columns) == {
        "doc_id",
        "lang",
        "source",
    }


def test_update_join_view_equals_full_recompute(spark, sf_dir):
    from pyspark.sql import functions as F

    from lakehouse_weather_spark.pipeline.incremental import update_join_view
    from lakehouse_weather_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity"
    )
    # split both sides into an 80% base and a 20% "new arrivals" delta
    a_old = orders.filter(F.col("o_orderkey") % 5 != 0)
    delta_a = orders.filter(F.col("o_orderkey") % 5 == 0)
    b_old = li.filter(F.col("l_linenumber") % 4 != 0)
    delta_b = li.filter(F.col("l_linenumber") % 4 == 0)

    view = a_old.join(b_old, "o_orderkey")
    maintained = update_join_view(
        view, a_old, delta_a, b_old, delta_b, "o_orderkey"
    )
    full = orders.join(li, "o_orderkey")

    key = ["o_orderkey", "l_linenumber"]
    assert maintained.count() == full.count()
    assert (
        maintained.select(*key).exceptAll(full.select(*key)).count() == 0
    )
    assert (
        full.select(*key).exceptAll(maintained.select(*key)).count() == 0
    )
    # the deltas genuinely contributed every term of the delta rule
    assert delta_a.count() > 0 and delta_b.count() > 0
    assert delta_a.join(delta_b, "o_orderkey").count() > 0


def test_bitmap_partials_fold_in_equals_recompute(spark, sf_dir):
    from pyspark.sql import functions as F

    from lakehouse_weather_spark.pipeline.incremental import (
        update_bitmap_partials,
    )
    from lakehouse_weather_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    # split: history vs a late-arriving batch (every 3rd event)
    old = ev.filter(F.col("event_id") % 3 != 0)
    late = ev.filter(F.col("event_id") % 3 == 0)

    def partials(df):
        return (
            df.select(
                F.date_trunc("day", "ts").alias("d"),
                F.bitmap_bucket_number("user_id").alias("bucket"),
                F.bitmap_bit_position("user_id").alias("pos"),
            )
            .groupBy("d", "bucket")
            .agg(F.bitmap_construct_agg("pos").alias("bm"))
        )

    merged = update_bitmap_partials(partials(old), late)
    full = partials(ev)

    def counts(p):
        return {
            r.d: r.n
            for r in p.groupBy("d")
            .agg(F.sum(F.bitmap_count("bm")).alias("n"))
            .collect()
        }

    assert counts(merged) == counts(full)
    # and the late batch genuinely added users on some day
    assert counts(partials(old)) != counts(full)


def test_publish_schema_enforcement(spark, sf_dir, tmp_path):
    import pytest

    from lakehouse_weather_spark.pipeline.atomic import (
        SchemaMismatchError,
        history,
        publish_df,
    )
    from lakehouse_weather_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    table = str(tmp_path / "enforced")
    publish_df(docs.select("doc_id", "lang"), table)

    # evolve (default): additive column OK
    publish_df(docs.select("doc_id", "lang", "source"), table)
    # evolve: dropping a column is rejected BEFORE any data write
    with pytest.raises(SchemaMismatchError, match="dropped"):
        publish_df(docs.select("doc_id"), table)
    # evolve: retyping a column is rejected
    import pyspark.sql.functions as F

    retyped = docs.select(
        "doc_id", F.col("lang").cast("binary").alias("lang"), "source"
    )
    with pytest.raises(SchemaMismatchError, match="retyped"):
        publish_df(retyped, table)
    # enforce: even additive drift is rejected
    with pytest.raises(SchemaMismatchError, match="added"):
        publish_df(
            docs.select("doc_id", "lang", "source", "n_chars"),
            table,
            schema_mode="enforce",
        )
    # enforce with the exact committed schema passes
    publish_df(
        docs.select("doc_id", "lang", "source"), table, schema_mode="enforce"
    )
    # overwrite: explicit full replacement is allowed and recorded
    publish_df(docs.select("doc_id"), table, schema_mode="overwrite")
    fields = history(table)[-1]["schema"]["fields"]
    assert [f["name"] for f in fields] == ["doc_id"]
    # rejected publishes must not have left versions behind
    assert len([h for h in history(table)]) <= 4  # keep=2 + committed


def test_vacuum_retention(spark, sf_dir, tmp_path):
    import pytest

    from lakehouse_weather_spark.pipeline.atomic import (
        list_versions,
        publish_df,
        read_version,
        vacuum,
    )
    from lakehouse_weather_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    table = str(tmp_path / "vacuumed")
    for n in (10, 20, 30, 40):
        publish_df(docs.limit(n), table, keep=10)
    assert list_versions(table) == ["v000001", "v000002", "v000003", "v000004"]

    removed = vacuum(table, keep=1)
    assert removed == ["v000001", "v000002"]
    assert list_versions(table) == ["v000003", "v000004"]
    # committed version still reads; vacuumed time travel raises
    assert read_version(spark, table, "v000004").count() == 40
    assert read_version(spark, table, "v000003").count() == 30
    with pytest.raises(FileNotFoundError):
        read_version(spark, table, "v000001")
    # idempotent: nothing further to remove at the same horizon
    assert vacuum(table, keep=1) == []
    # keep=0 drops every predecessor, never the committed version
    assert vacuum(table, keep=0) == ["v000003"]
    assert list_versions(table) == ["v000004"]
    # the RETENTION-EXPIRY path is clean-room-reader conformant (the
    # export skips vacuumed versions; the survivor must read back)
    _assert_clean_room_conformant(spark, table)


def test_merge_upsert_update_insert_delete(spark, tmp_path):
    """Delta-MERGE semantics on the versioned store: updates replace
    matched keys, new keys insert, delete keys vanish — and every
    predecessor stays time-travelable."""
    from lakehouse_weather_spark.pipeline.atomic import (
        list_versions,
        merge_upsert,
        publish_df,
        read_current,
        read_version,
    )

    table = str(tmp_path / "merged")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, s string, v int"
    )
    publish_df(base, table, keep=10)

    updates = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "k int, s string, v int"
    )
    deletes = spark.createDataFrame([(3,)], "k int")
    merge_upsert(spark, table, updates, key="k", deletes=deletes, keep=10)

    got = {
        (r.k, r.s, r.v) for r in read_current(spark, table).collect()
    }
    assert got == {(1, "a", 10), (2, "B", 200), (4, "d", 40)}
    # time travel: the pre-merge snapshot is intact
    v1 = {(r.k, r.s, r.v) for r in read_version(spark, table, "v000001").collect()}
    assert v1 == {(1, "a", 10), (2, "b", 20), (3, "c", 30)}
    assert list_versions(table) == ["v000001", "v000002"]
    # the MERGE mutation path is clean-room-reader conformant
    _assert_clean_room_conformant(spark, table)


def test_merge_upsert_schema_evolution(spark, tmp_path):
    """An evolving merge may ADD columns; untouched base rows take NULL
    (Delta mergeSchema semantics). Enforce mode rejects the same merge
    before any data is written."""
    import pytest as _pytest

    from lakehouse_weather_spark.pipeline.atomic import (
        SchemaMismatchError,
        merge_upsert,
        publish_df,
        read_current,
    )

    table = str(tmp_path / "evolving")
    publish_df(
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"), table
    )
    updates = spark.createDataFrame(
        [(2, 200, "new"), (5, 50, "col")], "k int, v int, extra string"
    )
    with _pytest.raises(SchemaMismatchError):
        merge_upsert(spark, table, updates, key="k", schema_mode="enforce")
    merge_upsert(spark, table, updates, key="k", schema_mode="evolve")
    got = {
        (r.k, r.v, r.extra) for r in read_current(spark, table).collect()
    }
    assert got == {(1, 10, None), (2, 200, "new"), (5, 50, "col")}
    # the SCHEMA-EVOLUTION mutation path is clean-room-reader conformant
    _assert_clean_room_conformant(spark, table)


def test_external_reader_parity_duckdb(spark, sf_dir, tmp_path):
    """Interop: DuckDB reads the committed snapshot through
    external_read_path and sees the exact Spark rows — the versioned
    store is plain parquet plus a pointer, not a private format."""
    import duckdb

    from lakehouse_weather_spark.pipeline.atomic import (
        external_read_path,
        merge_upsert,
        publish_df,
    )
    from lakehouse_weather_spark.sources.tables import load_table

    table = str(tmp_path / "interop")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    publish_df(docs, table, keep=10)
    # a merge in between proves the pointer, not a stale dir, is read
    upd = spark.createDataFrame([(0, "xx", 1)], "doc_id long, lang string, n_chars long")
    merge_upsert(spark, table, upd, key="doc_id", keep=10)

    con = duckdb.connect()
    duck = {
        tuple(r)
        for r in con.execute(
            f"SELECT doc_id, lang, n_chars FROM"
            f" read_parquet('{external_read_path(table)}')"
        ).fetchall()
    }
    from lakehouse_weather_spark.pipeline.atomic import read_current

    sparkside = {
        (r.doc_id, r.lang, r.n_chars)
        for r in read_current(spark, table).collect()
    }
    assert duck == sparkside and (0, "xx", 1) in duck


def test_merge_conflict_detection_prevents_lost_update(spark, tmp_path):
    """The lost-update race Delta's optimistic concurrency exists for:
    a merge derived from a stale snapshot must NOT commit over a
    concurrent merge. The conditional publish aborts it; the retry
    re-derives from the new snapshot and BOTH merges' rows survive."""
    import pytest as _pytest

    from lakehouse_weather_spark.pipeline.atomic import (
        ConcurrentModificationError,
        current_version,
        merge_upsert,
        publish_df,
        read_current,
    )

    table = str(tmp_path / "race")
    publish_df(
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"),
        table,
        keep=10,
    )

    # Writer A derives its merge from v1 ...
    stale_version = current_version(table)
    base = read_current(spark, table)
    upd_a = spark.createDataFrame([(3, 30)], "k int, v int")
    merged_a = base.join(upd_a.select("k"), "k", "left_anti").unionByName(
        upd_a
    )

    # ... then writer B commits first (its own merge).
    merge_upsert(
        spark,
        table,
        spark.createDataFrame([(4, 40)], "k int, v int"),
        key="k",
        keep=10,
    )

    # A's CONDITIONAL publish on the stale version must abort ...
    with _pytest.raises(ConcurrentModificationError):
        publish_df(
            merged_a, table, keep=10, expected_version=stale_version
        )
    # ... without moving the pointer or leaving staging debris
    assert current_version(table) == "v000002"
    assert not [
        d for d in os.listdir(table) if d.startswith(".stage-")
    ]

    # The retrying path (merge_upsert) re-derives and lands BOTH rows.
    merge_upsert(spark, table, upd_a, key="k", keep=10)
    got = {(r.k, r.v) for r in read_current(spark, table).collect()}
    assert got == {(1, 10), (2, 20), (3, 30), (4, 40)}


def test_delta_log_export_structure_and_replay(spark, tmp_path):
    """export_delta_log writes a protocol-1/2 log whose replay yields
    exactly the committed snapshot's files, with a schemaString that
    matches the published DataFrame's Spark schema."""
    import json

    from lakehouse_weather_spark.pipeline.atomic import (
        export_delta_log,
        publish_df,
        replay_delta_log,
        resolve,
    )

    table_dir = str(tmp_path / "dtable")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).cast("double").alias("v"),
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("name"),
    )
    publish_df(df, table_dir)
    log_dir = export_delta_log(table_dir)
    commit = os.path.join(log_dir, "00000000000000000000.json")
    assert os.path.exists(commit)
    actions = [json.loads(line) for line in open(commit)]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    assert actions[0]["protocol"] == {
        "minReaderVersion": 1,
        "minWriterVersion": 2,
    }
    adds = [a["add"] for a in actions if "add" in a]
    assert adds and all(a["path"].startswith("v") for a in adds)
    # every add's file exists with the recorded size
    for a in adds:
        full = os.path.join(table_dir, a["path"])
        assert os.path.getsize(full) == a["size"]
    # replay == the committed snapshot's parquet set
    files, schema_string = replay_delta_log(table_dir)
    committed = {
        os.path.join(resolve(table_dir), f)
        for f in os.listdir(resolve(table_dir))
        if f.endswith(".parquet")
    }
    assert set(files) == committed
    # schemaString round-trips through Spark's own schema JSON parser
    from pyspark.sql.types import StructType

    parsed = StructType.fromJson(json.loads(schema_string))
    assert [f.name for f in parsed.fields] == ["k", "v", "name"]
    assert [f.dataType.simpleString() for f in parsed.fields] == [
        "bigint",
        "double",
        "string",
    ]
    # the replayed files read back to the published rows
    back = spark.read.parquet(*files)
    assert back.count() == 100
    assert back.agg(F.sum("v")).collect()[0][0] == float(sum(2 * i for i in range(100)))


def test_delta_log_export_tracks_new_publish(spark, tmp_path):
    """Re-export after a second publish points at the NEW version's
    files only (the export follows the pointer)."""
    from lakehouse_weather_spark.pipeline.atomic import (
        current_version,
        export_delta_log,
        publish_df,
        replay_delta_log,
    )

    table_dir = str(tmp_path / "dtable2")
    publish_df(spark.range(0, 10).select(F.col("id").alias("k")), table_dir)
    export_delta_log(table_dir)
    v1_files, _ = replay_delta_log(table_dir)
    publish_df(spark.range(0, 20).select(F.col("id").alias("k")), table_dir)
    export_delta_log(table_dir)
    v2_files, _ = replay_delta_log(table_dir)
    v2 = current_version(table_dir)
    assert all(f"/{v2}/" in f for f in v2_files)
    assert set(v1_files).isdisjoint(v2_files)
    assert spark.read.parquet(*v2_files).count() == 20


def test_delta_scan_external_read(spark, tmp_path):
    """Real external-reader proof via DuckDB's delta extension —
    skip-gated: the extension needs a network install, absent in this
    container."""
    import duckdb
    import pytest

    con = duckdb.connect()
    try:
        con.execute("LOAD delta")
    except Exception:
        pytest.skip("duckdb delta extension unavailable (no network)")

    from lakehouse_weather_spark.pipeline.atomic import (
        export_delta_log,
        publish_df,
    )

    table_dir = str(tmp_path / "dtable3")
    publish_df(
        spark.range(0, 50).select(F.col("id").alias("k")), table_dir
    )
    export_delta_log(table_dir)
    n = con.sql(f"SELECT count(*) FROM delta_scan('{table_dir}')").fetchone()[0]
    assert n == 50


def test_delta_log_export_is_multi_commit(spark, tmp_path):
    """Each publish+export appends ONE new commit (removes of the prior
    snapshot + adds of the new one); replay honors at_version for
    external time travel; re-export with no new version is a no-op."""
    import json

    from lakehouse_weather_spark.pipeline.atomic import (
        export_delta_log,
        publish_df,
        replay_delta_log,
    )

    table_dir = str(tmp_path / "dmulti")
    publish_df(spark.range(0, 10).select(F.col("id").alias("k")), table_dir)
    export_delta_log(table_dir)
    publish_df(spark.range(0, 25).select(F.col("id").alias("k")), table_dir)
    export_delta_log(table_dir)
    log_dir = os.path.join(table_dir, "_delta_log")
    commits = sorted(
        f for f in os.listdir(log_dir)
        if f.endswith(".json") and f[:-5].isdigit()
    )
    assert commits == [
        "00000000000000000000.json",
        "00000000000000000001.json",
    ]
    c1 = [json.loads(ln) for ln in open(os.path.join(log_dir, commits[1]))]
    kinds = [next(iter(a)) for a in c1]
    # commit 1: schema unchanged -> no metaData; the old snapshot's
    # files removed, the new one's added
    assert "metaData" not in kinds and "protocol" not in kinds
    assert kinds.count("remove") >= 1 and kinds.count("add") >= 1
    removed = {a["remove"]["path"] for a in c1 if "remove" in a}
    assert all(p.startswith("v000001/") for p in removed)
    # time travel through the exported history
    v1_files, _ = replay_delta_log(table_dir, at_version="v000001")
    v2_files, _ = replay_delta_log(table_dir, at_version="v000002")
    head_files, _ = replay_delta_log(table_dir)
    assert head_files == v2_files
    assert spark.read.parquet(*v1_files).count() == 10
    assert spark.read.parquet(*v2_files).count() == 25
    # idempotent: nothing new to export -> no new commit
    export_delta_log(table_dir)
    assert sorted(
        f for f in os.listdir(log_dir)
        if f.endswith(".json") and f[:-5].isdigit()
    ) == commits


def test_delta_log_export_ntz_needs_feature_protocol(spark, tmp_path):
    """TIMESTAMP_NTZ columns require reader 3 / writer 7 with the
    timestampNtz table feature — protocol 1/2 with an NTZ column is
    protocol-invalid (round-6 ADVICE)."""
    import json

    from lakehouse_weather_spark.pipeline.atomic import (
        export_delta_log,
        publish_df,
    )

    table_dir = str(tmp_path / "dntz")
    df = spark.range(0, 5).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 3600)
        .cast("timestamp_ntz")
        .alias("ts"),
    )
    publish_df(df, table_dir)
    export_delta_log(table_dir)
    commit = os.path.join(
        table_dir, "_delta_log", "00000000000000000000.json"
    )
    actions = [json.loads(ln) for ln in open(commit)]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto == {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["timestampNtz"],
        "writerFeatures": ["timestampNtz"],
    }
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert '"timestamp_ntz"' in meta["schemaString"]


def test_delta_log_checkpoint_every_10_commits(spark, tmp_path):
    """Commit 10 gets a classic checkpoint parquet + _last_checkpoint
    pointer whose add set equals the live snapshot at that commit."""
    import json

    import pyarrow.parquet as pq

    from lakehouse_weather_spark.pipeline.atomic import (
        export_delta_log,
        publish_df,
        replay_delta_log,
    )

    table_dir = str(tmp_path / "dckpt")
    for i in range(11):
        publish_df(
            spark.range(0, 5 + i).select(F.col("id").alias("k")),
            table_dir,
        )
        export_delta_log(table_dir)
    log_dir = os.path.join(table_dir, "_delta_log")
    ckpt = os.path.join(log_dir, f"{10:020d}.checkpoint.parquet")
    assert os.path.exists(ckpt)
    last = json.load(open(os.path.join(log_dir, "_last_checkpoint")))
    assert last["version"] == 10
    tbl = pq.read_table(ckpt)
    assert set(tbl.column_names) == {"protocol", "metaData", "add", "remove"}
    adds = [a for a in tbl.column("add").to_pylist() if a is not None]
    live, _ = replay_delta_log(table_dir, at_version="v000011")
    assert sorted(os.path.join(table_dir, a["path"]) for a in adds) == live
    assert last["size"] == len(tbl)
    # exactly one protocol and one metaData row
    assert sum(p is not None for p in tbl.column("protocol").to_pylist()) == 1
    assert sum(m is not None for m in tbl.column("metaData").to_pylist()) == 1


def test_delta_log_export_skips_vacuumed_versions(spark, tmp_path):
    """Publishing several versions between exports (retention keep=2)
    jumps the log straight to the oldest retained successor — the same
    bounded history as time travel past VACUUM."""
    from lakehouse_weather_spark.pipeline.atomic import (
        export_delta_log,
        publish_df,
        replay_delta_log,
    )

    table_dir = str(tmp_path / "dvac")
    publish_df(spark.range(0, 3).select(F.col("id").alias("k")), table_dir)
    export_delta_log(table_dir)
    # v2..v5; keep=2 retains the committed v5 plus v3, v4 — v2 is gone
    # by the time the second export runs
    for n in (7, 9, 13, 17):
        publish_df(
            spark.range(0, n).select(F.col("id").alias("k")), table_dir
        )
    export_delta_log(table_dir)
    files, _ = replay_delta_log(table_dir)
    assert spark.read.parquet(*files).count() == 17
    v3_files, _ = replay_delta_log(table_dir, at_version="v000003")
    assert spark.read.parquet(*v3_files).count() == 9
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        replay_delta_log(table_dir, at_version="v000002")


def test_delta_log_export_partitioned(spark, tmp_path):
    """A hive-partitioned publish exports partitionColumns in metaData
    and per-file partitionValues parsed from the directory layout; the
    replayed snapshot reads back (Spark partition discovery AND duckdb
    hive_partitioning) with the partition column recovered from paths,
    and an empty partitioned publish still exports a valid zero-add
    commit from the manifest schema."""
    import json

    import duckdb

    from lakehouse_weather_spark.pipeline.atomic import (
        export_delta_log,
        external_read_path,
        publish_df,
        replay_delta_log,
        resolve,
    )

    table_dir = str(tmp_path / "ptable")
    df = spark.range(0, 60).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("bucket"),
        (F.col("id") * 7).alias("v"),
    )
    vpath = publish_df(df, table_dir, partition_by=["bucket"])
    log_dir = export_delta_log(table_dir)
    commit = os.path.join(log_dir, "00000000000000000000.json")
    actions = [json.loads(line) for line in open(commit)]
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["partitionColumns"] == ["bucket"]
    # the partition column is in the FULL schema even though data
    # files don't contain it
    from pyspark.sql.types import StructType

    parsed = StructType.fromJson(json.loads(meta["schemaString"]))
    assert "bucket" in [f.name for f in parsed.fields]
    adds = [a["add"] for a in actions if "add" in a]
    assert adds and all(
        a["partitionValues"].get("bucket") in {"0", "1", "2"} for a in adds
    )
    # replay -> Spark read with partition discovery recovers bucket
    files, _schema = replay_delta_log(table_dir)
    assert set(files) == {
        os.path.join(resolve(table_dir), a["path"].split("/", 1)[1])
        for a in adds
    }
    back = spark.read.option("basePath", vpath).parquet(*files)
    # partition TYPE inference reads "0" back as int — the recovered
    # VALUE is what the layout guarantees; cast for comparison
    got = {
        (r["bucket"], r["n"])
        for r in back.groupBy(
            F.col("bucket").cast("string").alias("bucket")
        ).agg(F.count("*").alias("n")).collect()
    }
    assert got == {("0", 20), ("1", 20), ("2", 20)}
    # duckdb reads the same snapshot through the recursive glob
    glob = external_read_path(table_dir)
    assert "**" in glob
    dk = duckdb.sql(
        f"SELECT bucket, count(*) n FROM"
        f" read_parquet('{glob}', hive_partitioning=true)"
        f" GROUP BY bucket ORDER BY bucket"
    ).fetchall()
    assert [(str(b), n) for b, n in dk] == [("0", 20), ("1", 20), ("2", 20)]
    # empty partitioned publish: zero-add commit, manifest schema
    empty_dir = str(tmp_path / "etable")
    publish_df(df.limit(0), empty_dir, partition_by=["bucket"])
    elog = export_delta_log(empty_dir)
    eactions = [
        json.loads(line)
        for line in open(os.path.join(elog, "00000000000000000000.json"))
    ]
    assert not [a for a in eactions if "add" in a]
    emeta = next(a["metaData"] for a in eactions if "metaData" in a)
    assert emeta["partitionColumns"] == ["bucket"]
    efiles, eschema = replay_delta_log(empty_dir)
    assert efiles == [] and "bucket" in eschema


def test_compact_current_executes_the_plan(spark, tmp_path):
    """compact_current rewrites a many-small-files snapshot into the
    bin-packed file count as a NEW committed version (rows identical,
    old version retained), no-ops when already compact, and the delta
    export appends a commit for the compacted snapshot."""
    from lakehouse_weather_spark.pipeline.atomic import (
        compact_current,
        current_version,
        export_delta_log,
        list_versions,
        publish_df,
        replay_delta_log,
        resolve,
    )

    table_dir = str(tmp_path / "ctable")
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    publish_df(df.repartition(16), table_dir)
    v1 = current_version(table_dir)
    n_files_before = len(
        [f for f in os.listdir(resolve(table_dir)) if f.endswith(".parquet")]
    )
    assert n_files_before == 16
    total = sum(
        os.path.getsize(os.path.join(resolve(table_dir), f))
        for f in os.listdir(resolve(table_dir))
        if f.endswith(".parquet")
    )
    # target 1/4 of the total -> 4 output files
    new_path = compact_current(spark, table_dir, target_bytes=total // 4 + 1)
    assert new_path is not None and current_version(table_dir) != v1
    n_files_after = len(
        [f for f in os.listdir(resolve(table_dir)) if f.endswith(".parquet")]
    )
    assert n_files_after < n_files_before and n_files_after <= 4
    back = spark.read.parquet(resolve(table_dir))
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == 3 * sum(range(10_000))
    # the pre-compaction version is retained for time travel
    assert v1 in list_versions(table_dir)
    # idempotent: a second run at the same target is a no-op
    assert compact_current(spark, table_dir, target_bytes=total // 4 + 1) is None
    # the export records the compacted snapshot as its own commit
    export_delta_log(table_dir)
    files, _ = replay_delta_log(table_dir)
    assert len(files) == n_files_after
    # the COMPACTION mutation path is clean-room-reader conformant
    _assert_clean_room_conformant(spark, table_dir)


def test_compact_current_partitioned_snapshot(spark, tmp_path):
    """ADVICE r7 (medium + low): compacting a hive-partitioned snapshot
    must (a) not retype date/int-looking STRING partition values on
    read-back (manifest-schema read, else publish enforce raises
    SchemaMismatchError), (b) split a mega-partition across its own
    per-partition file target rather than one-file-per-partition-value,
    and (c) converge — the second run at the same target is a no-op."""
    import glob

    from lakehouse_weather_spark.pipeline.atomic import (
        compact_current,
        current_version,
        publish_df,
        read_current,
        resolve,
    )

    table_dir = str(tmp_path / "ptable")
    # day is a STRING that LOOKS like a date; bucket LOOKS like an int —
    # exactly the values partition-column inference retypes
    df = spark.range(0, 12_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 7).alias("v"),
        F.when(F.col("id") % 3 == 0, "2024-01-02")
        .when(F.col("id") % 3 == 1, "2024-01-03")
        .otherwise("2024-01-04")
        .alias("day"),
    )
    publish_df(df.repartition(12), table_dir, partition_by=["day"])
    v1 = current_version(table_dir)

    def files_per_partition():
        out = {}
        for day_dir in glob.glob(os.path.join(resolve(table_dir), "day=*")):
            out[os.path.basename(day_dir)] = [
                os.path.getsize(p)
                for p in glob.glob(os.path.join(day_dir, "*.parquet"))
            ]
        return out

    before = files_per_partition()
    assert all(len(sz) == 12 for sz in before.values())
    per_part_bytes = {p: sum(sz) for p, sz in before.items()}
    # target ~1/3 of each partition's bytes -> 3-4 files per partition,
    # NOT 1 (the old repartition(n, *partition_by) shape collapsed each
    # partition to a single file and never split large ones)
    target = max(per_part_bytes.values()) // 3 + 1
    new_path = compact_current(spark, table_dir, target_bytes=target)
    assert new_path is not None and current_version(table_dir) != v1
    after = files_per_partition()
    assert set(after) == set(before)  # partition values preserved as strings
    for p, sz in after.items():
        import math

        n_p = max(1, math.ceil(per_part_bytes[p] / target))
        assert 1 < len(sz) <= n_p, (p, len(sz), n_p)
    back = read_current(spark, table_dir)
    assert dict(back.dtypes)["day"] == "string"  # not retyped to date
    # the PARTITIONED-COMPACTION path is clean-room-reader conformant
    # (typed partitionValues reattach included)
    _assert_clean_room_conformant(spark, table_dir)
    assert back.count() == 12_000
    assert back.agg(F.sum("v")).collect()[0][0] == 7 * sum(range(12_000))
    # convergence: repeated scheduled runs must reach a steady no-op
    # within a couple of passes (the rewrite can shrink total bytes —
    # fewer files, less parquet overhead — lowering the per-partition
    # target by one once), never republish forever
    for _ in range(3):
        if compact_current(spark, table_dir, target_bytes=target) is None:
            break
    else:
        raise AssertionError("compaction never converged to a no-op")
