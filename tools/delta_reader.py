"""Clean-room Delta Lake log reader — an INDEPENDENT implementation of
the reader side of the public Delta transaction protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md), written
only from that spec. It shares ZERO code with the writer
(``lakehouse_weather_spark.pipeline.atomic``): it never imports the
package, re-derives every rule (commit discovery, checkpoint use,
action reconciliation, partition-value typing) from the protocol text,
and reads data through pyarrow only.

Purpose: the container has no network, so no true foreign engine
(duckdb delta extension, delta-rs, polars) can be installed to open the
store's ``_delta_log`` export — ``INSTALL delta`` fails with a download
error and no wheel/extension is cached (see
``tests/test_delta_clean_room_reader.py``). This module is the closest
offline substitute for that foreign-engine proof: a from-spec reader
that would catch writer bugs a shared-code replay (``replay_delta_log``)
cannot, because it asserts the PROTOCOL, not the writer's private
conventions. The still-skip-gated duckdb test remains the real-engine
proof once network exists.

Reader behavior implemented from the spec:

* Commit discovery: ``_delta_log/%020d.json`` files, replayed in
  version order; each line is one JSON action.
* Checkpoint use: ``_last_checkpoint`` names the newest checkpoint
  version; ``%020d.checkpoint.parquet`` holds the full state (one row
  per action); a reader starts from the newest checkpoint at-or-below
  its target version and replays only later JSON commits. Log cleanup
  may delete JSON commits covered by a checkpoint, so the reader must
  not require them.
* Action reconciliation (per the spec's "Action Reconciliation"):
  latest ``protocol`` and ``metaData`` win; ``add`` for a path replaces
  a prior ``add``/``remove`` for the same path; ``remove`` tombstones a
  prior ``add``. ``commitInfo`` is informational.
* Partition values: ``add.partitionValues`` is a string->string map
  (physical names); the logical column values are obtained by casting
  the string per the column's type in ``metaData.schemaString``; the
  empty string and null both decode per the spec's serialization rules.
* Protocol gate: a reader must refuse tables whose
  ``minReaderVersion`` (or reader feature set, for version 3) it does
  not support. This reader supports reader versions 1 and 3 with the
  ``timestampNtz``/``columnMapping``-free feature subset the spec
  defines for plain parquet tables, plus ``timestampNtz``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

_SUPPORTED_READER_FEATURES = {"timestampNtz", "v2Checkpoint"}


class DeltaProtocolError(ValueError):
    """The log violates the Delta protocol, or requires reader
    capabilities this implementation does not have."""


@dataclass
class Snapshot:
    version: int
    protocol: dict
    metadata: dict
    adds: dict[str, dict] = field(default_factory=dict)  # path -> add

    @property
    def schema(self) -> dict:
        return json.loads(self.metadata["schemaString"])

    @property
    def partition_columns(self) -> list[str]:
        return list(self.metadata.get("partitionColumns") or [])


def _spark_type_to_arrow(t) -> pa.DataType:
    """Spark schema-JSON type -> arrow type, for the subset of types a
    parquet Delta table can carry (protocol "Schema Serialization
    Format")."""
    if isinstance(t, dict):
        if t.get("type") == "array":
            return pa.list_(_spark_type_to_arrow(t["elementType"]))
        if t.get("type") == "map":
            return pa.map_(
                _spark_type_to_arrow(t["keyType"]),
                _spark_type_to_arrow(t["valueType"]),
            )
        if t.get("type") == "struct":
            return pa.struct(
                [
                    (f["name"], _spark_type_to_arrow(f["type"]))
                    for f in t["fields"]
                ]
            )
        raise DeltaProtocolError(f"unsupported nested type: {t}")
    return {
        "string": pa.string(),
        "long": pa.int64(),
        "integer": pa.int32(),
        "short": pa.int16(),
        "byte": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }.get(t) or _decimal_or_raise(t)


def _decimal_or_raise(t: str) -> pa.DataType:
    if isinstance(t, str) and t.startswith("decimal("):
        p, s = t[len("decimal(") : -1].split(",")
        return pa.decimal128(int(p), int(s))
    raise DeltaProtocolError(f"unsupported primitive type: {t}")


def _decode_partition_value(raw: str | None, arrow_type: pa.DataType):
    """Protocol "Partition Value Serialization": null stays null; the
    string otherwise parses per the column type."""
    if raw is None:
        return None
    if pa.types.is_string(arrow_type):
        return raw
    if raw == "":
        return None  # empty string serializes null for non-strings
    if pa.types.is_integer(arrow_type):
        return int(raw)
    if pa.types.is_floating(arrow_type):
        return float(raw)
    if pa.types.is_boolean(arrow_type):
        return raw == "true"
    if pa.types.is_date(arrow_type):
        import datetime

        return datetime.date.fromisoformat(raw)
    if pa.types.is_timestamp(arrow_type):
        import datetime

        return datetime.datetime.fromisoformat(raw)
    if pa.types.is_decimal(arrow_type):
        import decimal

        return decimal.Decimal(raw)
    raise DeltaProtocolError(
        f"unsupported partition column type: {arrow_type}"
    )


class DeltaTable:
    """Open a Delta table directory (the parent of ``_delta_log``)."""

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.log_dir = os.path.join(table_dir, "_delta_log")
        if not os.path.isdir(self.log_dir):
            raise DeltaProtocolError(f"no _delta_log under {table_dir}")

    # -- log discovery ----------------------------------------------------

    def _commit_versions(self) -> list[int]:
        out = []
        for f in os.listdir(self.log_dir):
            if f.endswith(".json") and f[: -len(".json")].isdigit():
                out.append(int(f[: -len(".json")]))
        return sorted(out)

    def _checkpoint_versions(self) -> list[int]:
        suffix = ".checkpoint.parquet"
        out = []
        for f in os.listdir(self.log_dir):
            if f.endswith(suffix) and f[: -len(suffix)].isdigit():
                out.append(int(f[: -len(suffix)]))
        return sorted(out)

    def latest_version(self) -> int:
        commits = self._commit_versions()
        ckpts = self._checkpoint_versions()
        if not commits and not ckpts:
            raise DeltaProtocolError("empty _delta_log")
        return max(commits + ckpts)

    # -- state reconstruction --------------------------------------------

    def _apply_action(self, snap: Snapshot, action: dict) -> None:
        if "protocol" in action:
            snap.protocol = action["protocol"]
        elif "metaData" in action:
            snap.metadata = action["metaData"]
        elif "add" in action:
            add = action["add"]
            snap.adds[add["path"]] = add
        elif "remove" in action:
            snap.adds.pop(action["remove"]["path"], None)
        # commitInfo / cdc / txn: informational for this reader

    def _load_checkpoint(self, snap: Snapshot, version: int) -> None:
        path = os.path.join(
            self.log_dir, f"{version:020d}.checkpoint.parquet"
        )
        tbl = pq.read_table(path)
        for batch in tbl.to_pylist():
            for kind in ("protocol", "metaData", "add", "remove"):
                if batch.get(kind) is not None:
                    payload = batch[kind]
                    if kind in ("metaData", "add"):
                        payload = _demap(payload)
                    self._apply_action(snap, {kind: payload})

    def snapshot(self, version: int | None = None) -> Snapshot:
        target = self.latest_version() if version is None else version
        commits = [v for v in self._commit_versions() if v <= target]
        ckpts = [v for v in self._checkpoint_versions() if v <= target]
        snap = Snapshot(version=target, protocol={}, metadata={})
        start = 0
        if ckpts:
            ck = max(ckpts)
            self._load_checkpoint(snap, ck)
            start = ck + 1
        replay = [v for v in commits if v >= start]
        # the log is contiguous from the checkpoint (or 0) to target,
        # else state is unreconstructable — a protocol-level error
        expected = list(range(start, target + 1))
        if replay != expected:
            raise DeltaProtocolError(
                f"missing commits {sorted(set(expected) - set(replay))}"
                f" for version {target}"
            )
        for v in replay:
            with open(os.path.join(self.log_dir, f"{v:020d}.json")) as fh:
                for line in fh:
                    if line.strip():
                        self._apply_action(snap, json.loads(line))
        self._check_protocol(snap)
        if not snap.metadata:
            raise DeltaProtocolError("no metaData in reconstructed state")
        return snap

    def _check_protocol(self, snap: Snapshot) -> None:
        if not snap.protocol:
            raise DeltaProtocolError("no protocol action in log")
        mrv = snap.protocol.get("minReaderVersion")
        if mrv not in (1, 2, 3):
            raise DeltaProtocolError(f"unsupported minReaderVersion {mrv}")
        if mrv == 2:
            # reader version 2 exists to signal column mapping
            # (PROTOCOL.md "Column Mapping"): physical parquet column
            # names may differ from the logical schema. This reader
            # resolves columns by logical name only, so accept v2
            # solely when the table's columnMapping mode is absent or
            # 'none' — anything else would be silently misread.
            mode = ((snap.metadata or {}).get("configuration") or {}).get(
                "delta.columnMapping.mode", "none"
            )
            if mode != "none":
                raise DeltaProtocolError(
                    f"columnMapping mode {mode!r} not supported"
                    " (logical-name reader)"
                )
        if mrv == 3:
            feats = set(snap.protocol.get("readerFeatures") or [])
            unsupported = feats - _SUPPORTED_READER_FEATURES
            if unsupported:
                raise DeltaProtocolError(
                    f"unsupported readerFeatures {sorted(unsupported)}"
                )

    # -- data -------------------------------------------------------------

    def to_arrow(self, version: int | None = None) -> pa.Table:
        """Materialize the snapshot as one arrow table: each add's
        parquet file read from ``table_dir``, partition columns
        reattached from ``partitionValues`` cast per the logical
        schema."""
        snap = self.snapshot(version)
        fields = [
            (f["name"], _spark_type_to_arrow(f["type"]))
            for f in snap.schema["fields"]
        ]
        schema = pa.schema(fields)
        partcols = snap.partition_columns
        if not snap.adds:
            return schema.empty_table()
        pieces = []
        for path in sorted(snap.adds):
            add = snap.adds[path]
            t = pq.read_table(os.path.join(self.table_dir, path))
            n = t.num_rows
            pvals = dict(add.get("partitionValues") or {})
            cols = []
            for name, typ in fields:
                if name in partcols:
                    v = _decode_partition_value(pvals.get(name), typ)
                    cols.append(pa.array([v] * n, type=typ))
                else:
                    if name not in t.column_names:
                        raise DeltaProtocolError(
                            f"column {name!r} missing from data file {path}"
                        )
                    cols.append(t.column(name).cast(typ))
            pieces.append(pa.table(dict(zip([f[0] for f in fields], cols))))
        return pa.concat_tables(pieces).cast(schema)

    # -- conformance ------------------------------------------------------

    def validate(self, version: int | None = None) -> list[str]:
        """Protocol-conformance audit of the log as written on disk.
        Returns a list of violations (empty = conformant)."""
        problems: list[str] = []
        try:
            snap = self.snapshot(version)
        except DeltaProtocolError as e:
            return [f"unreadable: {e}"]
        proto = snap.protocol
        if proto.get("minReaderVersion") == 3:
            if "readerFeatures" not in proto:
                problems.append("minReaderVersion 3 without readerFeatures")
            if proto.get("minWriterVersion") != 7:
                problems.append(
                    "reader version 3 requires writer version 7 per spec"
                )
        has_ntz = "timestamp_ntz" in snap.metadata.get("schemaString", "")
        feats = set(proto.get("readerFeatures") or [])
        if has_ntz and proto.get("minReaderVersion", 0) >= 3 and (
            "timestampNtz" not in feats
        ):
            problems.append(
                "schema uses timestamp_ntz but readerFeatures lacks"
                " timestampNtz"
            )
        partcols = snap.partition_columns
        schema_names = [f["name"] for f in snap.schema["fields"]]
        for c in partcols:
            if c not in schema_names:
                problems.append(
                    f"partitionColumns entry {c!r} not in schemaString"
                )
        for path, add in snap.adds.items():
            full = os.path.join(self.table_dir, path)
            if not os.path.isfile(full):
                problems.append(f"add.path {path!r} does not exist")
                continue
            if "size" in add and add["size"] != os.path.getsize(full):
                problems.append(
                    f"add.size mismatch for {path!r}:"
                    f" {add['size']} vs {os.path.getsize(full)}"
                )
            pv = dict(add.get("partitionValues") or {})
            if set(pv) != set(partcols):
                problems.append(
                    f"partitionValues keys {sorted(pv)} != partitionColumns"
                    f" {sorted(partcols)} for {path!r}"
                )
            if "stats" in add and add["stats"]:
                try:
                    json.loads(add["stats"])
                except ValueError:
                    problems.append(f"add.stats not JSON for {path!r}")
        # _last_checkpoint must point at an existing checkpoint
        last = os.path.join(self.log_dir, "_last_checkpoint")
        if os.path.exists(last):
            with open(last) as fh:
                lc = json.load(fh)
            ck = os.path.join(
                self.log_dir, f"{lc['version']:020d}.checkpoint.parquet"
            )
            if not os.path.isfile(ck):
                problems.append(
                    f"_last_checkpoint names missing checkpoint {lc}"
                )
        return problems


def _demap(obj):
    """Checkpoint parquet stores protocol maps as arrow map columns,
    which to_pylist yields as lists of (key, value) tuples; JSON
    commits store plain dicts. Normalize to dicts recursively."""
    if isinstance(obj, list) and all(
        isinstance(x, tuple) and len(x) == 2 for x in obj
    ):
        return {k: _demap(v) for k, v in obj}
    if isinstance(obj, dict):
        return {k: _demap(v) for k, v in obj.items()}
    return obj


def _main() -> None:  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser(
        description="Clean-room Delta log reader / validator"
    )
    ap.add_argument("table_dir")
    ap.add_argument("--version", type=int, default=None)
    args = ap.parse_args()
    dt = DeltaTable(args.table_dir)
    snap = dt.snapshot(args.version)
    problems = dt.validate(args.version)
    tbl = dt.to_arrow(args.version)
    print(
        json.dumps(
            {
                "version": snap.version,
                "n_files": len(snap.adds),
                "n_rows": tbl.num_rows,
                "columns": tbl.column_names,
                "partition_columns": snap.partition_columns,
                "violations": problems,
            }
        )
    )


if __name__ == "__main__":  # pragma: no cover
    _main()
