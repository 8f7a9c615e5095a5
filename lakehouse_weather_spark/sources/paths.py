"""One path resolver for every dataset location.

The reference hardwires MinIO bucket access through boto3
(``dags/access/minio_io_manager.py:8-197``); Spark instead reaches any
object store through the Hadoop filesystem layer, so the ONLY thing the
engine must do is (a) never mangle URI schemes with os.path and (b)
carry the connector configuration (session.py). Every read/write path
in the engine flows through :func:`dataset_path`, which makes
``SPARK_GRAFT_SF_DIR=s3a://bucket/prefix`` (or hdfs://, gs://, abfss://)
work unchanged given the standard public connector jars + credentials.
"""

from __future__ import annotations

REMOTE_SCHEMES = (
    "s3a://",
    "s3://",
    "gs://",
    "abfss://",
    "wasbs://",
    "hdfs://",
    "file://",
)


def is_remote(path: str) -> bool:
    """True when the path carries a filesystem scheme (handled by the
    Hadoop FS layer, not the local OS)."""
    return path.startswith(REMOTE_SCHEMES)


def dataset_path(base: str, *parts: str) -> str:
    """Join dataset path components scheme-safely (``os.path.join``
    would mis-handle ``s3a://`` URIs on some platforms and drop double
    slashes)."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out
