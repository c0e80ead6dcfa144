"""Object-store registry (sources/object_store.py — reference parity with
ballista/core/src/object_store_registry/mod.rs:60-115).

No cloud SDK jars and no network in this container, so the tests exercise
the exact mechanism an ``s3a://`` read uses — per-scheme resolution through
``fs.<scheme>.impl`` in the live Hadoop configuration — by registering a
custom scheme backed by a local FileSystem implementation and scanning
parquet through it, plus asserting the documented gating for the cloud
schemes themselves."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arrow_ballista_spark.sources import object_store
from tests.conftest import SF_DIR


def test_registered_scheme_scan_roundtrip(spark):
    """Register a non-local URI scheme (a ``viewfs://`` mount table — the
    multi-store federation layer, mounted here over the local store) and
    scan parquet through it; rows must equal the direct read.  This is the
    full reader→FileSystem-registry→scan path a cloud URI takes, minus
    only the wire protocol."""
    object_store.configure_object_store(
        spark,
        "viewfs",
        {"fs.viewfs.mounttable.cluster.link./data": f"file://{SF_DIR}"},
    )
    direct = spark.read.parquet(f"{SF_DIR}/region.parquet")
    via_mount = spark.read.parquet("viewfs://cluster/data/region.parquet")
    assert sorted(r.r_name for r in via_mount.collect()) == sorted(
        r.r_name for r in direct.collect()
    )
    # pushdown still works through the registered scheme
    one = via_mount.where(F.col("r_regionkey") == 0).collect()
    assert len(one) == 1


def test_scheme_available_reports_classpath_truth(spark):
    """s3a/gs/abfss impl classes are NOT on this classpath (no cloud SDK
    jars baked in) — scheme_available must say so instead of failing at
    scan time; a hadoop-common-backed scheme must report available."""
    object_store.configure_object_store(
        spark, "mock", {"fs.mock.impl": "org.apache.hadoop.fs.RawLocalFileSystem"}
    )
    assert object_store.scheme_available(spark, "mock")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for scheme, conf in (
        ("s3a", object_store.S3A_CONF),
        ("gs", object_store.GCS_CONF),
        ("abfss", object_store.ABFSS_CONF),
    ):
        hconf.set(f"fs.{scheme}.impl", conf[f"fs.{scheme}.impl"])
        assert not object_store.scheme_available(spark, scheme), scheme


def test_configure_requires_impl(spark):
    with pytest.raises(ValueError, match="fs.nosuch.impl"):
        object_store.configure_object_store(
            spark, "nosuch", {"fs.nosuch.some.key": "x"}
        )
