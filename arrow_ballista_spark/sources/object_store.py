"""Object-store registry — the deployment wiring that turns ``s3a://`` /
``gs://`` / ``abfss://`` URIs into working scans.

Reference parity: ``ballista/core/src/object_store_registry/mod.rs:60-115``
registers S3 / HDFS / Azure / GCS stores against URI schemes at context
build time (feature-gated on compiled-in cloud SDKs).  Spark's analogue is
the Hadoop FileSystem registry: any URI scheme resolves through
``fs.<scheme>.impl`` in the Hadoop configuration, and the cloud connectors
(hadoop-aws, gcs-connector, hadoop-azure) are classpath features exactly
like the reference's cargo features.

:func:`configure_object_store` sets the per-scheme Hadoop conf on a LIVE
session (SparkContext.hadoopConfiguration — reaches every executor);
:data:`S3A_CONF` / :data:`GCS_CONF` / :data:`ABFSS_CONF` document the
minimum production keys a cluster deployment must provide.  This container
has no cloud SDK jars and no network, so the tests exercise the registry
mechanism itself: registering a custom scheme backed by a local
``FileSystem`` implementation and scanning parquet through it — the same
resolution path an ``s3a://`` read takes, minus the wire protocol.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Minimum production configuration per scheme (values are deployment
# secrets/endpoints — never hardcode).  Keys mirror the reference's
# object_store_registry feature matrix (mod.rs:60-115).
S3A_CONF = {
    "fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
    "fs.s3a.access.key": "<ACCESS_KEY or use an IAM/instance profile>",
    "fs.s3a.secret.key": "<SECRET_KEY>",
    "fs.s3a.endpoint": "<optional: non-AWS endpoint>",
    "fs.s3a.aws.credentials.provider": (
        "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider or "
        "com.amazonaws.auth.InstanceProfileCredentialsProvider"
    ),
    # 100 TB tuning: committers + connection pool
    "fs.s3a.committer.name": "magic",
    "fs.s3a.connection.maximum": "96",
}
GCS_CONF = {
    "fs.gs.impl": "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
    "fs.AbstractFileSystem.gs.impl": (
        "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS"
    ),
    "google.cloud.auth.service.account.enable": "true",
    "google.cloud.auth.service.account.json.keyfile": "<path on nodes>",
}
ABFSS_CONF = {
    "fs.abfss.impl": "org.apache.hadoop.fs.azurebfs.SecureAzureBlobFileSystem",
    "fs.azure.account.auth.type.<account>.dfs.core.windows.net": "OAuth",
    "fs.azure.account.oauth.provider.type.<account>.dfs.core.windows.net": (
        "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider"
    ),
}

#: jar artifacts each scheme needs on the executor classpath (classpath
#: features, like the reference's cargo features s3/azure/gcs)
REQUIRED_JARS = {
    "s3a": ["org.apache.hadoop:hadoop-aws", "com.amazonaws:aws-java-sdk-bundle"],
    "gs": ["com.google.cloud.bigdataoss:gcs-connector"],
    "abfss": ["org.apache.hadoop:hadoop-azure"],
}


def configure_object_store(
    spark: SparkSession, scheme: str, conf: dict[str, str]
) -> None:
    """Register/configure a URI ``scheme`` on the live session.

    Writes into ``SparkContext.hadoopConfiguration`` — the registry every
    ``spark.read`` resolves schemes against (and which ships to executors
    with each task).  Call before the first read of that scheme: Hadoop
    caches ``FileSystem`` instances per (scheme, authority, ugi).
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)
    if not hconf.get(f"fs.{scheme}.impl"):
        # schemes without an explicit impl must resolve through Hadoop's
        # own registry (core-default + ServiceLoader), e.g. viewfs/hdfs
        try:
            spark._jvm.org.apache.hadoop.fs.FileSystem.getFileSystemClass(  # type: ignore[union-attr]
                scheme, hconf
            )
        except Exception as e:
            raise ValueError(
                f"no fs.{scheme}.impl configured and Hadoop cannot resolve "
                f"scheme '{scheme}' — pass the FileSystem implementation "
                f"class (see S3A_CONF/GCS_CONF/ABFSS_CONF)"
            ) from e


def scheme_available(spark: SparkSession, scheme: str) -> bool:
    """True when ``scheme`` resolves to a loadable FileSystem class —
    i.e. its connector jar is actually on the classpath."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    impl = hconf.get(f"fs.{scheme}.impl")
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # type: ignore[union-attr]
        return True
    except Exception:
        return False
