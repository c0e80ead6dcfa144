"""File-format readers: parquet / CSV / NDJSON / Avro (+ object stores).

Reference parity (SURVEY.md §2.B.1): ``ParquetScanExecNode`` (projection +
predicate pushdown + pruning, ``datafusion.proto:1158-1162``), ``CsvScanExec
Node`` with header/delimiter/inference (``:1163-1168``), ``read_json``/
``read_avro`` (``ballista/client/src/context.rs:214-231``), listing tables
with hive-style partition columns (``ListingTableScanNode``,
``datafusion.proto:99-116``).

All pushdown/pruning is native Spark — these helpers only pin the
reference's semantics (schema inference caps, header/delimiter defaults)
and widen to object-store URIs (s3a://, gs://, abfss://) transparently.

Scale notes: directory scans parallelize per file-split
(``spark.sql.files.maxPartitionBytes``, 128 MB default); schema inference
samples — at 100 TB always pass an explicit schema.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str, **opts: Any) -> DataFrame:
    return spark.read.options(**_str_opts(opts)).parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    sep: str = ",",
    **opts: Any,
) -> DataFrame:
    """CSV with reference defaults: header row on, comma delimiter.

    Schema inference when no schema is given: run the CSV reader's own
    ``inferSchema`` over the FIRST file of the dataset only (mirrors the
    reference's bounded ``schema_infer_max_records`` intent,
    ``python/src/context.rs:95-100``) — Spark's ``inferSchema`` over the
    full path re-reads the ENTIRE dataset (``samplingRatio`` samples rows
    but still opens every file), which at the 100 TB target is a full
    redundant pass; one shard bounds the extra scan to one file.

    Going through the csv reader (not ``spark.read.text`` + ``.rdd``)
    keeps three semantics correct: it works under Spark Connect (no RDD
    API), it respects per-file header rows (a text-based sample swallows
    later files' header lines as data, silently downgrading numeric
    columns to string), and it parses quoted multiline records instead
    of splitting them mid-record."""
    r = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        r = r.schema(schema)
    else:
        files = sorted(
            spark.read.option("header", header)
            .option("sep", sep)
            .options(**_str_opts(opts))
            .csv(path)
            .inputFiles()
        )

        def _infer(target):
            return spark.read.option("header", header).option(
                "sep", sep
            ).option("inferSchema", True).options(**_str_opts(opts)).csv(
                target
            )

        # Empty part files (part-00000 with only a header, or zero bytes)
        # are common in shuffle outputs; inferring from one makes every
        # column string for the whole dataset.  Walk the sorted listing
        # until a file yields at least one data row, bounded at a few
        # probes so a pathological all-empty prefix doesn't turn
        # inference back into a full-dataset scan; fall back to the
        # whole path only if every probed file is empty.
        sample = None
        for f in files[:8]:
            cand = _infer(f)
            if cand.limit(1).count() > 0:
                sample = cand
                break
        if sample is None:
            sample = _infer(files[0] if files else path)
        r = r.schema(sample.schema)
    return r.options(**_str_opts(opts)).csv(path)


def read_json(spark: SparkSession, path: str, schema=None, **opts: Any) -> DataFrame:
    """Newline-delimited JSON (reference read_json, context.rs:214-221)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.options(**_str_opts(opts)).json(path)


#: Avro datasource class (reference read_avro, context.rs:223-231).  Some
#: Spark builds bundle the avro classes in spark-sql but omit the
#: DataSourceRegister service entry, so the "avro" short name fails while
#: the fully-qualified class works — resolution order below handles both.
AVRO_FORMAT_CLASS = "org.apache.spark.sql.avro.AvroFileFormat"


def read_avro(spark: SparkSession, path: str, **opts: Any) -> DataFrame:
    """Avro scan.  Tries the registered "avro" short name, falls back to
    the fully-qualified class (bundled-but-unregistered builds), and only
    then raises the documented classpath gate."""
    r = spark.read.options(**_str_opts(opts))
    try:
        return r.format("avro").load(path)
    except Exception as e:
        if not ("avro" in str(e).lower() and "find" in str(e).lower()):
            raise
    try:
        return r.format(AVRO_FORMAT_CLASS).load(path)
    except Exception as e:  # pragma: no cover - jar-stripped environments
        raise RuntimeError(
            "Avro support requires the org.apache.spark:spark-avro "
            "package on the Spark classpath (add via SPARK_GRAFT_EXTRA_JARS "
            "or spark.jars.packages); it is not bundled with pip pyspark."
        ) from e


def write_avro(
    df: DataFrame, path: str, mode: str = "overwrite", **opts: Any
) -> None:
    """Avro sink (same short-name → FQCN resolution as :func:`read_avro`)."""
    w = df.write.mode(mode).options(**_str_opts(opts))
    try:
        w.format("avro").save(path)
        return
    except Exception as e:
        if not ("avro" in str(e).lower() and "find" in str(e).lower()):
            raise
    w.format(AVRO_FORMAT_CLASS).save(path)


def read_orc(spark: SparkSession, path: str, **opts: Any) -> DataFrame:
    """ORC scan (beyond-reference: arrow-ballista reads csv/parquet/avro/
    json only, ``ballista/client/src/context.rs:214-315`` — ORC is native
    in Spark and a common lakehouse format, so the engine exposes it).
    Projection/predicate pushdown and min/max pruning come from Spark's
    vectorized ORC reader, same as parquet."""
    return spark.read.options(**_str_opts(opts)).orc(path)


def avro_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.avro.AvroFileFormat"
        )
        return True
    except Exception:
        return False


def _str_opts(opts: dict[str, Any]) -> dict[str, str]:
    return {k: str(v) for k, v in opts.items()}


def read_text(
    spark: SparkSession, path: str, whole_text: bool = False, **opts: Any
) -> DataFrame:
    """Line-oriented text scan (``value`` column; one row per line, or one
    row per file with ``whole_text``) — the raw-ingest path for text
    corpora before parsing/tokenization.  Beyond-reference: arrow-ballista
    reads csv/parquet/avro/json only (context.rs:214-315)."""
    # the wholetext kwarg form is load-bearing: this Spark build ignores a
    # reader-level .option("wholetext", ...) for the text source
    return spark.read.options(**_str_opts(opts)).text(
        path, wholetext=whole_text
    )


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None, **opts: Any
) -> DataFrame:
    """Binary-file scan → ``(path, modificationTime, length, content)`` —
    the ingestion path for multimodal corpora (images/audio/video land as
    opaque ``binary`` + metadata, then flow through the Arrow-batched
    feature extractors in ``operators/multimodal.py``).  Scale notes: one
    row per file; pair with ``spark.sql.files.maxPartitionBytes`` and
    ``pathGlobFilter`` pushdown so listing/pruning stays on the driver's
    metadata path, never the content."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.options(**_str_opts(opts)).load(path)
