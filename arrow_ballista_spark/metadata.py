"""information_schema shim — catalog introspection as queryable views.

Reference parity: DataFusion/Ballista expose ``information_schema.tables``
and ``information_schema.columns`` when ``ballista.with_information_schema``
is set (``ballista/core/src/config.rs:43-44``; the CLI sets it by default,
``ballista-cli/src/main.rs``).  Spark has ``SHOW TABLES`` / ``DESCRIBE``
but no ANSI information_schema, so this module materializes one: a real
``information_schema`` database holding ``tables`` / ``columns`` views
built from the session catalog, refreshed on each call.

The views are tiny literal relations (one row per column of each
registered table) — catalog metadata, not data — so (re)creating them is
a driver-side operation with no executor work.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _q(s: str) -> str:
    """Escape a string for a single-quoted SQL literal."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def register_information_schema(
    spark: SparkSession, tables: list[str] | None = None
) -> None:
    """(Re)build ``information_schema.tables`` / ``.columns`` views.

    ``tables`` defaults to every temp view and table visible in the
    session's current database — same scope the reference's catalog
    provider enumerates.
    """
    if tables is None:
        tables = [t.name for t in spark.catalog.listTables()]

    col_rows: list[str] = []
    tab_rows: list[str] = []
    for t in sorted(tables):
        schema = spark.table(t).schema
        tab_rows.append(f"('{_q(t)}', 'VIEW')")
        for i, f in enumerate(schema.fields, start=1):
            col_rows.append(
                f"('{_q(t)}', '{_q(f.name)}', {i}, "
                f"'{_q(f.dataType.simpleString())}', "
                f"{'true' if f.nullable else 'false'})"
            )

    spark.sql("CREATE DATABASE IF NOT EXISTS information_schema")
    if tab_rows:
        spark.sql(
            "CREATE OR REPLACE VIEW information_schema.tables"
            "(table_name, table_type) AS SELECT * FROM VALUES "
            + ", ".join(tab_rows)
        )
        spark.sql(
            "CREATE OR REPLACE VIEW information_schema.columns"
            "(table_name, column_name, ordinal_position, data_type, "
            "is_nullable) AS SELECT * FROM VALUES " + ", ".join(col_rows)
        )
    else:  # empty catalog still yields queryable empty views
        spark.sql(
            "CREATE OR REPLACE VIEW information_schema.tables AS "
            "SELECT '' AS table_name, '' AS table_type WHERE false"
        )
        spark.sql(
            "CREATE OR REPLACE VIEW information_schema.columns AS "
            "SELECT '' AS table_name, '' AS column_name, 0 AS "
            "ordinal_position, '' AS data_type, true AS is_nullable "
            "WHERE false"
        )
