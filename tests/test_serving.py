"""JDBC serving endpoint (FlightSQL analogue, flight_sql.rs:485-870):
in-process HiveThriftServer2 round-trip via the bundled beeline client."""

from __future__ import annotations

import os
import subprocess
import time

import pyspark
import pytest

from arrow_ballista_spark.context import BallistaContext
from tests.conftest import SF_DIR

PORT = 17000 + (os.getpid() % 900)
SPARK_HOME = os.path.dirname(pyspark.__file__)
BEELINE = os.path.join(SPARK_HOME, "bin", "beeline")


def _beeline(sql: str) -> str:
    r = subprocess.run(
        [BEELINE, "-u", f"jdbc:hive2://localhost:{PORT}", "-e", sql],
        capture_output=True,
        text=True,
        timeout=180,
        env={**os.environ, "SPARK_HOME": SPARK_HOME},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


@pytest.fixture(scope="module")
def served_sql(spark):
    ctx = BallistaContext(spark=spark)
    ctx.register_parquet("jdbc_region", f"{SF_DIR}/region.parquet")
    try:
        srv = ctx.serve_sql(port=PORT)
    except RuntimeError as e:  # jar-stripped environment — gated like Avro
        pytest.skip(str(e))
    time.sleep(3)  # thrift service binds asynchronously
    yield ctx, srv
    ctx.stop_serving()


def test_jdbc_scalar_roundtrip(served_sql):
    out = _beeline("SELECT 6 * 7 AS answer")
    assert any("42" in line for line in out.splitlines())


def test_jdbc_sees_registered_tables(served_sql):
    """singleSession=true shares the context's temp-view catalog with the
    JDBC endpoint — a BI tool sees every registered table."""
    out = _beeline(
        "SELECT r_name FROM jdbc_region WHERE r_regionkey = 0"
    )
    assert any("AFRICA" in line for line in out.splitlines())


def test_connect_server_starts_and_listens(spark):
    """Spark Connect endpoint (the gRPC+Arrow FlightSQL analogue): start
    in-process and probe the gRPC socket.  The Python client needs grpcio
    (absent in this container), so liveness is asserted at the transport
    layer — a full client round-trip runs wherever grpcio is installed."""
    import socket

    from arrow_ballista_spark import serving

    port = 15300 + (os.getpid() % 500)
    try:
        handle = serving.start_connect_server(spark, port=port)
    except RuntimeError as e:
        pytest.skip(f"spark-connect jar absent: {e}")
    try:
        deadline = time.time() + 30
        last = None
        while time.time() < deadline:
            try:
                with socket.create_connection(("localhost", port), timeout=2):
                    break
            except OSError as exc:
                last = exc
                time.sleep(0.5)
        else:
            raise AssertionError(f"connect server never listened: {last}")
        assert handle.url == f"sc://localhost:{port}"
    finally:
        try:
            handle.stop()
        except Exception:
            pass


def test_flight_server_roundtrip(spark):
    """Arrow Flight endpoint (the reference's actual wire protocol,
    flight_sql.rs:485-870): full client round-trip with pyarrow.flight —
    get_flight_info for the schema + endpoint, do_get streaming the
    result as Arrow batches, list_flights enumerating the catalog."""
    import pyarrow.flight as flight

    from arrow_ballista_spark import serving

    spark.createDataFrame(
        [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA")],
        "r_regionkey long, r_name string",
    ).createOrReplaceTempView("flight_region")
    handle = serving.start_flight_server(spark, port=0)
    try:
        client = flight.connect(handle.location)
        desc = flight.FlightDescriptor.for_command(
            b"SELECT r_regionkey, upper(r_name) AS r_name "
            b"FROM flight_region WHERE r_regionkey < 2 ORDER BY 1"
        )
        info = client.get_flight_info(desc)
        assert [f.name for f in info.schema] == ["r_regionkey", "r_name"]
        table = client.do_get(info.endpoints[0].ticket).read_all()
        assert table.column("r_name").to_pylist() == ["AFRICA", "AMERICA"]
        assert table.column("r_regionkey").to_pylist() == [0, 1]
        # schema-only path runs no job
        sch = client.get_schema(desc).schema
        assert sch.names == ["r_regionkey", "r_name"]
        # catalog enumeration includes the temp view
        cmds = [
            fi.descriptor.command.decode()
            for fi in client.list_flights()
        ]
        assert any("flight_region" in c for c in cmds)
    finally:
        spark.catalog.dropTempView("flight_region")
        handle.stop()
