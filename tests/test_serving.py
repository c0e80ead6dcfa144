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


def test_flight_prepared_statement_roundtrip(spark):
    """FlightSQL prepared-statement lifecycle (flight_sql.rs:636-660,
    885-915, JSON envelope): create → bind via do_put (positional `?`
    and named `:name`) → get_flight_info/do_get → rebind → close."""
    import json

    import pyarrow as pa
    import pyarrow.flight as flight

    from arrow_ballista_spark import serving

    spark.createDataFrame(
        [(i, f"n{i}") for i in range(5)], "k long, name string"
    ).createOrReplaceTempView("flight_prep")
    handle = serving.start_flight_server(spark, port=0)
    try:
        client = flight.connect(handle.location)
        # create
        res = list(
            client.do_action(
                flight.Action(
                    "create_prepared_statement",
                    json.dumps(
                        {"query": "SELECT k, name FROM flight_prep "
                                  "WHERE k < ? ORDER BY k"}
                    ).encode(),
                )
            )
        )
        ps = json.loads(res[0].body.to_pybytes().decode())
        ref = json.dumps(ps).encode()
        desc = flight.FlightDescriptor.for_command(ref)
        # bind k < 2 positionally
        w, _ = client.do_put(desc, pa.schema([("p0", pa.int64())]))
        w.write_table(pa.table({"p0": [2]}))
        w.close()
        info = client.get_flight_info(desc)
        got = client.do_get(info.endpoints[0].ticket).read_all()
        assert got.column("k").to_pylist() == [0, 1]
        # rebind k < 4 — same handle, new parameter batch
        w, _ = client.do_put(desc, pa.schema([("p0", pa.int64())]))
        w.write_table(pa.table({"p0": [4]}))
        w.close()
        got = client.do_get(flight.Ticket(ref)).read_all()
        assert got.column("k").to_pylist() == [0, 1, 2, 3]
        # named-marker statement binds by column name
        res = list(
            client.do_action(
                flight.Action(
                    "create_prepared_statement",
                    json.dumps(
                        {"query": "SELECT count(*) AS n FROM flight_prep "
                                  "WHERE name = :nm"}
                    ).encode(),
                )
            )
        )
        ps2 = json.loads(res[0].body.to_pybytes().decode())
        desc2 = flight.FlightDescriptor.for_command(json.dumps(ps2).encode())
        w, _ = client.do_put(desc2, pa.schema([("nm", pa.string())]))
        w.write_table(pa.table({"nm": ["n3"]}))
        w.close()
        got = client.do_get(flight.Ticket(json.dumps(ps2).encode())).read_all()
        assert got.column("n").to_pylist() == [1]
        # close: the handle stops resolving
        list(
            client.do_action(
                flight.Action("close_prepared_statement", ref)
            )
        )
        import pytest as _pytest

        with _pytest.raises(flight.FlightServerError):
            client.do_get(flight.Ticket(ref)).read_all()
        # plain-SQL path is unaffected by the prepared machinery
        plain = flight.FlightDescriptor.for_command(
            b"SELECT count(*) AS n FROM flight_prep"
        )
        got = client.do_get(
            client.get_flight_info(plain).endpoints[0].ticket
        ).read_all()
        assert got.column("n").to_pylist() == [5]
    finally:
        spark.catalog.dropTempView("flight_prep")
        handle.stop()


def test_flight_do_put_rejects_bad_row_counts(spark):
    """A zero-row parameter batch must surface a clear FlightServerError
    (not an opaque IndexError through gRPC), and a multi-row batch must
    be rejected rather than silently binding only its first row."""
    import json

    import pyarrow as pa
    import pyarrow.flight as flight
    import pytest

    from arrow_ballista_spark import serving

    spark.createDataFrame([(1,)], "k long").createOrReplaceTempView(
        "flight_rows"
    )
    handle = serving.start_flight_server(spark, port=0)
    try:
        client = flight.connect(handle.location)
        res = list(
            client.do_action(
                flight.Action(
                    "create_prepared_statement",
                    json.dumps(
                        {"query": "SELECT k FROM flight_rows WHERE k = ?"}
                    ).encode(),
                )
            )
        )
        ps = json.loads(res[0].body.to_pybytes().decode())
        desc = flight.FlightDescriptor.for_command(json.dumps(ps).encode())
        schema = pa.schema([("p0", pa.int64())])
        for bad in (
            pa.table({"p0": pa.array([], pa.int64())}),
            pa.table({"p0": [1, 2]}),
        ):
            with pytest.raises(flight.FlightError, match="row"):
                w, _ = client.do_put(desc, schema)
                w.write_table(bad)
                w.close()
    finally:
        spark.catalog.dropTempView("flight_rows")
        handle.stop()


def test_marker_style_classification():
    """Binding style is decided at create time by scanning OUTSIDE string
    literals — a literal '?' inside a quoted constant must not flip a
    named-marker statement to positional (and vice versa)."""
    from arrow_ballista_spark.serving import _marker_style

    assert _marker_style("SELECT * FROM t WHERE k < ?") == "positional"
    assert _marker_style("SELECT * FROM t WHERE name = :nm") == "named"
    # literal '?' inside a string constant + named marker → named
    assert (
        _marker_style("SELECT * FROM t WHERE name LIKE '%?%' AND k = :k")
        == "named"
    )
    # literal ':tag' inside a string constant + positional marker
    assert (
        _marker_style("SELECT * FROM t WHERE name = ':nm' AND k = ?")
        == "positional"
    )
    # escaped quote ('it''s') doesn't end the literal early
    assert (
        _marker_style("SELECT * FROM t WHERE name = 'it''s ?' AND k = :k")
        == "named"
    )
    # `::` cast is not a named marker
    assert _marker_style("SELECT k::string FROM t WHERE k = ?") == "positional"
    assert _marker_style("SELECT 1") == "none"
    # backslash-escaped quote doesn't end the literal early
    assert (
        _marker_style("SELECT * FROM t WHERE a = 'don\\'t ?' AND k = :k")
        == "named"
    )
    # markers inside comments don't count
    assert (
        _marker_style("SELECT k -- is this ?\nFROM t WHERE k = :k") == "named"
    )
    assert (
        _marker_style("SELECT k /* ? or :x */ FROM t WHERE k = ?")
        == "positional"
    )
    assert _marker_style("SELECT 1 -- trailing ?") == "none"


def test_flight_nonloopback_requires_token(spark):
    """A non-loopback bind without auth_token must refuse to start —
    the endpoint executes arbitrary SQL (flight_sql.rs:485-520 seam)."""
    import pytest as _pytest

    from arrow_ballista_spark import serving

    with _pytest.raises(ValueError, match="auth_token"):
        serving.start_flight_server(spark, port=0, host="0.0.0.0")


def test_flight_bearer_auth_enforced(spark):
    """With auth middleware active: a client without the bearer token is
    refused; the same call with the token succeeds (the reference's
    Basic-auth handshake seam, flight_sql.rs:485-520)."""
    import pyarrow.flight as flight

    from arrow_ballista_spark import serving

    spark.createDataFrame([(1,)], "k long").createOrReplaceTempView(
        "flight_auth_t"
    )
    handle = serving.start_flight_server(
        spark, port=0, host="0.0.0.0", auth_token="s3cret"
    )
    try:
        desc = flight.FlightDescriptor.for_command(
            b"SELECT k FROM flight_auth_t"
        )
        url = f"grpc://127.0.0.1:{handle.port}"
        bare = flight.connect(url)
        with pytest.raises(flight.FlightUnauthenticatedError):
            bare.get_flight_info(desc)
        opts = flight.FlightCallOptions(
            headers=[(b"authorization", b"Bearer s3cret")]
        )
        authed = flight.connect(url)
        info = authed.get_flight_info(desc, options=opts)
        # wildcard bind advertises the machine hostname, not "0.0.0.0"
        loc = info.endpoints[0].locations[0].uri.decode()
        assert "0.0.0.0" not in loc and "localhost" not in loc
        got = authed.do_get(
            info.endpoints[0].ticket, options=opts
        ).read_all()
        assert got.column("k").to_pylist() == [1]
        with pytest.raises(flight.FlightUnauthenticatedError):
            bare.do_get(info.endpoints[0].ticket).read_all()
    finally:
        spark.catalog.dropTempView("flight_auth_t")
        handle.stop()
