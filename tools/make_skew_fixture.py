"""Build a Zipf-keyed skew fixture — evidence for the skew-join claims
(VERDICT r5 item 8): the 10x/100x replication fixtures spread keys
UNIFORMLY, so ext_skew_salted_join and the AQE skew-split claims were
never exercised against real skew.

Writes to DST:
- ``events.parquet``: N fact rows whose ``user_id`` is Zipf-ish
  (inverse-power sampling, exponent ``A``) over ``U`` users — the
  hottest key takes a double-digit percent of all rows;
- ``users.parquet``: the user dimension, deliberately wide (a 2 KB pad
  column) so it exceeds the broadcast threshold and the join MUST
  shuffle — broadcast would hide the skew.

Deterministic via duckdb setseed.

Usage: python tools/make_skew_fixture.py [N] [U] [A] [DST]
       (defaults: 1000000 20000 1.3 /tmp/skewzipf)
"""

from __future__ import annotations

import os
import sys

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
U = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
A = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
DST = sys.argv[4] if len(sys.argv) > 4 else "/tmp/skewzipf"

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 8")
con.execute("SELECT setseed(0.42)")

# inverse-power sampling: rank r ~ u^(-1/(A-1)) capped at U gives a
# Zipf-like head; rank 1 is the hot key
con.execute(
    f"""
COPY (
  SELECT i AS event_id,
         CAST(least(pow(random(), -1.0 / ({A} - 1.0)),
                    CAST({U} AS DOUBLE)) AS BIGINT) - 1 AS user_id,
         random() * 100 AS value,
         'et' || CAST(i % 7 AS VARCHAR) AS event_type
  FROM range({N}) t(i)
) TO '{DST}/events.parquet' (FORMAT PARQUET)
"""
)
con.execute(
    f"""
COPY (
  SELECT i AS user_id,
         'user_' || CAST(i AS VARCHAR) AS name,
         CAST(i % 43 AS BIGINT) AS segment,
         repeat('x', 2048) AS pad
  FROM range({U}) t(i)
) TO '{DST}/users.parquet' (FORMAT PARQUET)
"""
)
top = con.execute(
    f"""
SELECT user_id, COUNT(*) AS c,
       COUNT(*) * 100.0 / {N} AS pct
FROM read_parquet('{DST}/events.parquet')
GROUP BY user_id ORDER BY c DESC LIMIT 5
"""
).fetchall()
print(f"events={N} users={U} alpha={A} -> {DST}")
for uid, c, pct in top:
    print(f"  hot user {uid}: {c} rows ({pct:.1f}%)")
