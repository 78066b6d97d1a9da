#!/usr/bin/env python3
"""Generate the timestamp[ns] events fixture for TablesSpec (test tooling).

Spark cannot WRITE parquet timestamp[ns] (it writes INT96/us), so the one
physical form TablesSpec cannot produce at runtime is checked in:
src/test/resources/events_ts_ns.parquet — 10 rows, driver-events schema,
ts values chosen near bucket boundaries (second/hour/day multiples ±1µs —
µs-exact on purpose, so the timestamp[us] spec variants represent the same
instants losslessly) where a lossy double conversion or wrong-unit
multiply would misbucket.
The us/NTZ and int64 variants are written by the spec itself via Spark;
all three must yield identical epoch-ns longs from Tables.events.

Run once: python3 tools/make_ts_fixtures.py  (regenerates the resource)
"""
import pyarrow as pa
import pyarrow.parquet as pq

DAY = 86_400_000_000_000
HOUR = 3_600_000_000_000
SEC = 1_000_000_000
# epoch-nanos; all multiples of 1000 so timestamp[us] represents them exactly
NS = [
    1_704_067_200_000_000_000,          # 2024-01-01T00:00:00 exactly
    1_704_067_200_000_000_000 + 1000,   # +1us: next-second boundary check
    1_704_067_200_000_000_000 - 1000,   # -1us: floor-div must round DOWN
    1_704_067_200_000_000_000 + 19 * DAY + 7 * HOUR + 123_456_000,
    1_704_067_200_000_000_000 + 19 * DAY - 1000,
    1_704_067_200_000_000_000 + 29 * DAY + 23 * HOUR + 59 * SEC,
    1_706_313_600_000_000_000 + 999_999_000,   # .999999 fractional second
    1_706_313_600_000_000_000 + 500_000_000,   # .5 exactly
    1_704_067_200_000_000_000 + 2**53 // 1000 * 1000,  # > double mantissa offset
    1_704_067_200_000_000_000 + 12 * HOUR + 1_000,
]
N = len(NS)
table = pa.table({
    "event_id": pa.array(range(1, N + 1), pa.int64()),
    "ts": pa.array(NS, pa.timestamp("ns")),
    "user_id": pa.array([i % 3 + 1 for i in range(N)], pa.int64()),
    "event_type": pa.array(["click", "view", "purchase", "signup", "click",
                            "view", "click", "purchase", "view", "click"]),
    "value": pa.array([float(i) * 1.5 for i in range(N)], pa.float64()),
    "props": pa.array(['{"k":%d}' % i for i in range(N)]),
})
out = "src/test/resources/events_ts_ns.parquet"
pq.write_table(table, out, coerce_timestamps=None)
print("wrote", out, pq.read_schema(out).field("ts").type)
