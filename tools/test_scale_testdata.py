#!/usr/bin/env python3
"""Property tests for tools/scale_testdata.py (VERDICT r04 #8).

The scaler is load-bearing for every sf1 claim in BASELINE.md; a silent bug
(missed FK column, coerced timestamp) would weaken the 10x gate without
failing anything. These tests pin the four properties the gate relies on:

  1. row counts: scaled tables = factor x source; fixed dims unscaled
  2. referential integrity: every FK set is contained in its PK set, and
     PK cardinality scales by exactly factor (shifted copies are disjoint)
  3. copy-0 byte identity: the first src-rows slice of each scaled table
     equals the source table exactly (literal-key point lookups still hit)
  4. physical schema equality, incl. events.ts timestamp[ns]

Run: python3 -m pytest tools/test_scale_testdata.py   (or python3 directly)

Scales sf0.001 by factor 3 into a temp dir — a few seconds.
"""
import glob
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = "/root/testdata/sf0.001"
DST = "/tmp/testdata-scaletest"
FACTOR = 3

# (child_table, fk_col) -> (parent_table, pk_col); mirrors the testdata's
# fact/dim graph. Deliberately restated here rather than imported from the
# scaler, so a key dropped from the scaler's SHIFT map FAILS these tests
# instead of silently narrowing them.
FOREIGN_KEYS = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]
PRIMARY_KEYS = {
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_orderkey", "events": "event_id", "documents": "doc_id",
    "embeddings": "vec_id",
}
FIXED_DIMS = {"region", "nation"}


_scaler_ran = False


def _run_scaler():
    # Regenerate exactly once per test process (ADVICE r05: a stale DST from
    # an older scaler version must never be what the properties validate).
    global _scaler_ran
    if _scaler_ran:
        return
    import shutil
    shutil.rmtree(DST, ignore_errors=True)
    subprocess.run(
        [sys.executable, os.path.join(HERE, "scale_testdata.py"),
         SRC, DST, str(FACTOR)],
        check=True, capture_output=True)
    _scaler_ran = True


def _tables():
    _run_scaler()
    names = [os.path.basename(p)[:-len(".parquet")]
             for p in sorted(glob.glob(f"{SRC}/*.parquet"))]
    assert names, f"no source tables in {SRC}"
    return names


def test_row_counts_scale_by_factor():
    for name in _tables():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        out = pq.read_table(f"{DST}/{name}.parquet")
        want = src.num_rows if name in FIXED_DIMS else src.num_rows * FACTOR
        assert out.num_rows == want, (
            f"{name}: {out.num_rows} rows, expected {want}")


def test_referential_integrity_holds_in_every_copy():
    for child, fk, parent, pk in FOREIGN_KEYS:
        fks = set(pq.read_table(f"{DST}/{child}.parquet", columns=[fk])
                  .column(fk).to_pylist())
        pks = set(pq.read_table(f"{DST}/{parent}.parquet", columns=[pk])
                  .column(pk).to_pylist())
        dangling = fks - pks
        assert not dangling, (
            f"{child}.{fk} -> {parent}.{pk}: {len(dangling)} dangling keys, "
            f"e.g. {sorted(dangling)[:5]}")


def test_primary_keys_stay_unique_and_scale():
    # shifted copies must be pairwise disjoint: distinct PKs = factor x src
    for name, pk in PRIMARY_KEYS.items():
        src_keys = pq.read_table(f"{SRC}/{name}.parquet", columns=[pk]).column(pk)
        out_keys = pq.read_table(f"{DST}/{name}.parquet", columns=[pk]).column(pk)
        src_distinct = len(set(src_keys.to_pylist()))
        out_distinct = len(set(out_keys.to_pylist()))
        assert out_distinct == src_distinct * FACTOR, (
            f"{name}.{pk}: {out_distinct} distinct keys, "
            f"expected {src_distinct * FACTOR} (copies overlap or were dropped)")
        assert len(out_keys) == out_distinct or len(src_keys) != src_distinct, (
            f"{name}.{pk}: scaling introduced duplicates")


def test_copy0_is_byte_identical():
    for name in _tables():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        out = pq.read_table(f"{DST}/{name}.parquet")
        assert out.slice(0, src.num_rows).equals(src), (
            f"{name}: copy 0 differs from the source table")


def test_physical_schemas_preserved():
    for name in _tables():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        out = pq.read_table(f"{DST}/{name}.parquet")
        assert out.schema == src.schema, (
            f"{name}: schema drifted\nsrc: {src.schema}\nout: {out.schema}")
    ts = pq.read_table(f"{DST}/events.parquet").schema.field("ts").type
    src_ts = pq.read_table(f"{SRC}/events.parquet").schema.field("ts").type
    # The driver has shipped both encodings (ns through r7, us from the
    # 2026-08-13 regeneration); Tables.events normalizes either. What must
    # hold is that sf1 exercises the SAME physical read path as the source.
    assert ts == src_ts and ts in (pa.timestamp("ns"), pa.timestamp("us")), (
        f"events.ts is {ts} (source {src_ts}) — sf1 must exercise the same "
        "timestamp read path as the driver testdata")


if __name__ == "__main__":
    import shutil
    shutil.rmtree(DST, ignore_errors=True)
    fns = [v for k, v in sorted(globals().items()) if k.startswith("test_")]
    for fn in fns:
        fn()
        print(f"PASS {fn.__name__}")
    print("all green")
