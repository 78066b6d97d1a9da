#!/usr/bin/env python3
"""Regression tests for tools/verify_local.py's driver-fidelity probe.

The driver's t2 comparator sorts both tables with pandas `sort_values`,
which raises `TypeError: unhashable type` on MAP/LIST/STRUCT cells — the
r14 q215/q218 driver-red that verify_local's Arrow comparison silently
passed. These tests pin that the local gate now rejects any nested-typed
output column (so a driver-incompatible declared shape fails HERE first)
and that the end-to-end main() flags a map-typed dump as FAIL.

Run: python3 tools/test_verify_local.py
"""
import json
import os
import sys
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import verify_local  # noqa: E402


def test_unsortable_cols_flags_nested_types():
    t = pa.table({
        "g": pa.array([1, 2], pa.int64()),
        "m": pa.array([{"a": 1}, {"b": 2}],
                      pa.map_(pa.string(), pa.int64())),
        "xs": pa.array([[1], [2, 3]], pa.list_(pa.int64())),
        "st": pa.array([{"x": 1}, {"x": 2}],
                       pa.struct([("x", pa.int64())])),
        "s": pa.array(["a", "b"], pa.string()),
    })
    assert verify_local.unsortable_cols(t) == ["m", "xs", "st"], \
        verify_local.unsortable_cols(t)


def test_unsortable_cols_passes_primitives():
    t = pa.table({
        "i": pa.array([1], pa.int64()),
        "d": pa.array([1.5], pa.float64()),
        "s": pa.array(["x"], pa.string()),
        "b": pa.array([True], pa.bool_()),
    })
    assert verify_local.unsortable_cols(t) == []


def test_main_rejects_map_dump_end_to_end():
    """A map-typed Spark dump paired with a map-producing oracle must FAIL
    (exit 1) with the driver-incompatible message — not pass via Arrow."""
    with tempfile.TemporaryDirectory() as tmp:
        sf = os.path.join(tmp, "sf")
        out = os.path.join(tmp, "out")
        os.makedirs(sf)
        os.makedirs(os.path.join(out, "q999_map_fixture"))
        # one source table so the view loop has something to register
        pq.write_table(pa.table({"k": pa.array([1], pa.int64())}),
                       os.path.join(sf, "tiny.parquet"))
        pq.write_table(
            pa.table({
                "g": pa.array([1], pa.int64()),
                "m": pa.array([{"a": 1}], pa.map_(pa.string(), pa.int64())),
            }),
            os.path.join(out, "q999_map_fixture", "part-0.parquet"))
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump({"q999_map_fixture":
                       "SELECT CAST(1 AS BIGINT) AS g, MAP(['a'], [1]) AS m"},
                      f)
        rc = verify_local.main(sf, out)
        assert rc == 1, "map-typed dump must fail the local gate"


def test_gate_error_is_recorded_not_raised():
    """An empty/unreadable bounds-gate dump dir must record a named FAIL
    (ADVICE r14: gates crashed with a traceback before)."""
    with tempfile.TemporaryDirectory() as tmp:
        sf = os.path.join(tmp, "sf")
        out = os.path.join(tmp, "out")
        os.makedirs(sf)
        # empty dump dir for a gated query: read_parquet('.../*.parquet')
        # raises inside the gate; main() must catch and return 1
        os.makedirs(os.path.join(out, "q214_topk_spacesaving"))
        pq.write_table(pa.table({"k": pa.array([1], pa.int64())}),
                       os.path.join(sf, "tiny.parquet"))
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump({}, f)
        rc = verify_local.main(sf, out)
        assert rc == 1, "gate error must surface as a FAIL exit"


if __name__ == "__main__":
    for fn in [test_unsortable_cols_flags_nested_types,
               test_unsortable_cols_passes_primitives,
               test_main_rejects_map_dump_end_to_end,
               test_gate_error_is_recorded_not_raised]:
        fn()
        print(f"ok {fn.__name__}")
    print("all green")
