#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<query>/ parquet dumps and <outDir>/oracle_sql.json. Registers each
testdata table as a DuckDB view named by its basename (matching the driver
contract's bare-name SQL), runs each oracle, and compares against the Spark
dump: same columns (sorted by name), same row count, same values in row
order. Comparison is EXACT, including floats — the driver hashes raw
values, so a last-ULP float difference fails there and must fail here;
near-miss floats are labeled "ULP diff" to speed diagnosis.
"""
import sys, os, json, glob, math
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(oracle):
    sql = oracle[name]
    dump_dir = f"{out}/{name}"
    if not os.path.isdir(dump_dir):
        fails.append((name, "no spark dump"))
        continue
    try:
        exp = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        fails.append((name, f"oracle error: {str(e)[:200]}"))
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet('{dump_dir}/*.parquet')"
    ).fetch_arrow_table()
    # driver semantics: sort columns by name, then compare values
    ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
    if ecols != gcols:
        fails.append((name, f"cols: oracle={ecols} spark={gcols}"))
        continue
    # be strict about physical types too (the driver may hash raw arrays)
    tmism = [
        f"{c}: oracle={exp.schema.field(c).type} spark={got.schema.field(c).type}"
        for c in ecols
        if exp.schema.field(c).type != got.schema.field(c).type
    ]
    if tmism:
        fails.append((name, "type mismatch: " + "; ".join(tmism)))
        continue
    if exp.num_rows != got.num_rows:
        fails.append((name, f"rows: oracle={exp.num_rows} spark={got.num_rows}"))
        continue
    bad = None
    for c in ecols:
        ev, gv = exp.column(c).to_pylist(), got.column(c).to_pylist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if a != b:
                    kind = ("ULP diff "
                            if math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)
                            else "")
                    bad = f"col {c} row {i}: {kind}oracle={a!r} spark={b!r}"
                    break
            elif a != b:
                bad = f"col {c} row {i}: oracle={a!r} spark={b!r}"
                break
        if bad:
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append(name)

# ---- partial oracle: bounds-checked sketch output ---------------------------
# q106 (Count-Min heavy hitters) has no hash oracle (the sketch hashes with
# Scala-side Murmur3), but its GUARANTEES are cross-engine checkable: the
# dump's exact_n column must equal DuckDB's exact token count, and every
# estimate must satisfy exact <= est <= exact + eps*N for eps = e/Width
# (ops/CountMin.scala: Width=2048 — update here if the sketch is resized).
bounds_checked = []
cms = f"{out}/q106_cms_heavy_hitters"
if os.path.isdir(cms):
    rows = con.execute(
        f"SELECT tok, exact_n, est_n FROM read_parquet('{cms}/*.parquet')"
    ).fetchall()
    n_tokens = con.execute(
        "SELECT count(*) FROM (SELECT unnest(str_split(text, ' ')) FROM documents)"
    ).fetchone()[0]
    bound = math.e / 2048 * n_tokens
    bad = []
    if not rows:
        bad.append("empty dump")
    for tok, exact_n, est_n in rows:
        dd = con.execute(
            "SELECT count(*) FROM (SELECT unnest(str_split(text, ' ')) AS t"
            " FROM documents) WHERE t = ?", [tok]).fetchone()[0]
        if dd != exact_n:
            bad.append(f"{tok!r}: spark exact {exact_n} != duckdb {dd}")
        elif not (exact_n <= est_n <= exact_n + bound):
            bad.append(
                f"{tok!r}: est {est_n} outside [{exact_n}, {exact_n}+{bound:.1f}]")
    if bad:
        fails.append(("q106_cms_heavy_hitters", "; ".join(bad[:5])))
    else:
        bounds_checked.append("q106_cms_heavy_hitters")

for name in sorted(set(os.path.basename(d) for d in glob.glob(f"{out}/q*"))):
    if name not in oracle and name not in bounds_checked:
        skips.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
if bounds_checked:
    print(f"BOUNDS-PASS {len(bounds_checked)}: {' '.join(bounds_checked)}")
if skips:
    print(f"NO-ORACLE {len(skips)}: {' '.join(skips)}")
if fails:
    print(f"FAIL {len(fails)}:")
    for n, r in fails:
        print(f"  {n}: {r}")
    sys.exit(1)
print("all green")
