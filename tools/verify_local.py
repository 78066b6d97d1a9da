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

Driver-fidelity note (r15): the driver sorts both tables with pandas
`sort_values`, which factorizes cell values into a hash table — a MAP/
LIST/STRUCT column raises `TypeError: unhashable type` THERE even though
Arrow comparison here would handle it fine (the r14 q215/q218 driver-red).
So this gate REJECTS any nested-typed output column on either side:
declared queries must render collections as VARCHAR (the q34 `arr_str`
convention). tools/test_verify_local.py pins the probe.
"""
import sys, os, json, glob, math
import duckdb
import pyarrow as pa


def unsortable_cols(table):
    """Columns the driver's pandas sort_values cannot sort (nested Arrow
    types factorize to unhashable python lists/dicts)."""
    return [f.name for f in table.schema if pa.types.is_nested(f.type)]


# ---- partial-oracle bounds gates --------------------------------------------
# Each gate covers a declared no-oracle query (sketch / media-decode output
# DuckDB cannot replay relationally) with a quantitative check. Gates run
# through run_gates(), which try/excepts each one so a malformed or empty
# dump records a named failure instead of crashing the whole script
# (ADVICE r14). Every gate takes (con, dump_dir) and returns a list of
# failure strings (empty = pass).

# q106 (Count-Min heavy hitters) graduated to a FULL hash oracle in r13: the
# sketch buckets now use the md5-tokenHash affine family (ops/CountMin.AB),
# which the oracle SQL replays relationally — so q106 is checked by the main
# loop like any other query and its former bounds gate is retired.


def gate_q08b(con, dump_dir):
    # approx_count_distinct (rsd=0.02): HLL++ has no hard bound, but its
    # error is ~Gaussian with sigma = rsd; 4 sigma is a quantitative gate a
    # correct implementation cannot miss in practice (and the estimate is
    # deterministic per dataset — a pass here is reproducible, not lucky).
    apx = con.execute(
        f"SELECT apx_part FROM read_parquet('{dump_dir}/*.parquet')"
    ).fetchone()[0]
    exact = con.execute(
        "SELECT count(DISTINCT l_partkey) FROM lineitem").fetchone()[0]
    if apx is not None and abs(apx - exact) <= 4 * 0.02 * exact:
        return []
    return [f"estimate {apx} vs exact {exact}: outside 4*rsd"]


def gate_q63b(con, dump_dir):
    # approx_percentile (accuracy=1000): the documented guarantee is a
    # RANK error of eps = 1/accuracy — the returned value must be an actual
    # group element whose rank window intersects [(p-eps)n, (p+eps)n].
    # Checked via lt/le counts (robust to ties), with ±1 rank slack for
    # floor/ceil edge effects at the window borders.
    eps, bad = 1.0 / 1000, []
    for flag, p50, p99 in con.execute(
            "SELECT l_returnflag, p50_apx, p99_apx FROM "
            f"read_parquet('{dump_dir}/*.parquet')").fetchall():
        for p, v in ((0.5, p50), (0.99, p99)):
            n, lt, le, eq = con.execute(
                "SELECT count(*),"
                " count(*) FILTER (l_extendedprice < ?),"
                " count(*) FILTER (l_extendedprice <= ?),"
                " count(*) FILTER (l_extendedprice = ?)"
                " FROM lineitem WHERE l_returnflag = ?",
                [v, v, v, flag]).fetchone()
            if eq == 0:
                bad.append(f"{flag} p{p}: {v!r} not a group element")
            elif le < math.floor((p - eps) * n) - 1 or \
                    lt > math.ceil((p + eps) * n) + 1:
                bad.append(f"{flag} p{p}: {v!r} rank [{lt+1},{le}] outside "
                           f"[{(p-eps)*n:.0f},{(p+eps)*n:.0f}] of n={n}")
    return bad


def gate_q108(con, dump_dir):
    # HLL sketch rollup: the exact audit column IS oracle-able — per-day
    # exact distinct plus the day = -1 merged-total row must equal DuckDB;
    # the sketch estimate is banded at <= 2% of exact (HllRollupSpec's
    # gate; at these cardinalities the DataSketches HLL is in or near its
    # exact-coupon regime, so 2% is comfortable and deterministic).
    got = con.execute(
        "SELECT day, uniq_est, uniq_exact FROM "
        f"read_parquet('{dump_dir}/*.parquet') ORDER BY day").fetchall()
    exp = dict(con.execute(
        "SELECT epoch_ns(ts) // 86400000000000 AS day,"
        " count(DISTINCT user_id) FROM events GROUP BY 1").fetchall())
    exp[-1] = con.execute(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    bad = []
    if sorted(d for d, _, _ in got) != sorted(exp):
        bad.append(f"day set: spark={sorted(d for d, _, _ in got)[:5]}... "
                   f"duckdb={sorted(exp)[:5]}...")
    for day, est, exact in got:
        if day in exp and exact != exp[day]:
            bad.append(f"day {day}: spark exact {exact} != duckdb {exp[day]}")
        elif abs(est - exact) > 0.02 * exact:
            bad.append(f"day {day}: est {est} outside 2% of exact {exact}")
    return bad


def gate_q110(con, dump_dir):
    # IVF-PQ ANN: two quantitative legs. (a) The exact re-rank is
    # deterministic given the shortlist: every dumped cos_sim must equal
    # DuckDB's cosine for that (q_id, vec_id) pair to within 2e-6
    # (6-decimal rounding half-width + float32-vs-double accumulation),
    # descending per query. (b) Recall of the dumped top-3 vs DuckDB's
    # exact brute-force top-3 (self excluded, as the ADC shortlist
    # excludes it) must be >= 2/3 overall — the fixture-level 0.93 gate
    # lives in PqSpec; on the near-random testdata embeddings 8/9 is the
    # measured value and 6/9 the floor a working ADC cannot fall under.
    got = con.execute(
        "SELECT q_id, rn, vec_id, cos_sim FROM "
        f"read_parquet('{dump_dir}/*.parquet') ORDER BY q_id, rn").fetchall()
    bad, hits, total = [], 0, 0
    exact_top = {}
    for q_id, vec_id, _ in con.execute(
            "WITH q AS (SELECT vec_id AS q_id, embedding AS qe"
            "           FROM embeddings WHERE vec_id < 3) "
            "SELECT q_id, vec_id,"
            " list_cosine_similarity(qe, embedding) AS cos "
            "FROM q, embeddings WHERE vec_id != q_id "
            "QUALIFY row_number() OVER (PARTITION BY q_id"
            " ORDER BY cos DESC, vec_id) <= 3").fetchall():
        exact_top.setdefault(q_id, set()).add(vec_id)
    prev = {}
    for q_id, rn, vec_id, cos in got:
        dd = con.execute(
            "SELECT list_cosine_similarity("
            " (SELECT embedding FROM embeddings WHERE vec_id = ?),"
            " (SELECT embedding FROM embeddings WHERE vec_id = ?))",
            [q_id, vec_id]).fetchone()[0]
        if abs(cos - dd) > 2e-6:
            bad.append(f"q{q_id} rn{rn}: cos {cos} != duckdb {dd:.7f}")
        if q_id in prev and cos > prev[q_id] + 1e-12:
            bad.append(f"q{q_id} rn{rn}: cos not descending")
        prev[q_id] = cos
        total += 1
        hits += 1 if vec_id in exact_top.get(q_id, set()) else 0
    if total == 0:
        bad.append("empty dump")
    elif hits / total < 2 / 3:
        bad.append(f"recall {hits}/{total} below 2/3 vs brute force")
    return bad


def _twin_gate(con, dump_dir, base_max, col3, lo, hi, what):
    # Shared shape of the media near-dup gates (q131/q132/q133): DuckDB
    # cannot decode PNG/WAV/GIF, but the corpus CONSTRUCTION is the
    # oracle — each base item (doc_id < base_max) has exactly one planted
    # re-encoded twin at id+100000; twins measure inside [lo, hi] on the
    # operator's metric and unrelated items sit far outside, so the
    # output must be exactly {(id, id+100000)}.
    got = con.execute(
        f"SELECT a_id, b_id, {col3} FROM "
        f"read_parquet('{dump_dir}/*.parquet') ORDER BY a_id").fetchall()
    base = [r[0] for r in con.execute(
        f"SELECT doc_id FROM documents WHERE doc_id < {base_max}"
        " ORDER BY doc_id").fetchall()]
    bad = []
    expect = [(i, i + 100000) for i in base]
    if [(a, b) for a, b, _ in got] != expect:
        bad.append(f"pairs != planted twins: got {len(got)} rows, "
                   f"expected {len(expect)}; first diff "
                   f"{next((g for g, e in zip(got, expect) if (g[0], g[1]) != e), got[:1] or expect[:1])}")
    for a, b, m in got:
        if not (lo <= m <= hi):
            bad.append(f"({a},{b}): {what} {m} outside [{lo},{hi}]")
    return bad


def gate_q131(con, dump_dir):
    # pHash near-dup: twins <= 2 bits apart, unrelated >= 16
    # (Multimodal.syntheticImageCorpus scaladoc); threshold 3.
    return _twin_gate(con, dump_dir, 200, "dist", 0, 3, "dist")


def gate_q132(con, dump_dir):
    # audio near-dup: twins drift 0 bits (the margined cross-voice bit
    # design), unrelated >= 13 bits apart; threshold 3.
    return _twin_gate(con, dump_dir, 150, "dist", 0, 3, "dist")


def gate_q133(con, dump_dir):
    # video scene dedup: twin frames <= 2 bits except one frame in 360 at
    # 4 (GIF palette quantization noise — the reason the operator
    # thresholds on >= 2 of 3 shared scenes).
    return _twin_gate(con, dump_dir, 120, "frames_matched", 2, 3,
                      "frames_matched")


M64 = (1 << 64) - 1


def _mix64(z):
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def _grid_truth(i):
    vals = [_mix64((i * 64 + c) & M64) & 0xFF for c in range(64)]
    best = max(range(64), key=lambda c: (vals[c], -c))  # first max wins
    return best, (sum(vals) // 64) // 32


def gate_q189(con, dump_dir):
    # cross-modal caption↔image consistency: DuckDB cannot decode PNG,
    # but the corpus construction IS the oracle and is replayable here
    # exactly: captions derive from splitmix64 grid attributes of
    # src = id+1 when id % 7 == 3 (the planted swap) else id; the image
    # leg recovers the same attributes from lossless-PNG pixels. So every
    # output cell — both attribute pairs AND the consistent flag,
    # coincidental swap-matches included — is recomputable in python and
    # checked row-exactly.
    got = con.execute(
        "SELECT doc_id, cap_bright, img_bright, cap_bucket, img_bucket,"
        " consistent FROM "
        f"read_parquet('{dump_dir}/*.parquet') ORDER BY doc_id").fetchall()
    base = [r[0] for r in con.execute(
        "SELECT doc_id FROM documents WHERE doc_id < 300"
        " ORDER BY doc_id").fetchall()]
    bad = []
    if [r[0] for r in got] != base:
        bad.append(f"doc_id set: got {len(got)} rows vs {len(base)} expected")
    flagged = 0
    for doc_id, cb, ib, cq, iq, cons in got:
        src = doc_id + 1 if doc_id % 7 == 3 else doc_id
        eb, eq = _grid_truth(src)          # caption leg truth
        tb, tq = _grid_truth(doc_id)       # image leg truth
        exp_cons = 1 if (eb, eq) == (tb, tq) else 0
        if (cb, cq) != (eb, eq):
            bad.append(f"doc {doc_id}: caption attrs ({cb},{cq}) != ({eb},{eq})")
        elif (ib, iq) != (tb, tq):
            bad.append(f"doc {doc_id}: image attrs ({ib},{iq}) != ({tb},{tq})")
        elif cons != exp_cons:
            bad.append(f"doc {doc_id}: consistent={cons}, expected {exp_cons}")
        flagged += 1 - cons
    if not got:
        # an empty dump must never count as BOUNDS-PASS (ADVICE r11):
        # both row-set and flag checks would pass vacuously on [] == []
        bad.append("q189 dump is EMPTY - gate would pass vacuously")
    elif flagged == 0:
        bad.append("no planted mismatch flagged")
    return bad


def gate_q214(con, dump_dir):
    # SpaceSaving topK: summary contents are stream-order-dependent, but
    # the Metwally bounds are not: for every reported token, exact <= est
    # and est - err <= exact; and every GUARANTEED token must be in every
    # true top-10 set (strictly fewer than 10 tokens may out-count it).
    # The planted generator vocabulary is Zipfian enough that at least
    # one guarantee must fire — an all-false flag column would pass the
    # bounds vacuously.
    bad, n_guaranteed = [], 0
    rows = con.execute(
        "SELECT rank, token, est, err, guaranteed FROM "
        f"read_parquet('{dump_dir}/*.parquet') ORDER BY rank").fetchall()
    if not rows:
        bad.append("q214 dump is EMPTY - gate would pass vacuously")
    # one exact-count pass over the corpus serves all per-token probes
    con.execute(
        "CREATE OR REPLACE TEMP TABLE q214_counts AS "
        "SELECT t, CAST(count(*) AS BIGINT) AS c FROM "
        "(SELECT unnest(str_split(text, ' ')) AS t FROM documents) "
        "GROUP BY t")
    for rank, token, est, err, guaranteed in rows:
        got = con.execute(
            "SELECT c FROM q214_counts WHERE t = ?", [token]).fetchone()
        exact = got[0] if got else 0
        if not (exact <= est and est - err <= exact):
            bad.append(f"rank {rank} {token!r}: exact {exact} outside "
                       f"[{est - err}, {est}]")
        if guaranteed:
            n_guaranteed += 1
            beat = con.execute(
                "SELECT count(*) FROM q214_counts WHERE c > ?",
                [exact]).fetchone()[0]
            if beat >= 10:
                bad.append(f"rank {rank} {token!r} guaranteed but {beat} "
                           "tokens out-count it")
    if rows and n_guaranteed == 0:
        bad.append("no guaranteed member claimed - flag column is inert")
    return bad


def gate_q217(con, dump_dir):
    # weighted SpaceSaving topK: q214's gate with "count" read as "total
    # weight" (exact per-user cents mass replayed in DuckDB), PLUS the
    # dumped certification threshold checked two ways: the flag must
    # equal est - err > thresh row-for-row (so an all-false column is
    # verified honest, not inert — near-uniform masses legitimately
    # certify nothing), and the threshold must be SOUND: every user
    # outside the reported top-10 has exact mass <= thresh (the I2 +
    # (k+1)-th-estimate bound).
    bad = []
    rows = con.execute(
        "SELECT rank, user_id, est_cents, err, thresh, guaranteed FROM "
        f"read_parquet('{dump_dir}/*.parquet') ORDER BY rank").fetchall()
    if not rows:
        bad.append("q217 dump is EMPTY - gate would pass vacuously")
    con.execute(
        "CREATE OR REPLACE TEMP TABLE q217_mass AS "
        "SELECT CAST(user_id AS VARCHAR) AS u, CAST(sum(CAST(floor("
        "value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS w "
        "FROM events GROUP BY 1")
    for rank, uid, est, err, thresh, guaranteed in rows:
        got = con.execute(
            "SELECT w FROM q217_mass WHERE u = ?", [uid]).fetchone()
        exact = got[0] if got else 0
        if not (exact <= est and est - err <= exact):
            bad.append(f"rank {rank} user {uid}: exact {exact} outside "
                       f"[{est - err}, {est}]")
        if guaranteed != (est - err > thresh):
            bad.append(f"rank {rank} user {uid}: flag {guaranteed} != "
                       f"(est-err {est - err} > thresh {thresh})")
        if guaranteed:
            beat = con.execute(
                "SELECT count(*) FROM q217_mass WHERE w > ?",
                [exact]).fetchone()[0]
            if beat >= 10:
                bad.append(f"rank {rank} user {uid} guaranteed but {beat} "
                           "users out-weigh it")
    if rows:
        reported = [r[1] for r in rows]
        thresh0 = rows[0][4]
        worst = con.execute(
            "SELECT max(w) FROM q217_mass WHERE u NOT IN ("
            + ",".join("?" * len(reported)) + ")", reported).fetchone()[0]
        if worst is not None and worst > thresh0:
            bad.append(f"unsound threshold: unreported user mass {worst} "
                       f"> thresh {thresh0}")
    return bad


GATES = [
    ("q08b_approx_distinct", gate_q08b),
    ("q63b_approx_percentiles", gate_q63b),
    ("q108_hll_rollup", gate_q108),
    ("q110_ann_pq", gate_q110),
    ("q131_phash_neardup", gate_q131),
    ("q132_audio_neardup", gate_q132),
    ("q133_video_scene_dedup", gate_q133),
    ("q189_caption_consistency", gate_q189),
    ("q214_topk_spacesaving", gate_q214),
    ("q217_topk_weighted", gate_q217),
]


def main(sf, out):
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
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{dump_dir}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            fails.append((name, f"dump read error: {str(e)[:200]}"))
            continue
        # driver fidelity: pandas sort_values cannot sort nested types
        nested = sorted(set(unsortable_cols(exp) + unsortable_cols(got)))
        if nested:
            fails.append((name, "driver-incompatible (pandas-unsortable) "
                          f"nested column types: {nested}"))
            continue
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

    bounds_checked = []
    for name, fn in GATES:
        dump_dir = f"{out}/{name}"
        if not os.path.isdir(dump_dir):
            continue
        try:
            bad = fn(con, dump_dir)
        except Exception as e:
            bad = [f"gate error: {type(e).__name__}: {str(e)[:300]}"]
        if bad:
            fails.append((name, "; ".join(bad[:5])))
        else:
            bounds_checked.append(name)

    for name in sorted(set(os.path.basename(d) for d in glob.glob(f"{out}/q*"))):
        if name not in oracle and name not in bounds_checked and \
                name not in [n for n, _ in fails]:
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
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf_dir, out_dir))
