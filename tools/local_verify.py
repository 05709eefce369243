#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
from oracle_sql.json in DuckDB over the testdata parquet tables and diff
against the Spark result parquet written by graft.Verify.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir> [query ...]

Round-exit gate (run with no query filter): besides per-query value
diffs, this (a) reports any entries from <verifyOutDir>/errors.json
(queries that errored inside graft.Verify and so left no result dir),
and (b) checks ADDITIVITY — every query name present in the latest
committed CORRECTNESS_r*.json must still pass; any loss fails the gate
loudly. This is the check that would have caught the round-8 events
regression before handover.
"""
import glob, json, math, os, re, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v

def rows_canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    passed = set()
    # Queries that errored inside graft.Verify left no result dir; without
    # this they would be silently absent from the report (ADVICE r8).
    errs_path = f"{out_dir}/errors.json"
    verify_errors = json.load(open(errs_path)) if os.path.exists(errs_path) else {}
    for name, msg in sorted(verify_errors.items()):
        if only and name not in only:
            continue
        print(f"FAIL {name}: errored in graft.Verify: {msg[:200]}")
        bad += 1
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            o = con.sql(sql)
            ocols, orows, otypes = o.columns, o.fetchall(), [str(t) for t in o.types]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            bad += 1
            continue
        try:
            sq = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols, srows, stypes = sq.columns, sq.fetchall(), [str(t) for t in sq.types]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {str(e)[:200]}")
            bad += 1
            continue
        # Declared-type check: the driver's hash is typed, so an oracle
        # column promoted to e.g. HUGEINT (DuckDB widens windowed
        # sum(BIGINT)) hash-mismatches even when values are identical.
        otmap = dict(zip(ocols, otypes))
        stmap = dict(zip(scols, stypes))
        tdiff = [(c, stmap[c], otmap[c]) for c in sorted(set(ocols) & set(scols))
                 if stmap[c] != otmap[c]]
        for c, st, ot in tdiff:
            print(f"WARN {name}: column '{c}' type spark={st} vs oracle={ot}"
                  " (driver's typed hash will mismatch)")
        oc, orws = rows_canon(ocols, orows)
        sc, srws = rows_canon(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: schema {sc} vs oracle {oc}")
            bad += 1
            continue
        if len(orws) != len(srws):
            print(f"FAIL {name}: rows {len(srws)} vs oracle {len(orws)}")
            bad += 1
            continue
        mism = [(i, a, b) for i, (a, b) in enumerate(zip(srws, orws)) if a != b]
        if mism:
            i, a, b = mism[0]
            print(f"FAIL {name}: {len(mism)}/{len(srws)} rows differ; first @{i}:")
            print(f"  spark : {a}\n  oracle: {b}")
            bad += 1
        else:
            print(f"ok   {name} ({len(srws)} rows)")
            ok += 1
            passed.add(name)
    lost = []
    if not only:  # additivity only meaningful on a full run
        recs = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                             "CORRECTNESS_r*.json")),
                      key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
        # prior rounds' union: a query green in ANY earlier round must
        # still be green (guards against a record that itself lost keys,
        # as CORRECTNESS_r08 did)
        prior = set()
        for p in recs:
            prior |= set(json.load(open(p)).keys())
        lost = sorted(prior - passed)
        for name in lost:
            print(f"LOST {name}: green in a prior round's CORRECTNESS "
                  "record but not passing now")
    print(f"\n{ok} ok, {bad} failed" +
          (f", {len(lost)} LOST vs prior rounds" if lost else ""))
    sys.exit(1 if bad or lost else 0)

if __name__ == "__main__":
    main()
