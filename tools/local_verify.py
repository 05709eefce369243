#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
from oracle_sql.json in DuckDB over the testdata parquet tables and diff
against the Spark result parquet written by graft.Verify.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys
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
    print(f"\n{ok} ok, {bad} failed")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
