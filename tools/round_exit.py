#!/usr/bin/env python3
"""Round-exit gate: the checks that must hold at handover, in one
command, so none can be forgotten (rounds 8-11 each left artifacts
uncommitted or a bench record short of the final catalog).

  1. full correctness: graft.Verify at sf0.01 + local_verify.py
     (oracle diff + errors.json + additivity vs every committed
     CORRECTNESS_r*.json key set),
  2. bench coverage: target/bench_record.json must contain a timing
     for EVERY query key the verify pass emitted (i.e. the bench was
     re-recorded at the final catalog, not before the last entry
     landed),
  3. artifact commit: any dirty/untracked CORRECTNESS_r*.json,
     BENCH_r*.json, LEAKCHECK.json, COPYCHECK.json, bench/record_*.json
     are committed.

Usage: python3 tools/round_exit.py [--skip-verify]
  --skip-verify reuses an existing /tmp/vout (for a re-run after a
  fix; the default runs the ~6 min full gate).
"""
import json
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
VOUT = "/tmp/vout"


def run(cmd, **kw):
    print(f"[round-exit] $ {' '.join(cmd)}")
    return subprocess.run(cmd, cwd=ROOT, **kw)


def main():
    skip_verify = "--skip-verify" in sys.argv

    # 1. full correctness gate
    if not skip_verify:
        subprocess.run(["rm", "-rf", VOUT])
        env = dict(os.environ, SPARK_GRAFT_CPUS="16")
        r = run(["sbt", "-batch", f"runMain graft.Verify /root/testdata/sf0.01 {VOUT}"],
                env=env)
        if r.returncode != 0:
            sys.exit("[round-exit] FAIL: graft.Verify crashed")
    r = run([sys.executable, "tools/local_verify.py", "/root/testdata/sf0.01", VOUT])
    if r.returncode != 0:
        sys.exit("[round-exit] FAIL: correctness gate red (fix before handover)")

    # 2. bench record must cover every catalog key at HEAD
    oracle = json.load(open(os.path.join(VOUT, "oracle_sql.json")))
    catalog_keys = set(oracle.keys())
    rec_path = os.path.join(ROOT, "target", "bench_record.json")
    if not os.path.exists(rec_path):
        sys.exit("[round-exit] FAIL: no target/bench_record.json — run graft.Bench "
                 "AFTER the last catalog commit")
    # the record is NDJSON: one spread line + one total line
    benched = set()
    for line in open(rec_path):
        d = json.loads(line)
        if d.get("metric") == "total":
            benched = set(d.get("queries", {}).keys())
    missing = sorted(catalog_keys - benched)
    if missing:
        sys.exit(f"[round-exit] FAIL: bench record misses {len(missing)} catalog "
                 f"keys (stale record — re-run graft.Bench): {', '.join(missing[:10])}")
    print(f"[round-exit] bench record covers all {len(catalog_keys)} catalog keys")

    # 3. commit dirty round artifacts
    pats = ["CORRECTNESS_r*.json", "BENCH_r*.json", "LEAKCHECK.json",
            "COPYCHECK.json", "bench/record_*.json"]
    st = subprocess.run(["git", "status", "--porcelain", "--"] + pats,
                        cwd=ROOT, capture_output=True, text=True).stdout.strip()
    if st:
        run(["git", "add", "--"] + pats)
        run(["git", "commit", "-m", "Commit round artifacts at handover"])
        print("[round-exit] artifacts committed")
    else:
        print("[round-exit] artifacts already clean")
    print("[round-exit] PASS")


if __name__ == "__main__":
    main()
