#!/usr/bin/env python3
"""Capture .explain("formatted") output per query into plans/<round>/.

Usage: python3 tools/dump_plans.py <round-dir> <before|after> name1 name2 ...

Runs graft.tools.ExplainAudit through sbt and splits its stdout on the
EXACT banner line `========== <name> ==========` (full-line anchored
match — the r18 splitter matched the marker anywhere in a line and a
plan line containing `== ... ==` leaked a garbage `en)_before.txt`).
"""
import re
import subprocess
import sys
from pathlib import Path

def main():
    round_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = Path("plans") / round_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    cmd = ["sbt", "-batch", "runMain graft.tools.ExplainAudit " + " ".join(names)]
    proc = subprocess.run(cmd, capture_output=True, text=True, check=False)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        sys.exit(proc.returncode)
    banner = re.compile(r"^(?:\[info\] )?========== (\S+) ==========\s*$")
    current, buf = None, []
    def flush():
        if current and current in names:
            (out_dir / f"{current}_{suffix}.txt").write_text("\n".join(buf) + "\n")
    for line in proc.stdout.splitlines():
        m = banner.match(line)
        if m:
            flush()
            current, buf = m.group(1), []
        elif current is not None:
            buf.append(line)
    flush()
    done = {n for n in names if (out_dir / f"{n}_{suffix}.txt").exists()}
    missing = [n for n in names if n not in done]
    if missing:
        sys.stderr.write(f"MISSING plans for: {missing}\n")
        sys.exit(1)
    print(f"wrote {len(done)} plans to {out_dir}")

if __name__ == "__main__":
    main()
