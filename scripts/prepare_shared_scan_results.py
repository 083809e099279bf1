#!/usr/bin/env python3
"""Shared-scan k-sweep orchestration -> CSV.

Port of the reference's scripts/prepare_shared_scan_results.py:14-31: runs
the bench CLI for k = 1..max_k at a fixed data size, parses the stable
``* name: avg ms; [..] ms`` stdout lines, and writes one CSV row per
(k, variant).

Usage:
    python scripts/prepare_shared_scan_results.py [out.csv]
        [--data-size=40m] [--max-k=512] [--reps=2] [--width=9]
"""
from __future__ import annotations

import csv
import re
import subprocess
import sys

LINE_RE = re.compile(r"^\* (?P<name>.+?): (?P<avg>[\d.]+) ms; \[(?P<reps>[^\]]*)\] ms")
GBS_RE = re.compile(r"^\s+(?P<gbs>[\d.]+) GB/s")


def run_one(data_size: str, reps: int, k: int, width: int) -> list[dict]:
    cmd = [
        sys.executable, "-m", "shared_simd_scan_tpu.bench",
        data_size, str(reps), "sharedscan", str(k), f"--width={width}",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True).stdout
    rows, last = [], None
    for line in out.splitlines():
        m = LINE_RE.match(line)
        if m:
            last = {"k": k, "name": m["name"], "avg_ms": float(m["avg"])}
            rows.append(last)
            continue
        g = GBS_RE.match(line)
        if g and last is not None:
            last["gb_per_s"] = float(g["gbs"])
    return rows


def main(argv: list[str]) -> int:
    out_path = "shared_scan_results.csv"
    data_size, max_k, reps, width = "40m", 512, 2, 9
    for a in argv:
        if a.startswith("--data-size="):
            data_size = a.split("=", 1)[1]
        elif a.startswith("--max-k="):
            max_k = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--width="):
            width = int(a.split("=", 1)[1])
        else:
            out_path = a

    ks = []
    k = 1
    while k <= max_k:
        ks.append(k)
        k *= 2

    rows = []
    for k in ks:
        print(f"# k={k}", file=sys.stderr)
        rows.extend(run_one(data_size, reps, k, width))

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["k", "name", "avg_ms", "gb_per_s"])
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f"wrote {len(rows)} rows to {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
