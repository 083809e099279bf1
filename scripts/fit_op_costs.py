#!/usr/bin/env python3
"""Fit + bound report for the non-scan ops (consumes op_fit_v5e.csv).

Model per row:  t = max(hbm_bytes / copy_bps, n * ops_per_value / vpu)
                    + grid_steps * t_step
with copy_bps taken from the same-run copy row (same-day chip state —
round-3 lesson: NEVER reuse another session's absolute GB/s) and the two
free parameters (vpu Tops, per-grid-step overhead) fitted by grid search
over all modeled rows.  The step-overhead term is what the round-3
histogram analysis was missing: at ~19.5k grid steps the k=512 chunked
histogram pays more in step overhead than in its entire HBM traffic.

Writes the fit + per-row measured/predicted table into
bench_results/cost_model_fit.json under "op_fit" (the scan fit of
fit_cost_model.py is untouched).

Usage: python scripts/fit_op_costs.py [op_fit_v5e.csv]
"""
from __future__ import annotations

import csv
import json
import os
import sys

import numpy as np


def main(argv):
    csv_path = argv[0] if argv else "bench_results/op_fit_v5e.csv"
    fit_path = "bench_results/cost_model_fit.json"

    rows = list(csv.DictReader(open(csv_path, newline="")))
    copy = next(r for r in rows if r["op"] == "copy")
    copy_bps = float(copy["hbm_bytes"]) / (float(copy["ms"]) / 1e3)

    modeled = [r for r in rows if r["ops_per_value"] not in ("", None)]

    def macs(r):
        return float(r.get("mxu_macs") or 0)

    def predict(r, vpu_tops, t_step_us, mxu_tmacs=100.0):
        n = float(r["n"])
        hbm_ms = float(r["hbm_bytes"]) / copy_bps * 1e3
        vpu_ms = n * float(r["ops_per_value"]) / (vpu_tops * 1e12) * 1e3
        mxu_ms = macs(r) / (mxu_tmacs * 1e12) * 1e3
        return (
            max(hbm_ms, vpu_ms + mxu_ms)
            + float(r["grid_steps"]) * t_step_us / 1e3
        )

    # stage 1: fit (vpu, step) on the VPU-only rows (keeps the scan/
    # histogram/aggregate fit independent of the MXU extension)
    vpu_rows = [r for r in modeled if macs(r) == 0]
    best = None
    for vpu in np.arange(2.5, 6.01, 0.05):
        for ts in np.arange(0.0, 2.01, 0.05):
            err = sum(
                (np.log(float(r["ms"]) / predict(r, vpu, ts))) ** 2
                for r in vpu_rows
            )
            if best is None or err < best[0]:
                best = (err, float(vpu), float(ts))
    if best is None:
        sys.exit("no VPU-only rows to fit (need at least one row with "
                 "ops_per_value set and mxu_macs == 0)")
    _, vpu, ts = best

    # stage 2: fit the MXU MAC rate on the dot-bearing rows (linear
    # export); vpu/ts held fixed
    mxu_rows = [r for r in modeled if macs(r) > 0]
    mxu = 100.0
    if mxu_rows:
        best_m = None
        for mr in np.arange(20.0, 250.1, 2.5):
            err = sum(
                (np.log(float(r["ms"]) / predict(r, vpu, ts, mr))) ** 2
                for r in mxu_rows
            )
            if best_m is None or err < best_m[0]:
                best_m = (err, float(mr))
        mxu = best_m[1]

    out_rows = []
    print(f"same-run copy: {copy_bps / 1e9:.1f} GB/s; fitted "
          f"vpu={vpu:.2f} Tops, step overhead={ts:.2f} us, "
          f"mxu={mxu:.0f} TMAC/s (s8)")
    for r in modeled:
        pred = predict(r, vpu, ts, mxu)
        ratio = float(r["ms"]) / pred
        hbm_ms = float(r["hbm_bytes"]) / copy_bps * 1e3
        vpu_ms = (
            float(r["n"]) * float(r["ops_per_value"]) / (vpu * 1e12) * 1e3
        )
        mxu_ms = macs(r) / (mxu * 1e12) * 1e3
        step_ms = float(r["grid_steps"]) * ts / 1e3
        bound = "HBM" if hbm_ms > vpu_ms + mxu_ms else "VPU"
        if mxu_ms > max(hbm_ms, vpu_ms):
            bound = "MXU"
        if step_ms > max(hbm_ms, vpu_ms + mxu_ms):
            bound = "grid-step-overhead"
        out_rows.append({
            "op": r["op"], "k": int(r["k"]), "ms": float(r["ms"]),
            "predicted_ms": round(pred, 3),
            "measured_over_predicted": round(ratio, 3),
            "bound": bound,
            "hbm_ms": round(hbm_ms, 3), "vpu_ms": round(vpu_ms, 3),
            "mxu_ms": round(mxu_ms, 3),
            "step_ms": round(step_ms, 3),
        })
        print(f"  {r['op']:24s} k={r['k']:>4} measured={float(r['ms']):8.3f} "
              f"pred={pred:8.3f}  x{ratio:5.2f}  [{bound}]")

    fit = json.load(open(fit_path)) if os.path.exists(fit_path) else {}
    fit["op_fit"] = {
        "copy_gbps_same_run": round(copy_bps / 1e9, 1),
        "vpu_tops_effective": round(vpu, 3),
        "grid_step_overhead_us": round(ts, 3),
        "mxu_tmacs_s8": round(mxu, 1),
        "source_csv": csv_path,
        "rows": out_rows,
    }
    with open(fit_path, "w") as f:
        json.dump(fit, f, indent=1)
    print(f"wrote op_fit section into {fit_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
