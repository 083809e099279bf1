"""Recompute ops_per_value for op_fit_v5e.csv under the round-5
REDUCE-AWARE counter (utils.costmodel now counts in-kernel cross-sublane
reductions as one elementwise-equivalent each — the k=512 span histogram
issues 512 of them per grid step, ~27% of its body, and sat at a
mysterious 1.23x its fitted bound while they were excluded).

Measured columns are untouched; only the counted-cost column changes.
Tiny traces + the shift canary run on the active backend (seconds).
Rerun scripts/fit_op_costs.py afterwards.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/refresh_op_fit_counts.py \
      [bench_results/op_fit_v5e.csv]
"""
import csv
import importlib.util
import sys

import numpy as np


def main(argv):
    path = argv[0] if argv else "bench_results/op_fit_v5e.csv"
    spec = importlib.util.spec_from_file_location(
        "run_op_fit", "scripts/run_op_fit.py"
    )
    rof = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rof)  # __main__-guarded: does not run main

    import jax.numpy as jnp  # noqa: E402

    from shared_simd_scan_tpu import layout
    from shared_simd_scan_tpu.ops import scan as scan_ops
    from shared_simd_scan_tpu.utils.costmodel import count_vector_ops

    rows = list(csv.DictReader(open(path, newline="")))

    def b1_of(n):
        return layout.padded_blocks(int(n)) // layout.LANES

    changed = 0
    for r in rows:
        op, k = r["op"], int(r["k"])
        if r["ops_per_value"] in ("", None):
            continue
        b1 = b1_of(r["n"])
        old = float(r["ops_per_value"])
        if op == "shared-scan-compare":
            t = rof._tiny(rof.WIDTH)
            nt = t.shape[1] * 128 * 32
            keys = jnp.arange(k, dtype=jnp.uint32)
            ops = count_vector_ops(
                lambda x, kk: scan_ops.shared_scan_tiles(
                    x, kk, rof.WIDTH, nt
                ),
                t, keys,
            )["per_value"]
        elif op == "bitsliced-static-spread":
            perm = np.random.default_rng(7).permutation(1 << rof.WIDTH)
            ops, _, _, _ = rof._bitsliced_static_model(
                b1, perm[:k].astype(np.uint32)
            )
        elif op == "histogram-window":
            ops, _, _ = rof._hist_plain_model(b1, k)
        elif op == "histogram-dag-span":
            ops, _, _ = rof._hist_dag_model(b1, k, single_pass=True)
        elif op == "histogram-dag-chunked":
            ops, _, _ = rof._hist_dag_model(b1, k, single_pass=False)
        elif op == "aggregate-compare":
            ops, _, _ = rof._agg_models(b1, k, "compare")
        elif op == "aggregate-bitplane":
            ops, _, _ = rof._agg_models(b1, k, "bitplane")
        elif op == "linear-fused-s8":
            t = rof._tiny(rof.WIDTH)
            nt = t.shape[1] * 128 * 32
            ops = count_vector_ops(
                lambda x, kk=k: scan_ops._interval_linear_tiles_impl(
                    x, 0, kk, rof.WIDTH, nt, None, False, True, "s8", 0
                ),
                t,
            )["per_value"]
        elif op == "linear-fused-traced":
            t = rof._tiny(rof.WIDTH)
            nt = t.shape[1] * 128 * 32
            ops = count_vector_ops(
                lambda x, kj, kk=k: scan_ops._bitsliced_linear_tiles_impl(
                    x, kj, kk, rof.WIDTH, nt, None, False, "s8", 0
                ),
                t, jnp.arange(k, dtype=jnp.uint32),
            )["per_value"]
        elif op.startswith("interval-scan-w"):
            wn = int(op.rsplit("w", 1)[1])
            t = rof._tiny(wn)
            nt = t.shape[1] * 128 * 32
            ops = count_vector_ops(
                lambda x, lo, wn=wn, kk=k: scan_ops.interval_scan_tiles(
                    x, lo, kk, wn, nt
                ),
                t, jnp.uint32(0),
            )["per_value"]
        else:
            # copy (no ops), member-ortree (analytic count, 2 reductions
            # total), linear-hier (word-grid elem-op accounting)
            continue
        r["ops_per_value"] = round(float(ops), 2)
        if r["ops_per_value"] != old:
            changed += 1
            print(f"{op} k={k}: ops/val {old} -> {r['ops_per_value']}")

    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"updated {changed} rows in {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
