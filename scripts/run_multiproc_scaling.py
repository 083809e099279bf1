"""Multi-process (Gloo) weak-scaling rows for the compiled XLA tier
(VERDICT r3 item 6, second half).

run_scaling_compiled.py measures the collective pattern on ONE process's
virtual mesh; this script measures it across real OS-process boundaries:
the parent launches the same child N times (N = 1, 2, 4 processes, one
single-threaded XLA CPU device each, joined with jax.distributed + Gloo),
each child runs the salt-chained sharded-shared-scan timing loop on the
full N-device mesh at a fixed per-device shard, and process 0 reports
aggregate bytes/s.  Every process executes the identical measure_loop
schedule (the salt is passed in, the loop-count sizing is deterministic),
which is what lockstep multi-controller jax requires.

Usage:  python scripts/run_multiproc_scaling.py [out.csv]
"""
from __future__ import annotations

import csv
import os
import subprocess
import sys
import time

PORT = 19941
PER_DEVICE = 16 * 1024 * 1024


def child(proc_id: int, nproc: int, salt0: int) -> int:
    # hard one-core-per-process isolation: the eigen XLA flag alone did
    # not stop the 1-proc run from using several cores (measured 5.3 GB/s
    # single-"threaded"), which poisoned the efficiency denominator
    os.sched_setaffinity(0, {proc_id % (os.cpu_count() or 1)})
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{PORT + nproc}",
            num_processes=nproc,
            process_id=proc_id,
        )
    import functools

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from shared_simd_scan_tpu import layout
    from shared_simd_scan_tpu.bench import harness
    from shared_simd_scan_tpu.bench.scaling import _chain_sharded_xla
    from shared_simd_scan_tpu.bench.timing import measure_loop
    from shared_simd_scan_tpu.parallel import dist
    from shared_simd_scan_tpu.ops import unpack as unpack_ops

    nd = jax.device_count()
    assert nd == nproc, (nd, nproc)
    mesh = Mesh(np.asarray(jax.devices()), (dist.DATA_AXIS,))

    width, k = 9, 8
    n = harness.values_for(PER_DEVICE * nd, width)
    vals = harness.synth_modk(n, k, width)
    dev = unpack_ops.pack_device_kernel(vals, width, interpret=True)
    sdev = dist.shard_column(dev, mesh)
    keys = jnp.arange(k, dtype=jnp.uint32)
    traffic = layout.packed_nbytes(width, n) + k * layout.bitvector_words(n) * 4

    meas = measure_loop(
        functools.partial(_chain_sharded_xla, mesh=mesh, width=width, n=n),
        (sdev.tiles, keys),
        trials=3, k_lo=4, k_hi=20, salt0=salt0,
    )
    if proc_id == 0:
        print(f"RESULT {nproc} {traffic / meas.seconds:.0f}", flush=True)
    return 0


def main(argv):
    if argv and argv[0] == "--child":
        return child(int(argv[1]), int(argv[2]), int(argv[3]))
    out_path = argv[0] if argv else "bench_results/scaling_multiproc_gloo.csv"
    salt0 = int(time.time()) % 1_000_000
    rows = []
    base = None
    for nproc in (1, 2, 4):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=1"
            + " --xla_cpu_multi_thread_eigen=false"
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        procs = [
            subprocess.Popen(
                [sys.executable, __file__, "--child", str(i), str(nproc),
                 str(salt0)],
                env=env, stdout=subprocess.PIPE, text=True,
            )
            for i in range(nproc)
        ]
        bps = None
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            if p.returncode != 0:
                raise SystemExit(f"child failed (nproc={nproc})")
            for line in (out or "").splitlines():
                if line.startswith("RESULT"):
                    bps = float(line.split()[2])
        assert bps is not None
        if base is None:
            base = bps
        eff = bps / (base * nproc)
        cores = os.cpu_count() or 1
        rows.append({
            "processes": nproc, "aggregate_bytes_per_s": round(bps),
            "efficiency_vs_1proc": round(eff, 4),
            "platform": "cpu-gloo-multiprocess", "tier": "xla-compiled",
            "note": (
                f"one single-threaded device per process; "
                f"{'within' if nproc <= cores else 'over'} {cores} cores"
            ),
        })
        print(f"nproc={nproc}: {bps / 1e9:.2f} GB/s eff={eff:.2f}", flush=True)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
