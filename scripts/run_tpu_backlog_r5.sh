#!/bin/bash
# Round-5 TPU backlog — SINGLE-STREAM (never overlap TPU processes).
# Run detached: logs buffer; check process CPU time, not the log.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 1. hardware drive of every path incl. the round-5 additions
timeout 3600 python scripts/drive_hw_check.py \
    2>&1 | tee bench_results/drive_hw_check_r5.log

# 2. spread-key fused-static linear rows (VERDICT r4 item 1 evidence)
timeout 3600 python scripts/run_linear_bench.py \
    bench_results/linear_spread_k8_v5e_512m.csv --spread --k=8 --skip=stack,host
timeout 3600 python scripts/run_linear_bench.py \
    bench_results/linear_spread_k32_v5e_512m.csv --spread --k=32 --skip=stack,host

# 3. consecutive k=20 (new groups-of-4 tier; stack would be the old path)
timeout 3600 python scripts/run_linear_bench.py \
    bench_results/linear_k20_v5e_512m.csv --k=20 --skip=stack,host

# 4. op-fit with the bitsliced-static flagship + narrow-width rows
timeout 7200 python scripts/run_op_fit.py bench_results/op_fit_v5e.csv
python scripts/fit_op_costs.py bench_results/op_fit_v5e.csv \
    2>&1 | tee bench_results/op_fit_report_r5.txt

# 5. histogram span k=512 with batched stores (closes the 1.25x residue
#    or proves it): tb sweep probe
timeout 3600 python scripts/run_histspan_tb_probe.py --k=512 \
    2>&1 | tee bench_results/histspan_batched_r5.log

# 6. memory baseline with the new 8-byte + memcpy rows
timeout 3600 python -m shared_simd_scan_tpu.bench memory \
    2>&1 | tee bench_results/memory_baseline_r5.log

echo "BACKLOG DONE"
