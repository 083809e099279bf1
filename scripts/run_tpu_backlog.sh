#!/bin/bash
# Post-outage TPU backlog: drive every new kernel path, then refresh the
# measured evidence rows.  Run single-stream (the tunnel wedges under
# concurrent compile streams):
#   bash scripts/run_tpu_backlog.sh 2>&1 | tee /tmp/tpu_backlog.log
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

# 1. hardware drive of every dispatch/kernel path added this session
timeout 3600 python -u scripts/drive_hw_check.py || exit 1

# 2. member rows at 512 MiB (interval/window/compare/bit-sliced tiers)
timeout 5400 python -u scripts/run_member_bench.py \
    bench_results/member_v5e_512m.csv --data-size=512m --reps=4

# 3. bit-sliced spread-key rows at 512 MiB + the chunked-compare context
timeout 7200 python -u scripts/run_bitsliced_bench.py \
    bench_results/bitsliced_v5e_512m.csv --data-size=512m --k=8,16,32,64,256,512

# 4. conj m=2 at 256 MiB per column (512 MiB total read)
timeout 3600 python -u -m shared_simd_scan_tpu.bench 256m 4 conj 2

# 5. headline sanity through the compile cache
timeout 3600 python -u bench.py
