#!/bin/bash
# Raw full-suite capture: the bench CLI's default suite at 512 MiB plus
# the 512 MiB sharedscan headline section.  Output is committed verbatim
# (bench_results/full_suite_v5e_512m.log) — no post-editing.
set -e
cd "$(dirname "$0")/.."
{
  echo "\$ python -m shared_simd_scan_tpu.bench 512m 3"
  PYTHONPATH=/root/.axon_site python -u -m shared_simd_scan_tpu.bench 512m 3
  echo
  echo "\$ python -m shared_simd_scan_tpu.bench 512m 3 sharedscan 8"
  PYTHONPATH=/root/.axon_site python -u -m shared_simd_scan_tpu.bench 512m 3 sharedscan 8
  echo
  echo "\$ python -m shared_simd_scan_tpu.bench 512m 3 pack"
  PYTHONPATH=/root/.axon_site python -u -m shared_simd_scan_tpu.bench 512m 3 pack
  echo
  echo "\$ python -m shared_simd_scan_tpu.bench 512m 3 linear 8"
  PYTHONPATH=/root/.axon_site python -u -m shared_simd_scan_tpu.bench 512m 3 linear 8
} 2>&1 | grep -v "Platform 'axon' is experimental"
