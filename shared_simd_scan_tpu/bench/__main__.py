import sys

from shared_simd_scan_tpu.bench.cli import main

sys.exit(main())
