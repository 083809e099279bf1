"""Bench harness plumbing + utils tests (CPU-safe parts only; kernel
timing itself needs the real chip and is exercised by bench.py)."""
import numpy as np

from shared_simd_scan_tpu.bench import harness
from shared_simd_scan_tpu.bench.cli import _parse_size
from shared_simd_scan_tpu.utils import debug, profiling


def test_synth_corpora_match_reference_formulas():
    n = 1000
    ramp = np.asarray(harness.synth_ramp(n, 9))
    np.testing.assert_array_equal(ramp, np.arange(n) & 0x1FF)
    mod5 = np.asarray(harness.synth_mod5(n))
    np.testing.assert_array_equal(mod5, np.arange(n) % 5)
    modk = np.asarray(harness.synth_modk(n, 8, 9))
    np.testing.assert_array_equal(modk, np.arange(n) % 8 % 512)


def test_values_for_inverts_packed_size():
    from shared_simd_scan_tpu.layout import packed_nbytes

    n = harness.values_for(500 * 1024 * 1024, 9)
    assert abs(packed_nbytes(9, n) - 500 * 1024 * 1024) < 16


def test_result_line_format_parsable():
    import re

    from shared_simd_scan_tpu.bench.timing import Measurement

    res = harness.BenchResult(
        "pallas shared scan k=8", Measurement(0.00123, [0.0012, 0.0013], 8, 64), 10**9
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        harness.print_result(res, roofline=819e9)
    out = buf.getvalue().splitlines()
    m = re.match(r"^\* (.+?): ([\d.]+) ms; \[([^\]]*)\] ms$", out[0])
    assert m and m.group(1) == "pallas shared scan k=8"
    assert "GB/s" in out[1] and "roofline" in out[1]


def test_sweep_script_line_regex():
    from scripts.prepare_shared_scan_results import GBS_RE, LINE_RE

    line = "* pallas shared scan k=8 tb=32: 2.831759 ms; [3.27, 2.83] ms"
    m = LINE_RE.match(line)
    assert m and float(m["avg"]) == 2.831759
    g = GBS_RE.match("    358.1 GB/s (43.7% of 819 GB/s HBM roofline)")
    assert g and float(g["gbs"]) == 358.1


def test_cli_parse_size():
    assert _parse_size("512m") == 512 * 1024 * 1024
    assert _parse_size("4k") == 4096
    assert _parse_size("1g") == 1 << 30
    assert _parse_size("12345") == 12345


def test_dump_byte_lsb_first():
    assert debug.dump_byte(5) == "10100000"
    assert debug.dump_byte(0x80) == "00000001"


def test_dump_memory_bytes():
    out = debug.dump_memory(bytes([5, 5]))
    assert "10100000 10100000" in out


def test_profile_sample_registry():
    profiling.reset_samples()
    with profiling.ProfileSample("unit"):
        pass
    with profiling.ProfileSample("unit"):
        pass
    s = profiling.get_sample("unit")
    assert s.count == 2 and s.total_ns > 0


def test_clock_ns_delta():
    profiling.clock_ns()
    assert profiling.clock_ns() >= 0
