"""Post-outage hardware drive: every kernel/dispatch path added this
session, on the real chip, small shapes first.  Cross-checked vs numpy."""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from shared_simd_scan_tpu import layout, query as q, stats  # noqa: E402
from shared_simd_scan_tpu.ops import aggregate as agg_ops  # noqa: E402
from shared_simd_scan_tpu.ops import conj as conj_ops  # noqa: E402
from shared_simd_scan_tpu.ops import member as member_ops  # noqa: E402
from shared_simd_scan_tpu.ops import scan as scan_ops  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402

print("backend:", jax.devices(), flush=True)

WIDTH = 9
N = 2_000_000
rng = np.random.default_rng(123)
vals_np = rng.integers(0, 1 << WIDTH, N, dtype=np.uint32)
dev = unpack_ops.pack_device_kernel(jnp.asarray(vals_np), WIDTH)


def canon(bits):
    return np.asarray(jax.device_get(scan_ops.bits_to_canonical(bits, N)))


def expect_words(mask):
    w = np.zeros((N + 31) // 32, np.uint32)
    idx = np.nonzero(mask)[0]
    np.bitwise_or.at(w, idx // 32, np.uint32(1) << (idx % 32).astype(np.uint32))
    return w


def step(name):
    print(f"[{time.strftime('%H:%M:%S')}] {name}", flush=True)


# 1. shared_scan_device spread keys -> bit-sliced tier
for k in (8, 48):
    step(f"shared bit-sliced k={k}")
    keys = ((np.arange(k, dtype=np.uint32) * 97 + 5) % (1 << WIDTH)).astype(np.uint32)
    assert scan_ops._bitsliced_wins(WIDTH, k)
    bits, cnt = scan_ops.shared_scan_device(dev, keys)
    cnt = np.asarray(jax.device_get(cnt))
    exp = np.array([(vals_np == kk).sum() for kk in keys], np.uint32)
    assert (cnt == exp).all(), f"shared k={k} counts wrong"
    row = canon(bits[3])
    np.testing.assert_array_equal(row, expect_words(vals_np == keys[3]))

# 2. member bit-sliced k=100 (sentinel padding) and k=8
for k, seed in ((100, 11), (8, 13)):
    step(f"member bit-sliced k={k}")
    keys = ((np.arange(k, dtype=np.uint32) * 37 + seed) % (1 << WIDTH)).astype(np.uint32)
    keys = np.unique(keys)
    mbits, mcnt = member_ops.member_scan_device(dev, keys)
    expect = np.isin(vals_np, keys)
    assert int(jax.device_get(mcnt)) == int(expect.sum())
    np.testing.assert_array_equal(canon(mbits), expect_words(expect))

# 3. conj kernel m=2 (9 + 16 bit columns)
step("conj m=2")
bvals_np = rng.integers(0, 1 << 16, N, dtype=np.uint32)
bdev = unpack_ops.pack_device_kernel(jnp.asarray(bvals_np), 16)
cbits, ccnt = conj_ops.conj_range_scan_device(
    [dev, bdev], [100, 1000], [400, 50000]
)
cmask = (vals_np >= 100) & (vals_np < 400) & (bvals_np >= 1000) & (bvals_np < 50000)
assert int(jax.device_get(ccnt)) == int(cmask.sum()), "conj count wrong"
np.testing.assert_array_equal(
    np.asarray(jax.device_get(cbits)), expect_words(cmask)
)

# 4. masked aggregate over the conj bitvector
step("masked aggregate")
total, mc = agg_ops.masked_aggregate_device(bdev, cbits)
assert int(mc) == int(cmask.sum())
assert int(total) == int(bvals_np[cmask].astype(np.uint64).sum()), "sum wrong"

# 5. query tree end-to-end (plans: conj + member + compose)
step("query tree")
qbits, qcnt = q.evaluate(
    q.And(q.Range(dev, 50, 300), q.Or(q.In(dev, [77, 200, 431]),
                                      q.Not(q.Range(bdev, 0, 40000))))
)
qmask = ((vals_np >= 50) & (vals_np < 300)) & (
    np.isin(vals_np, [77, 200, 431]) | ~(bvals_np < 40000)
)
assert int(jax.device_get(qcnt)) == int(qmask.sum()), "query count wrong"

# 6. stats (histogram windows)
step("stats")
qs = stats.quantiles(dev, [0.5, 0.99])
sv = np.sort(vals_np)
assert int(qs[0]) == int(sv[max(1, int(np.ceil(0.5 * N))) - 1])
assert int(qs[1]) == int(sv[max(1, int(np.ceil(0.99 * N))) - 1])

# 7 (round 4). aggregate bit-plane tier: static (AND-DAG) + traced
step("aggregate bit-plane static k=12")
akeys = np.unique(((np.arange(12) * 131 + 7) % 512).astype(np.uint32))
counts, slo, shi = agg_ops.aggregate_bitplane_static_tiles(
    dev.tiles, bdev.tiles, akeys, WIDTH, 16, N
)
asums = agg_ops.finalize_sums(slo, shi)
ecnt = np.array([(vals_np == kk).sum() for kk in akeys], np.uint32)
esum = np.array(
    [bvals_np[vals_np == kk].astype(np.uint64).sum() for kk in akeys],
    np.uint64,
)
assert (np.asarray(jax.device_get(counts)) == ecnt).all(), "bp-static counts"
assert (asums == esum).all(), "bp-static sums"

step("aggregate bit-plane traced k=12 + device dispatch")
counts, slo, shi = agg_ops.aggregate_bitplane_tiles(
    dev.tiles, bdev.tiles, jnp.asarray(akeys), WIDTH, 16, N
)
assert (np.asarray(jax.device_get(counts)) == ecnt).all(), "bp-traced counts"
assert (agg_ops.finalize_sums(slo, shi) == esum).all(), "bp-traced sums"
assert agg_ops.pick_aggregate_tier(WIDTH, 16, akeys) == "bitplane"
dsums, dcounts = agg_ops.aggregate_scan_device(dev, bdev, akeys)
assert (np.asarray(jax.device_get(dcounts)) == ecnt).all(), "dispatch counts"
assert (dsums == esum).all(), "dispatch sums"

# 8 (round 4). linear export: MXU permutation relayout (k=8) + fallback
step("linear MXU interleave k=8")
lkeys = np.arange(8, dtype=np.uint32)
lin = scan_ops.shared_scan_linear_device(dev, lkeys)
lin_np = np.asarray(jax.device_get(lin))
exp_lin = np.zeros(((N + 7) // 8) * 8, np.uint8)
for j, key in enumerate(lkeys):
    exp_lin[j::8] = np.packbits(vals_np == key, bitorder="little")
np.testing.assert_array_equal(lin_np, exp_lin)

step("linear XLA-stack fallback k=6")
lkeys6 = np.arange(6, dtype=np.uint32)
lin6 = np.asarray(jax.device_get(scan_ops.shared_scan_linear_device(dev, lkeys6)))
exp6 = np.zeros(((N + 7) // 8) * 6, np.uint8)
for j, key in enumerate(lkeys6):
    exp6[j::6] = np.packbits(vals_np == key, bitorder="little")
np.testing.assert_array_equal(lin6, exp6)

# 9 (round 4). histogram span kernel (single-pass full domain)
step("histogram span k=512")
hist = np.asarray(
    jax.device_get(scan_ops.histogram_dag_tiles(dev.tiles, 0, 512, WIDTH, N))
)
np.testing.assert_array_equal(hist, np.bincount(vals_np, minlength=512))

# 10 (round 4). zoned range scan (gather grid, scattered live steps)
step("zoned range scan (clustered-unsorted)")
from shared_simd_scan_tpu import zonemap as zm  # noqa: E402

zvals = rng.integers(100, 200, N, dtype=np.uint32)
zvals[: 64 * 4096] = 7
zvals[-64 * 4096 :] = 7
zdev = unpack_ops.pack_device_kernel(jnp.asarray(zvals), WIDTH)
zmap = zm.build_zonemap(zdev, zone_b1=64)
live = zm.zone_step_mask(zmap, 7, 8, 64)
# clusters at both file ends (tail cluster may straddle one zone edge)
assert live[0] and live[-1] and int(live.sum()) <= 3, "gating mask wrong"
assert not live[1 : len(live) // 2].any(), "middle zones must prune"
zbits, zcnt = zm.zoned_range_scan(zdev, zmap, 7, 8, tb=64)
zmask = zvals == 7
assert int(jax.device_get(zcnt)) == int(zmask.sum()), "zoned count wrong"
np.testing.assert_array_equal(
    np.asarray(jax.device_get(zbits)), expect_words(zmask)
)

# 10b (round 4, second session). linear export ladder: fused single-pass
# (k=8, s8 MXU dots), hierarchical two-level (k=32), dispatcher parity
step("linear export (fused s8 + hierarchical)")
from shared_simd_scan_tpu.ops import scan as _sc  # noqa: E402

_nb = (N + 7) // 8


def _lin_expect(keys):
    eb = np.zeros((len(keys), _nb * 8), np.uint8)
    for j, key in enumerate(keys):
        eb[j, :N] = vals_np == key
    return np.packbits(
        eb.reshape(len(keys), _nb, 8), axis=-1, bitorder="little"
    ).reshape(len(keys), _nb).T.reshape(-1), eb.sum(axis=1).astype(np.uint32)


elin, ecnt = _lin_expect(range(100, 108))
lw, lc = _sc.interval_scan_linear_words_tiles(dev.tiles, 100, 8, WIDTH, N)
assert np.array_equal(
    np.asarray(jax.device_get(lw)).view(np.uint8)[: _nb * 8], elin
), "fused linear words wrong"
assert np.array_equal(np.asarray(jax.device_get(lc)), ecnt)
hkeys = ((np.arange(32, dtype=np.uint32) * 37 + 5) % 512)
elin32, _ = _lin_expect(hkeys)
hw = _sc.shared_scan_linear_words_device(dev, hkeys)
assert np.array_equal(
    np.asarray(jax.device_get(hw)).view(np.uint8)[: _nb * 32], elin32
), "hierarchical linear words wrong"
# consecutive k=32 dispatches the FUSED hierarchy (no bits round-trip)
elinc, ecntc = _lin_expect(range(60, 92))
fw, fc = _sc.interval_scan_linear_words_large(dev.tiles, 60, 32, WIDTH, N)
assert np.array_equal(
    np.asarray(jax.device_get(fw)).view(np.uint8)[: _nb * 32], elinc
), "fused-hier linear words wrong"
assert np.array_equal(np.asarray(jax.device_get(fc)), ecntc)

# 10c (round 5). fused STATIC-DAG linear export: arbitrary concrete keys
# one-pass (k=8 spread) + hierarchical (k=32 spread) + groups-of-4 (k=20)
step("linear export (fused static-DAG, arbitrary keys)")
skeys8 = np.array([3, 471, 12, 200, 77, 508, 130, 9], np.uint32)
eslin, escnt = _lin_expect(skeys8)
sw, sc = _sc.static_scan_linear_words_tiles(dev.tiles, skeys8, WIDTH, N)
assert np.array_equal(
    np.asarray(jax.device_get(sw)).view(np.uint8)[: _nb * 8], eslin
), "fused static linear words wrong"
assert np.array_equal(np.asarray(jax.device_get(sc)), escnt)
skeys32 = ((np.arange(32, dtype=np.uint32) * 41 + 7) % 512)
eslin32, escnt32 = _lin_expect(skeys32)
sw32, sc32 = _sc.static_scan_linear_words_large(dev.tiles, skeys32, WIDTH, N)
assert np.array_equal(
    np.asarray(jax.device_get(sw32)).view(np.uint8)[: _nb * 32], eslin32
), "fused static hierarchical words wrong"
assert np.array_equal(np.asarray(jax.device_get(sc32)), escnt32)
eslin20, _ = _lin_expect(range(200, 220))
gw20, _ = _sc.interval_scan_linear_words_large(dev.tiles, 200, 20, WIDTH, N)
assert np.array_equal(
    np.asarray(jax.device_get(gw20)).view(np.uint8)[: _nb * 20], eslin20
), "groups-of-4 hierarchical words wrong"

# 10d (round 5). fused TRACED-keys export: one compiled program, re-keyed
step("linear export (fused traced keys)")
_tfn = jax.jit(
    lambda kv: _sc.shared_scan_linear_words_device(
        layout.DeviceColumn(width=WIDTH, n=N, tiles=dev.tiles), kv
    )
)
for tkeys in (skeys8, np.array([5, 505, 250, 1, 333, 87, 410, 96], np.uint32)):
    etl, _ = _lin_expect(tkeys)
    tw_ = np.asarray(jax.device_get(_tfn(jnp.asarray(tkeys))))
    assert np.array_equal(
        tw_.view(np.uint8)[: _nb * 8], etl
    ), "traced fused linear words wrong"

# 12 (round 5). encoding/null layers + io on hardware (VERDICT r4 item 7)
step("nullable Kleene tree")
from shared_simd_scan_tpu import nullable, forcol, dictcol, io as sss_io  # noqa: E402

nmask = (rng.integers(0, 8, N) == 0)
nc = nullable.pack_nullable(vals_np, nmask, WIDTH)
nb_, ncount = nullable.evaluate(
    q.Not(q.Or(q.Eq(nc, 3), q.Range(nc, 10, 50)))
)
exp_mask = ~((vals_np == 3) | ((vals_np >= 10) & (vals_np < 50))) & ~nmask
assert int(jax.device_get(ncount)) == int(exp_mask.sum()), "nullable count wrong"
np.testing.assert_array_equal(
    np.asarray(jax.device_get(nb_)), expect_words(exp_mask)
)

step("FOR-encoded range query")
fvals = vals_np.astype(np.uint64) + 50_000
fc = forcol.pack_for(fvals)
fb, fcount = forcol.evaluate(q.Range(fc, 50_010, 50_050))
fmask = (fvals >= 50_010) & (fvals < 50_050)
assert int(jax.device_get(fcount)) == int(fmask.sum()), "FOR count wrong"
np.testing.assert_array_equal(
    np.asarray(jax.device_get(fb)), expect_words(fmask)
)

step("dict-encoded Range rewrite")
dvals = (vals_np.astype(np.uint64) * 1_000_003) % (1 << 40)
dc = dictcol.pack_dict(dvals)
dlo, dhi = int(np.percentile(dvals, 30)), int(np.percentile(dvals, 60))
db, dcount = dictcol.evaluate(q.Range(dc, dlo, dhi))
dmask = (dvals >= dlo) & (dvals < dhi)
assert int(jax.device_get(dcount)) == int(dmask.sum()), "dict count wrong"
np.testing.assert_array_equal(
    np.asarray(jax.device_get(db)), expect_words(dmask)
)

step("io save/load round-trip")
import tempfile  # noqa: E402

with tempfile.TemporaryDirectory() as td:
    col = layout.pack(vals_np, WIDTH)
    sss_io.save_column(col, td + "/col.sss")
    col2 = sss_io.load_column(td + "/col.sss")
    assert np.array_equal(
        np.asarray(col.words), np.asarray(col2.words)
    ), "io column payload mismatch"
    dev2 = layout.to_device(col2)
    _, c2 = scan_ops.shared_scan_device(dev2, np.array([5], np.uint32))
    assert int(jax.device_get(c2)[0]) == int((vals_np == 5).sum()), (
        "scan over reloaded column wrong"
    )

# 11. sharded dispatch on the single real device
step("sharded")
from shared_simd_scan_tpu.parallel import dist  # noqa: E402

mesh = dist.make_mesh()
k = 40
keys = ((np.arange(k, dtype=np.uint32) * 13 + 1) % 512).astype(np.uint32)
sdev = dist.shard_column(dev, mesh)
bits, cnt = dist.sharded_shared_scan(sdev, jnp.asarray(keys), mesh=mesh)
cnt = np.asarray(jax.device_get(cnt))
exp = np.array([(vals_np == kk).sum() for kk in keys], np.uint32)
assert (cnt == exp).all(), "sharded counts wrong"

print("ALL DRIVE CHECKS PASSED", flush=True)
sys.exit(0)
