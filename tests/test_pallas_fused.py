"""Fully fused demod kernel: exact bit/time parity with the XLA op path, and
frame-level parity via demod_blocks(use_pallas='fused') on synthetic data."""

import numpy as np
import jax.numpy as jnp

from project_desert_tortoise_tpu import chain as chain_lib
from project_desert_tortoise_tpu.ops import agc as A, clock as C, fir as F
from project_desert_tortoise_tpu.ops import manchester as M, pll as P
from project_desert_tortoise_tpu.ops.pallas.fused_kernel import (
    fused_demod_pallas)
from project_desert_tortoise_tpu.utils.config import POES_TIP


def test_fused_matches_xla_all_lanes():
    fs = 50000.0
    params = chain_lib.make_params(POES_TIP, fs, quirks=False)
    B, L = 128, 2048
    rng = np.random.default_rng(0)
    sym = rng.choice([-1.0, 1.0], size=(B, L // 3 + 9))
    base = np.repeat(sym, 3, axis=1)[:, :L]
    re = jnp.asarray((base * 0.01
                      + 0.002 * rng.standard_normal((B, L))).astype(np.float32))
    im = jnp.asarray((0.002 * rng.standard_normal((B, L))).astype(np.float32))
    tn = jnp.asarray(np.tile(np.arange(1, L + 1, dtype=np.float32) / fs,
                             (B, 1)))
    pst = P.init_state(params.pll, jnp.float32, (B,))
    gain0 = jnp.full((B,), 17.58, jnp.float32)

    _, soft, _ = P.pll_scan(params.pll, pst, (re, im))
    taps = np.asarray(params.taps, np.float32)
    y = F.fir_interp(soft, taps, params.interp)
    _, y1 = A.agc_scan(A.AGCState(gain=gain0), y, params.agc_attack,
                       params.agc_decay)
    t_out = F.fir_out_times(tn, params.interp)
    g0 = C.gardner_init(jnp.float32, (B,))
    m0 = M.manchester_init(jnp.float32, (B,))
    _, _, bits1, bt1, em1 = C.gardner_manchester_windowed(
        g0, m0, y1, t_out, jnp.full((B,), L * params.interp),
        params.step_size, params.gardner_err_limit, params.gardner_gain,
        params.resync_threshold, window=1024 * 3)

    bits2, bt2, em2, avgp = fused_demod_pallas(
        params, pst, gain0, (re, im), tn, window=512, interpret=True)

    # the compiled default unrolls the body (DEFAULT_UNROLL); outputs must
    # be bit-identical to the rolled form at every factor we might ship
    for U in (8, 32):
        oU = fused_demod_pallas(params, pst, gain0, (re, im), tn,
                                window=512, interpret=True, unroll=U)
        assert all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip((bits2, bt2, em2, avgp), oU))

    for k in range(B):
        a = np.asarray(bits1[k])[np.asarray(em1[k])]
        ta = np.asarray(bt1[k])[np.asarray(em1[k])]
        b = np.asarray(bits2[k])[np.asarray(em2[k])]
        tb = np.asarray(bt2[k])[np.asarray(em2[k])]
        assert len(a) == len(b)
        assert np.array_equal(a, b.astype(np.uint8))
        assert np.array_equal(ta, tb)


def test_fused_golden_clip_compiled(poes_clip, oracle_frames):
    """Fused kernel via demod_blocks (Pallas interpreter on CPU) on the real
    golden clip must reproduce every oracle frame byte-identically.

    The recording is tiled so n_blocks >= batch_blocks == 128 — demod_blocks
    silently falls back to the XLA path when B % 128 != 0, which this test
    must not let happen (round-3 fix: 3 tiles gave only 92 blocks, so the
    kernel never actually engaged here)."""
    from project_desert_tortoise_tpu.parallel.blocked import (BlockPlan,
                                                              demodulate_blocked)
    from project_desert_tortoise_tpu.utils import wav as W
    iq, t, fs = poes_clip
    plan = BlockPlan(core=8192, head=12288, tail=8192, max_frames=8)
    reps = -(-128 * plan.core // len(iq))   # >=128 blocks: lane tiling engages
    iq3 = np.tile(iq, reps)
    t3 = W.time_axis(len(iq3), fs, np.float32)
    frames = demodulate_blocked(iq3, t3, fs, POES_TIP, plan=plan,
                                batch_blocks=128, window=512,
                                use_pallas="fused")
    mine = {round(f.time, 5): f.hex_line() for f in frames}
    complete = [o for o in oracle_frames if len(o[2]) == 104]
    matched = 0
    for ot, oinv, obytes in complete:
        line = mine.get(round(ot, 5))
        body = " ".join(f"{b:02X}" for b in obytes)
        if line is not None and line.endswith(body):
            matched += 1
    assert matched >= len(complete) - 1


def test_fused_interp1_argos_shape():
    """Fused kernel with interp == 1 (ARGOS fast-path shape, 50-tap FIR,
    after-AGC squelch) matches the XLA path."""
    from project_desert_tortoise_tpu.utils.config import ARGOS
    from project_desert_tortoise_tpu.ops import agc as A
    fs = 32000.0
    params = chain_lib.make_params(ARGOS, fs, quirks=False)
    B, L = 128, 1024
    rng = np.random.default_rng(1)
    sym = rng.choice([-1.0, 1.0], size=(B, L // 40 + 2))
    base = np.repeat(sym, 40, axis=1)[:, :L]
    re = jnp.asarray((base * 0.01
                      + 0.001 * rng.standard_normal((B, L))).astype(np.float32))
    im = jnp.asarray((0.001 * rng.standard_normal((B, L))).astype(np.float32))
    tn = jnp.asarray(np.tile(np.arange(L, dtype=np.float32) / fs, (B, 1)))
    pst = P.init_state(params.pll, jnp.float32, (B,))
    gain0 = jnp.full((B,), 50.0, jnp.float32)

    _, soft, lock = P.pll_scan(params.pll, pst, (re, im))
    taps = np.asarray(params.taps, np.float32)
    y = F.fir_interp(soft, taps, 1)
    _, y1 = A.agc_scan(A.AGCState(gain=gain0), y, params.agc_attack,
                       params.agc_decay)
    y1 = A.squelch(y1, lock, params.squelch_threshold)
    g0 = C.gardner_init(jnp.float32, (B,))
    m0 = M.manchester_init(jnp.float32, (B,))
    _, _, bits1, bt1, em1 = C.gardner_manchester_windowed(
        g0, m0, y1, tn, jnp.full((B,), L), params.step_size,
        params.gardner_err_limit, params.gardner_gain,
        params.resync_threshold, window=512)

    bits2, bt2, em2, _ = fused_demod_pallas(
        params, pst, gain0, (re, im), tn, window=256, interpret=True)

    for k in range(0, B, 17):
        a = np.asarray(bits1[k])[np.asarray(em1[k])]
        ta = np.asarray(bt1[k])[np.asarray(em1[k])]
        b = np.asarray(bits2[k])[np.asarray(em2[k])]
        tb = np.asarray(bt2[k])[np.asarray(em2[k])]
        assert len(a) == len(b)
        assert np.array_equal(a, b.astype(np.uint8))
        # times must match too: with the pre-round-3 fixed RING=16 the
        # kernel's Gardner mid-bit read fell off the ring for step 40 and
        # the timing loop silently free-ran (bits still matched on clean
        # data, times did not)
        assert np.array_equal(ta, tb)


def test_fused_tight_geometry_latch_parity():
    """Capture-latch stress: a geometry where the mid-bit target is only
    ~1 body step ahead of its capture (step/2 - err_limit - interp = 0.025
    vs POES's 1.45) must still be bit/time-exact vs the XLA path — the
    tightest geometry the round-5 capture-latch diet admits."""
    fs = 50000.0
    params = chain_lib.make_params(POES_TIP, fs, quirks=False)
    # step 6.25 at interp 3: half offset 3.125, margin 0.025
    params = params._replace(step_size=6.25, baud=fs * 3 / 6.25)
    B, L = 128, 1536
    rng = np.random.default_rng(7)
    sym = rng.choice([-1.0, 1.0], size=(B, L // 2 + 4))
    base = np.repeat(sym, 2, axis=1)[:, :L]     # ~2 samples/symbol
    re = jnp.asarray((base * 0.01
                      + 0.002 * rng.standard_normal((B, L))).astype(np.float32))
    im = jnp.asarray((0.002 * rng.standard_normal((B, L))).astype(np.float32))
    tn = jnp.asarray(np.tile(np.arange(1, L + 1, dtype=np.float32) / fs,
                             (B, 1)))
    pst = P.init_state(params.pll, jnp.float32, (B,))
    gain0 = jnp.full((B,), 17.58, jnp.float32)

    from project_desert_tortoise_tpu.ops import agc as A
    _, soft, _ = P.pll_scan(params.pll, pst, (re, im))
    taps = np.asarray(params.taps, np.float32)
    y = F.fir_interp(soft, taps, params.interp)
    _, y1 = A.agc_scan(A.AGCState(gain=gain0), y, params.agc_attack,
                       params.agc_decay)
    t_out = F.fir_out_times(tn, params.interp)
    g0 = C.gardner_init(jnp.float32, (B,))
    m0 = M.manchester_init(jnp.float32, (B,))
    _, _, bits1, bt1, em1 = C.gardner_manchester_windowed(
        g0, m0, y1, t_out, jnp.full((B,), L * params.interp),
        params.step_size, params.gardner_err_limit, params.gardner_gain,
        params.resync_threshold, window=L * params.interp // 2)

    bits2, bt2, em2, _ = fused_demod_pallas(
        params, pst, gain0, (re, im), tn, window=512, interpret=True)

    n_emitted = 0
    for k in range(0, B, 11):
        a = np.asarray(bits1[k])[np.asarray(em1[k])]
        ta = np.asarray(bt1[k])[np.asarray(em1[k])]
        b = np.asarray(bits2[k])[np.asarray(em2[k])]
        tb = np.asarray(bt2[k])[np.asarray(em2[k])]
        assert len(a) == len(b)
        assert np.array_equal(a, b.astype(np.uint8))
        assert np.array_equal(ta, tb)
        n_emitted += len(b)
    assert n_emitted > 100        # the stress actually emitted symbols


def test_fused_rejects_latch_invariant_violation():
    """step/2 - err_limit - interp <= 0 cannot be served by the capture
    latch; the kernel must refuse instead of silently diverging from the
    deep-ring semantics (use the XLA path for such geometries)."""
    import pytest
    fs = 50000.0
    params = chain_lib.make_params(POES_TIP, fs, quirks=False)
    params = params._replace(step_size=4.0, baud=fs * 3 / 4.0)
    B, L = 128, 512
    z = jnp.zeros((B, L), jnp.float32)
    pst = P.init_state(params.pll, jnp.float32, (B,))
    gain0 = jnp.full((B,), 17.58, jnp.float32)
    with pytest.raises(ValueError, match="capture-latch"):
        fused_demod_pallas(params, pst, gain0, (z, z), z,
                           window=256, interpret=True)
