"""v4 kernel (v1 structure + v3 hoisted-PLL math): parity contracts.

v4 and v3 implement mathematically identical chains (same hoisted angle /
magnitude planes, same Taylor sincos, same FIR accumulation order, same
Gardner/Manchester), differing only in *where* values live (registers vs
VMEM scratch) — so their outputs must be bit-identical.  Against v1, v4
inherits v3's numeric envelope (the reference's own ~0.005 rad atan2
approximation error moves near-threshold soft amplitudes), so the binding
contract is frame-level golden parity on the real clip."""

import numpy as np
import jax.numpy as jnp

from project_desert_tortoise_tpu import chain as chain_lib
from project_desert_tortoise_tpu.ops import pll as P
from project_desert_tortoise_tpu.ops.pallas.fused_kernel3 import (
    fused_demod_pallas3)
from project_desert_tortoise_tpu.ops.pallas.fused_kernel4 import (
    fused_demod_pallas4)
from project_desert_tortoise_tpu.utils.config import POES_TIP

from tests.test_pallas_fused3 import _mk_inputs


def test_v4_bitmatches_v3():
    fs = 50000.0
    params = chain_lib.make_params(POES_TIP, fs, quirks=False)
    B, L = 128, 2048
    re, im, tn = _mk_inputs(B, L, fs)
    pst = P.init_state(params.pll, jnp.float32, (B,))
    gain0 = jnp.full((B,), 17.58, jnp.float32)

    b3, t3, e3, a3 = fused_demod_pallas3(params, pst, gain0, (re, im), tn,
                                         window=512, interpret=True)
    b4, t4, e4, a4 = fused_demod_pallas4(params, pst, gain0, (re, im), tn,
                                         window=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(e4), np.asarray(e3))
    np.testing.assert_array_equal(np.asarray(b4), np.asarray(b3))
    np.testing.assert_array_equal(np.asarray(t4)[np.asarray(e4)],
                                  np.asarray(t3)[np.asarray(e3)])
    # avg_phase EWMAs pick up FMA-contraction differences between the two
    # lowerings (~1e-5 abs on ~1.56); the bit outputs above are exact
    np.testing.assert_allclose(np.asarray(a4), np.asarray(a3),
                               rtol=1e-4, atol=1e-4)


def test_v4_sublane_batching():
    """B = 256 (S = 2) must agree with two independent S = 1 runs."""
    fs = 50000.0
    params = chain_lib.make_params(POES_TIP, fs, quirks=False)
    B, L = 256, 1024
    re, im, tn = _mk_inputs(B, L, fs, seed=3)
    pst = P.init_state(params.pll, jnp.float32, (B,))
    gain0 = jnp.full((B,), 17.58, jnp.float32)
    b, t, e, a = fused_demod_pallas4(params, pst, gain0, (re, im), tn,
                                     window=256, interpret=True)
    import jax
    for half in (slice(0, 128), slice(128, 256)):
        psth = jax.tree.map(lambda x: x[half], pst)
        bh, th, eh, ah = fused_demod_pallas4(
            params, psth, gain0[half], (re[half], im[half]), tn[half],
            window=256, interpret=True)
        np.testing.assert_array_equal(np.asarray(b[half]), np.asarray(bh))
        np.testing.assert_array_equal(np.asarray(e[half]), np.asarray(eh))


def test_fused4_golden_clip_compiled(poes_clip, oracle_frames):
    """Compiled v4 kernel on the real golden clip must reproduce every
    oracle frame byte-identically — the binding contract."""
    from project_desert_tortoise_tpu.parallel.blocked import (
        BlockPlan, demodulate_blocked)
    from project_desert_tortoise_tpu.utils import wav as W
    iq, t, fs = poes_clip
    plan = BlockPlan(core=8192, head=12288, tail=8192, max_frames=8)
    iq3 = np.tile(iq, 3)
    t3 = W.time_axis(len(iq3), fs, np.float32)
    frames = demodulate_blocked(iq3, t3, fs, POES_TIP, plan=plan,
                                batch_blocks=128, window=512,
                                use_pallas="fused4")
    mine = {round(f.time, 5): f.hex_line() for f in frames}
    complete = [o for o in oracle_frames if len(o[2]) == 104]
    matched = 0
    for ot, oinv, obytes in complete:
        line = mine.get(round(ot, 5))
        body = " ".join(f"{b:02X}" for b in obytes)
        if line is not None and line.endswith(body):
            matched += 1
    assert matched >= len(complete) - 1, (matched, len(complete))


def test_v4_interp1_argos_vs_v1():
    """interp == 1 (ARGOS fast-path shape, 50-tap FIR, after-AGC squelch):
    v4's emitted bits and timestamps must match the v1 kernel's."""
    from project_desert_tortoise_tpu.ops.pallas.fused_kernel import (
        fused_demod_pallas)
    from project_desert_tortoise_tpu.utils.config import ARGOS
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

    b1, t1, e1, _ = fused_demod_pallas(params, pst, gain0, (re, im), tn,
                                       window=256, interpret=True)
    b4, t4, e4, _ = fused_demod_pallas4(params, pst, gain0, (re, im), tn,
                                        window=256, interpret=True)
    agree = total = 0
    for k in range(B):
        va = np.asarray(b1[k])[np.asarray(e1[k])]
        ta = np.asarray(t1[k])[np.asarray(e1[k])]
        vb = np.asarray(b4[k])[np.asarray(e4[k])]
        tb = np.asarray(t4[k])[np.asarray(e4[k])]
        n = min(len(va), len(vb))
        assert abs(len(va) - len(vb)) <= 2
        agree += int(((va[:n] == vb[:n]) & (ta[:n] == tb[:n])).sum())
        total += n
    assert agree / total >= 0.99, (agree, total)
