import numpy as np
import jax.numpy as jnp

from project_desert_tortoise_tpu.ops import fir as F
from tests.conftest import load_tap


def _c_fir_interp(x, taps, interp):
    """Literal model of LowPassFilterInterp's steady-state output:
    y[n] = sum_j h[j] * s[n-N+1+j], s = zero-stuffed x (float64 for clarity)."""
    n_taps = len(taps)
    s = np.zeros(len(x) * interp)
    s[::interp] = x
    s = np.concatenate([np.zeros(n_taps - 1), s, np.zeros(interp)])
    y = np.empty(len(x) * interp)
    for n in range(len(y)):
        y[n] = np.dot(taps, s[n:n + n_taps])
    return y


def test_design_matches_c_within_ulp(taps_dir):
    coef_c = load_tap("fir_coef.f32")
    coef = F.make_lpfir(78, 11000.0, 150000.0, 3, np.float32)
    assert np.abs(coef - coef_c).max() < 6e-8  # 1-2 ulp (libm differences)


def test_design_center_tap_odd_order():
    h = F.make_lpfir(27, 1000.0, 48000.0, 1, np.float64)
    wc = 2 * np.pi * 1000.0 / 48000.0
    # Blackman window at center = 0.42 + 0.5 + 0.08 = 1.0
    assert abs(h[13] - wc / np.pi) < 1e-12


def test_interp_matches_reference_semantics():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(200)
    taps = F.make_lpfir(78, 11000.0, 150000.0, 3, np.float64)
    want = _c_fir_interp(x, taps, 3)
    got = np.asarray(F.fir_interp(jnp.asarray(x, jnp.float32),
                                  taps.astype(np.float32), 3))
    assert np.abs(got - want).max() < 1e-4


def test_plain_fir_matches_reference_semantics():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(300)
    taps = F.make_lpfir(50, 700.0, 32000.0, 1, np.float64)
    want = _c_fir_interp(x, taps, 1)
    got = np.asarray(F.fir_apply(jnp.asarray(x, jnp.float32),
                                 taps.astype(np.float32)))
    assert np.abs(got - want).max() < 1e-5


def test_chunked_equals_whole():
    """Streaming with FIRState must be block-size invariant by construction."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal(500).astype(np.float32)
    taps = F.make_lpfir(78, 11000.0, 150000.0, 3, np.float32)
    whole = np.asarray(F.fir_interp(jnp.asarray(x), taps, 3))

    hist = jnp.zeros(26, jnp.float32)
    parts = []
    for lo, hi in [(0, 123), (123, 130), (130, 499), (499, 500)]:
        blk = jnp.asarray(x[lo:hi])
        parts.append(np.asarray(F.fir_interp(blk, taps, 3, hist)))
        hist = F.fir_history_update(blk, hist, 78, 3)
    got = np.concatenate(parts)
    assert np.abs(got - whole).max() < 1e-6


def test_lpf_stage_matches_c_tap(poes_clip, taps_dir):
    """Feed the C PLL tap through our FIR; must match the C lpf tap."""
    pll_c = load_tap("pll.f32")
    lpf_c = load_tap("lpf.f32")
    taps = F.make_lpfir(78, 11000.0, 150000.0, 3, np.float32)
    got = np.asarray(F.fir_interp(jnp.asarray(pll_c[:30000]), taps, 3))
    assert np.abs(got - lpf_c[:90000]).max() < 2e-5


def test_batched_lanes():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 100)).astype(np.float32)
    taps = F.make_lpfir(78, 11000.0, 150000.0, 3, np.float32)
    got = np.asarray(F.fir_interp(jnp.asarray(x), taps, 3))
    for i in range(4):
        ref = np.asarray(F.fir_interp(jnp.asarray(x[i]), taps, 3))
        assert np.abs(got[i] - ref).max() < 1e-6
