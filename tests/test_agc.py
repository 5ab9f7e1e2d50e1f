import numpy as np
import jax.numpy as jnp

from project_desert_tortoise_tpu.ops import agc as A
from tests.conftest import load_tap


def _c_agc(x, initial, attack, decay, dtype=np.float32):
    """Literal float model of AGC.c:78-132."""
    dt = np.dtype(dtype).type
    gain = dt(initial)
    y = np.empty_like(x)
    for i, xi in enumerate(x):
        y[i] = dt(xi * gain)
        error = dt(abs(y[i]) - dt(1.0))
        rate = dt(attack) if abs(error) > gain else dt(decay)
        gain = dt(gain - error * rate)
        if gain < 0.0:
            gain = dt(10e-5)
        if gain > 5000.0:
            gain = dt(5000.0)
    return y, gain


def test_agc_matches_c_model():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(2000) * 0.05).astype(np.float32)
    atk, dcy = 79.5775 * 2 * np.pi / 150000, 159.1549 * 2 * np.pi / 150000
    want, want_gain = _c_agc(x, 17.5, atk, dcy)
    st, got = A.agc_scan(A.agc_init(17.5), jnp.asarray(x), atk, dcy)
    got = np.asarray(got)
    assert np.abs(got - want).max() < 1e-5
    assert abs(float(st.gain) - want_gain) < 1e-4


def test_agc_stage_matches_c_tap(taps_dir):
    lpf_c = load_tap("lpf.f32")
    agc_c = load_tap("agc.f32")
    nf = load_tap("normfactor.f32")[0]
    atk = 79.5775 * 2 * np.pi / 150000.0
    dcy = 159.1549 * 2 * np.pi / 150000.0
    n = 90000
    _, got = A.agc_scan(A.agc_init(float(nf)), jnp.asarray(lpf_c[:n]), atk, dcy)
    assert np.abs(np.asarray(got) - agc_c[:n]).max() < 2e-4


def test_agc_chunk_invariance():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(1000) * 0.1).astype(np.float32)
    atk, dcy = 1e-3, 2e-3
    _, whole = A.agc_scan(A.agc_init(5.0), jnp.asarray(x), atk, dcy)
    st = A.agc_init(5.0)
    parts = []
    for lo, hi in [(0, 317), (317, 700), (700, 1000)]:
        st, y = A.agc_scan(st, jnp.asarray(x[lo:hi]), atk, dcy)
        parts.append(np.asarray(y))
    assert np.array_equal(np.concatenate(parts), np.asarray(whole))


def test_static_gain_matches_c_tap(poes_clip, taps_dir):
    iq, _, _ = poes_clip
    nf_c = load_tap("normfactor.f32")[0]
    nf = A.static_gain(iq[:10000], 1.0, np.float32)
    assert abs(nf - nf_c) < 4e-6 * abs(nf_c)  # within ulps (libm cabsf)


def test_squelch():
    x = jnp.asarray(np.array([1.0, 2.0, 3.0], np.float32))
    lock = jnp.asarray(np.array([0.2, 0.05, 0.3], np.float32))
    got = np.asarray(A.squelch(x, lock, 0.1))
    assert np.array_equal(got, [1.0, 0.0, 3.0])


def test_complex_agc_runs():
    rng = np.random.default_rng(2)
    z = (rng.standard_normal(100) + 1j * rng.standard_normal(100)).astype(np.complex64)
    gain, y = A.agc_complex_scan(jnp.asarray(0.1, jnp.float32), jnp.asarray(z), 0.00025)
    assert np.asarray(y).shape == (100,)


def test_find_signal_amplitude():
    x = jnp.ones(1000, jnp.float32) * 2.0
    got = float(A.find_signal_amplitude(jnp.asarray(0.0, jnp.float32), x, 0.01))
    assert abs(got - 2.0) < 1e-3
