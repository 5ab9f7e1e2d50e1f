import numpy as np
import jax.numpy as jnp

from project_desert_tortoise_tpu.ops import manchester as M
from tests.conftest import load_tap


def _c_sign(x):
    return int(x > 0) - int(x < 0)


def _c_manchester(syms, times, state, thr):
    """Literal model of ManchesterDecode.c:10-101."""
    clockmod, evenodd, cur, prev, prevprev = state
    bits, btimes = [], []
    for i in range(len(syms)):
        prevprev = prev
        prev = cur
        cur = syms[i]
        if (evenodd % 2) != clockmod:
            if _c_sign(prevprev) == _c_sign(prev):
                if abs(prevprev) > thr and abs(prev) > thr:
                    clockmod = evenodd % 2
        if (evenodd % 2) == clockmod:
            if abs(prev) > abs(cur):
                bit = 1 if prev > 0 else 0
            else:
                bit = 0 if cur > 0 else 1
            bits.append(bit)
            btimes.append(times[i])
        evenodd = (evenodd + 1) % 256
    return bits, btimes, (clockmod, evenodd % 2, cur, prev, prevprev)


def test_matches_c_model():
    rng = np.random.default_rng(0)
    n = 3000
    # Manchester-ish symbol stream with occasional phase slips
    bits = rng.integers(0, 2, n // 2 + 2)
    sym = np.empty(2 * len(bits), np.float32)
    sym[0::2] = np.where(bits, 1.0, -1.0)
    sym[1::2] = -sym[0::2]
    sym = sym[:n] + 0.2 * rng.standard_normal(n).astype(np.float32)
    times = np.arange(n, dtype=np.float32)

    want_bits, want_times, _ = _c_manchester(sym, times, (0, 0, 0, 0, 0), 1.0)

    st = M.manchester_init()
    st, gbits, gtimes, emit = M.manchester_scan(
        st, jnp.asarray(sym), jnp.asarray(times),
        jnp.ones(n, bool), 1.0)
    emit = np.asarray(emit)
    gb = np.asarray(gbits)[emit]
    gt = np.asarray(gtimes)[emit]
    assert np.array_equal(gb, want_bits)
    assert np.array_equal(gt, want_times)


def test_chunked_matches_whole():
    rng = np.random.default_rng(1)
    n = 1000
    sym = rng.standard_normal(n).astype(np.float32)
    times = np.arange(n, dtype=np.float32)
    st = M.manchester_init()
    _, b, t, e = M.manchester_scan(st, jnp.asarray(sym), jnp.asarray(times),
                                   jnp.ones(n, bool), 0.75)
    whole = np.asarray(b)[np.asarray(e)]

    st = M.manchester_init()
    parts = []
    for lo, hi in [(0, 333), (333, 334), (334, 1000)]:
        st, b, t, e = M.manchester_scan(
            st, jnp.asarray(sym[lo:hi]), jnp.asarray(times[lo:hi]),
            jnp.ones(hi - lo, bool), 0.75)
        parts.append(np.asarray(b)[np.asarray(e)])
    assert np.array_equal(np.concatenate(parts), whole)


def test_stage_matches_c_tap(taps_dir):
    sym_c = load_tap("sym.f32")
    symt_c = load_tap("sym_time.f32")
    bits_c = load_tap("bits.u8", np.uint8) - ord("0")
    n = 20000
    st = M.manchester_init()
    st, b, t, e = M.manchester_scan(
        st, jnp.asarray(sym_c[:n]), jnp.asarray(symt_c[:n]),
        jnp.ones(n, bool), 1.0)
    got = np.asarray(b)[np.asarray(e)]
    assert np.array_equal(got, bits_c[:len(got)])


def test_compress_stream():
    vals = jnp.asarray(np.array([1, 2, 3, 4, 5], np.float32))
    mask = jnp.asarray(np.array([1, 0, 1, 1, 0], bool))
    v, t, c = M.compress_stream(vals, vals, mask, 4)
    assert int(c) == 3
    assert np.array_equal(np.asarray(v)[:3], [1, 3, 4])


def test_compress_sorted_matches_scatter():
    rng = np.random.default_rng(7)
    vals = jnp.asarray(rng.random((3, 256)), jnp.float32)
    tms = vals + 1.0
    mask = jnp.asarray(rng.random((3, 256)) < 0.3)
    for cap in (64, 100, 300):
        v0, t0, c0 = M.compress_stream(vals, tms, mask, cap)
        v1, t1, c1 = M.compress_sorted(vals, tms, mask, cap)
        assert np.array_equal(np.asarray(c0), np.asarray(c1))
        assert np.allclose(np.asarray(v0), np.asarray(v1))
        assert np.allclose(np.asarray(t0), np.asarray(t1))


def test_compress_spaced_matches_scatter():
    rng = np.random.default_rng(8)
    n, p = 512, 4
    mask_np = np.zeros((2, n), bool)
    for b in range(2):
        i = 0
        while i < n:
            i += rng.integers(6, 14)
            if i < n:
                mask_np[b, i] = True
    vals = jnp.asarray(rng.integers(0, 2, (2, n)), jnp.uint8)
    tms = jnp.asarray(rng.random((2, n)), jnp.float32)
    mask = jnp.asarray(mask_np)
    cap = n // 4 + 8
    v0, t0, c0 = M.compress_stream(vals, tms, mask, cap)
    v1, t1, c1 = M.compress_spaced(vals, tms, mask, cap, min_spacing=p)
    assert np.array_equal(np.asarray(c0), np.asarray(c1))
    assert np.array_equal(np.asarray(v0), np.asarray(v1))
    assert np.allclose(np.asarray(t0), np.asarray(t1))
