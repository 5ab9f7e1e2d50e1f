import numpy as np
import jax.numpy as jnp

from project_desert_tortoise_tpu.ops import clock as C
from tests.conftest import load_tap


def _c_gardner(x, t, n, state, step, lim, kp, dtype=np.float32):
    """Literal model of GardenerClockRecovery.c (single chunk)."""
    dt = np.dtype(dtype).type
    ns, half_raw, prev = map(dt, state)
    syms, times = [], []
    cap = len(x)
    while np.rint(ns) < n:
        idx = int(np.rint(ns))
        cur = x[idx]
        hi = int(np.rint(half_raw))
        hval = x[hi] if 0 <= hi < cap else dt(0)
        syms.append(cur)
        times.append(t[idx])
        err = dt(kp) * (cur - prev) * hval
        err = dt(min(max(err, -lim), lim))
        ns = dt(ns - err)
        half_raw = dt(ns + dt(step) / 2)
        ns = dt(ns + dt(step))
        prev = cur
    return syms, times, (dt(ns - n), half_raw, prev)


def _smooth_signal(n, rng):
    sym = rng.choice([-1.0, 1.0], size=n // 9 + 4)
    x = np.repeat(sym, 9)[:n]
    return (x + 0.05 * rng.standard_normal(n)).astype(np.float32)


def test_gardner_matches_c_model():
    rng = np.random.default_rng(0)
    n = 2000
    x = _smooth_signal(n, rng)
    t = np.arange(1, n + 1, dtype=np.float32) / 150000
    step = C.gardner_step_size(150000.0, 16640.3)
    want_s, want_t, want_state = _c_gardner(x, t, n, (0, 0, 0), step, 0.1, 3.0)

    st = C.gardner_init()
    st, syms, times, valid, count = C.gardner_scan(
        st, jnp.asarray(x), jnp.asarray(t), n, step, 0.1, 3.0, max_syms=260)
    syms = np.asarray(syms)[np.asarray(valid)]
    times = np.asarray(times)[np.asarray(valid)]
    assert int(count) == len(want_s)
    assert np.abs(syms - np.array(want_s)).max() < 1e-6
    assert np.abs(times - np.array(want_t)).max() < 1e-7
    assert abs(float(st.next_sample) - want_state[0]) < 1e-4
    assert abs(float(st.half_raw) - want_state[1]) < 1e-4


def test_gardner_chunk_carry_matches_c_model():
    """Two chunks with the reference's rollover quirk (half_raw not rolled)."""
    rng = np.random.default_rng(1)
    n = 1800
    x1, x2 = _smooth_signal(n, rng), _smooth_signal(n, rng)
    t1 = np.arange(1, n + 1, dtype=np.float32)
    t2 = np.arange(n + 1, 2 * n + 1, dtype=np.float32)
    step = C.gardner_step_size(150000.0, 16640.3)

    s1, tt1, st_c = _c_gardner(x1, t1, n, (0, 0, 0), step, 0.1, 3.0)
    s2, tt2, _ = _c_gardner(x2, t2, n, st_c, step, 0.1, 3.0)

    st = C.gardner_init()
    got_s, got_t = [], []
    for x, t in [(x1, t1), (x2, t2)]:
        st, syms, times, valid, cnt = C.gardner_scan(
            st, jnp.asarray(x), jnp.asarray(t), n, step, 0.1, 3.0, max_syms=240)
        got_s.append(np.asarray(syms)[np.asarray(valid)])
        got_t.append(np.asarray(times)[np.asarray(valid)])
    want = np.concatenate([s1, s2])
    got = np.concatenate(got_s)
    assert len(got) == len(want)
    assert np.abs(got - want).max() < 1e-6


def test_gardner_stage_matches_c_tap(taps_dir):
    """Feed the C AGC tap through our Gardner; symbols must match the C tap."""
    agc_c = load_tap("agc.f32")
    lpft_c = load_tap("lpf_time.f32")
    sym_c = load_tap("sym.f32")
    step = C.gardner_step_size(150000.0, 16640.3)
    cap = 30000
    st = C.gardner_init()
    out = []
    for lo in range(0, 150000, cap):
        st, syms, times, valid, cnt = C.gardner_scan(
            st, jnp.asarray(agc_c[lo:lo + cap]), jnp.asarray(lpft_c[lo:lo + cap]),
            cap, step, 0.1, 3.0, max_syms=3500)
        out.append(np.asarray(syms)[np.asarray(valid)])
    got = np.concatenate(out)
    want = sym_c[:len(got)]
    assert np.abs(got - want).max() < 1e-5


def test_mm_scan_runs():
    rng = np.random.default_rng(2)
    n = 1000
    x = _smooth_signal(n, rng)
    t = np.arange(n, dtype=np.float32)
    st = (jnp.zeros(()), jnp.zeros(()), jnp.asarray(np.float32(9.0)))
    st, (syms, times, valid, count) = C.mm_scan(
        st, jnp.asarray(x), jnp.asarray(t), n, 150000.0, 16640.3, 3.0, 0.15,
        max_syms=130)
    assert 90 < int(count) <= 130


def test_mm_chain_mode_decodes():
    """Mueller & Muller selectable in the chain (the reference kept it
    compiled but unused — "gardner works better!", POESTIPdemod/main.c:23)."""
    import dataclasses
    from project_desert_tortoise_tpu.models.demodulator import DemodSession
    from project_desert_tortoise_tpu.utils import synth, wav as W
    from project_desert_tortoise_tpu.utils.config import POES_TIP
    mm_cfg = dataclasses.replace(
        POES_TIP, gardner=dataclasses.replace(
            POES_TIP.gardner, algorithm="mm", error_limit=3.0, gain=0.15))
    iq, sent = synth.make_poes_recording(n_frames=8, fs=50000.0, snr_db=28.0)
    t = W.time_axis(len(iq), 50000.0, np.float32)
    res = DemodSession(mm_cfg, 50000.0, quirks=False).run(iq, t)
    sset = {f.tobytes() for f in sent}
    ok = sum(1 for f in res.frames
             if f.complete and np.asarray(f.data, np.uint8).tobytes() in sset)
    assert ok >= 4
