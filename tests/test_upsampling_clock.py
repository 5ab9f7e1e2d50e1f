"""MATLAB upsampling clock-recovery variants (VERDICT r4 item 7).

Twin of standalone_matlab/Functionized/UpsamplingGardenerClockRecovery2.m
and UpsamplingMMClockRecovery.m: value-interpolating upsample + TED on
the dense stream, selectable via GardnerConfig.algorithm on the exact
quirks=False path."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from project_desert_tortoise_tpu.ops import resample
from project_desert_tortoise_tpu.utils.config import (FIRConfig, POES_TIP)


def _upsampling_cfg(algorithm, level, kind="cubic", gain=1.0, limit=2.0):
    # MATLAB preprocesses at the input rate (no zero-stuff FIR fan-out):
    # plain LPF (interp=1), then the clock loop upsamples values by L
    return dataclasses.replace(
        POES_TIP,
        fir=FIRConfig(cutoff_hz=11000.0, base_order=26,
                      target_rate_hz=None, interp=1),
        gardner=dataclasses.replace(
            POES_TIP.gardner, algorithm=algorithm, upsample_level=level,
            upsample_kind=kind, gain=gain, error_limit=limit))


def test_upsample_linear_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=50).astype(np.float32)
    L = 4
    y = np.asarray(resample.upsample(jnp.asarray(x), L, "linear"))
    pos = np.arange(50 * L) / L
    want = np.interp(np.minimum(pos, 49.0), np.arange(50), x)
    np.testing.assert_allclose(y, want, atol=1e-6)


def test_upsample_cubic_nodes_and_quadratics():
    rng = np.random.default_rng(1)
    x = rng.normal(size=64).astype(np.float64)
    L = 5
    y = np.asarray(resample.upsample(jnp.asarray(x), L, "cubic"))
    # exact at the input samples (f32 on the CPU test backend)
    np.testing.assert_allclose(y[::L], x, atol=1e-6)
    # Keys a=-1/2 cubic convolution reproduces quadratics exactly
    # (interior points, where no edge clamp applies)
    j = np.arange(64, dtype=np.float64)
    q = 0.3 * j * j - 2.0 * j + 1.25
    yq = np.asarray(resample.upsample(jnp.asarray(q), L, "cubic"))
    pos = np.arange(64 * L) / L
    interior = (pos >= 1.0) & (pos <= 62.0)
    np.testing.assert_allclose(
        yq[interior], 0.3 * pos[interior] ** 2 - 2.0 * pos[interior] + 1.25,
        rtol=1e-4, atol=1e-3)


def test_uniform_times():
    t = jnp.asarray(np.array([1.0, 1.5, 2.0], np.float32))
    out = np.asarray(resample.uniform_times(t, 2, 0.25))
    np.testing.assert_allclose(out, [1.0, 1.25, 1.5, 1.75, 2.0, 2.25])


@pytest.mark.parametrize("algorithm", ["upsampling_gardner",
                                       "upsampling_mm"])
def test_upsampling_chain_decodes(algorithm):
    from project_desert_tortoise_tpu.models.demodulator import DemodSession
    from project_desert_tortoise_tpu.utils import synth, wav as W

    cfg = _upsampling_cfg(algorithm, level=5)
    iq, sent = synth.make_poes_recording(n_frames=8, fs=50000.0, snr_db=28.0)
    t = W.time_axis(len(iq), 50000.0, np.float32)
    res = DemodSession(cfg, 50000.0, quirks=False).run(iq, t)
    sset = {f.tobytes() for f in sent}
    ok = sum(1 for f in res.frames
             if f.complete and np.asarray(f.data, np.uint8).tobytes() in sset)
    assert ok >= 4, (algorithm, len(res.frames), ok)


@pytest.mark.parametrize("algorithm", ["upsampling_gardner",
                                       "upsampling_mm"])
def test_upsampling_chunk_size_invariance(algorithm):
    """The chunked margin protocol + split (int, frac) timing pointers
    must make the whole-stream MATLAB formulation BIT-EXACT chunk-size
    invariant: a float pointer re-based per chunk rounds at different
    magnitudes and drifts (observed even in f64), which is why the
    upsampling scans carry exact integer parts.  Norm is pinned — the
    first-chunk StaticGain probe is reference behavior and chunk-size
    dependent by definition."""
    from project_desert_tortoise_tpu.models.demodulator import DemodSession
    from project_desert_tortoise_tpu.utils import synth, wav as W

    cfg = _upsampling_cfg(algorithm, level=4)
    iq, _ = synth.make_poes_recording(n_frames=6, fs=50000.0, snr_db=30.0)
    t = W.time_axis(len(iq), 50000.0, np.float32)
    lines = []
    for chunk in (7000, 11000):
        res = DemodSession(cfg, 50000.0, chunk_size=chunk, quirks=False,
                           norm_factor=17.58).run(iq, t)
        lines.append([f.hex_line() for f in res.frames])
    assert lines[0] == lines[1]
    assert len(lines[0]) >= 4


def test_quirks_mode_rejects_upsampling():
    from project_desert_tortoise_tpu import chain as chain_lib
    cfg = _upsampling_cfg("upsampling_gardner", level=4)
    with pytest.raises(ValueError):
        chain_lib.make_params(cfg, 50000.0, quirks=True)
