"""Fused PLL+FIR+AGC Pallas kernel vs the XLA op path (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from project_desert_tortoise_tpu import chain as chain_lib
from project_desert_tortoise_tpu.ops import agc as A, fir as F, pll as P
from project_desert_tortoise_tpu.ops.pallas.chain_kernel import (
    pll_fir_agc_pallas)
from project_desert_tortoise_tpu.utils.config import ARGOS, POES_TIP


def _compare(mode_cfg, fs, B=128, L=2048, window=1024):
    params = chain_lib.make_params(mode_cfg, fs, quirks=False)
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.01)
    im = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.01)
    pst = P.init_state(params.pll, jnp.float32, (B,))
    gain0 = jnp.full((B,), 17.58, jnp.float32)

    pst1, soft, lock1 = P.pll_scan(params.pll, pst, (re, im))
    if params.squelch_position == "after_pll":
        soft = A.squelch(soft, lock1, params.squelch_threshold)
    taps = np.asarray(params.taps, np.float32)
    y = F.fir_interp(soft, taps, params.interp)
    ast, y1 = A.agc_scan(A.AGCState(gain=gain0), y, params.agc_attack,
                         params.agc_decay)

    pst2, gain2, y2, lock2 = pll_fir_agc_pallas(params, pst, gain0, (re, im),
                                                window=window, interpret=True)
    assert float(jnp.abs(y1 - y2).max()) < 1e-5
    assert float(jnp.abs(lock1 - lock2).max()) < 1e-6
    assert float(jnp.abs(ast.gain - gain2).max()) < 1e-4
    assert float(jnp.abs(pst1.phase - pst2.phase).max()) < 1e-6


def test_poes_interp3():
    _compare(POES_TIP, 50000.0)


def test_poes_realtime_squelch():
    from project_desert_tortoise_tpu.utils.config import POES_TIP_REALTIME
    _compare(POES_TIP_REALTIME, 48000.0, L=1024, window=512)


def test_argos_interp1():
    # float32 fast-path variant of the ARGOS chain (interp == 1, 50 taps)
    _compare(ARGOS, 32000.0, L=1024, window=512)
