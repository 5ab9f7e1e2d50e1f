"""Pallas PLL kernel vs the lax.scan implementation (interpret mode on CPU;
compiled parity is exercised on real TPU by bench/tuning runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from project_desert_tortoise_tpu.ops import pll as P
from project_desert_tortoise_tpu.ops.pallas.pll_kernel import pll_scan_pallas
from project_desert_tortoise_tpu.utils.config import POES_TIP


def test_matches_scan_interpret():
    params = P.make_params(POES_TIP.pll, 50000.0)
    rng = np.random.default_rng(0)
    B, L = 128, 4096
    re = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.01)
    im = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.01)
    st = P.init_state(params, jnp.float32, (B,))
    st1, out1, lock1 = P.pll_scan(params, st, (re, im))
    st2, out2, lock2 = pll_scan_pallas(params, st, (re, im), window=1024,
                                       interpret=True)
    assert float(jnp.abs(out1 - out2).max()) < 1e-6
    assert float(jnp.abs(lock1 - lock2).max()) < 1e-6
    assert float(jnp.abs(st1.phase - st2.phase).max()) < 1e-6
    assert bool(jnp.all(st1.locked == st2.locked))


def test_warm_state_roundtrip():
    params = P.make_params(POES_TIP.pll, 50000.0)
    rng = np.random.default_rng(1)
    B, L = 128, 2048
    re = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    st = P.init_state(params, jnp.float32, (B,))
    st = st._replace(freq=jnp.full((B,), 0.1, jnp.float32),
                     locked=jnp.ones((B,), bool))
    st1, out1, _ = P.pll_scan(params, st, (re, im))
    st2, out2, _ = pll_scan_pallas(params, st, (re, im), window=2048,
                                   interpret=True)
    assert float(jnp.abs(out1 - out2).max()) < 1e-6
    assert float(jnp.abs(st1.freq - st2.freq).max()) < 1e-6
