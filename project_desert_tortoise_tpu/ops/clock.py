"""Symbol-timing recovery: Gardner (primary) and Mueller & Muller (alt).

Twin of ``common/GardenerClockRecovery.c`` /  ``common/MMClockRecovery.c``.

The C version is a data-dependent while loop that strides a fractional sample
pointer through the block (`nextSample += Fs/baud - err`), reading the on-time
sample and the mid-bit sample.  Here it is a fixed-length masked `lax.scan`
over symbol slots (static capacity = block_len/step + slack), so it jits with
static shapes and vmaps across block lanes for the fast path.

Reference quirks reproduced deliberately (see SURVEY.md section 1):
- the fractional pointer rolls over between chunks *without* adjusting the
  pending mid-bit index (``GardenerClockRecovery.c:111``), so the first
  mid-bit read of a chunk lands near the end of the buffer *image* — the
  caller passes the persistent buffer image (previous chunk's tail surviving
  a partial final chunk), and out-of-image reads yield 0.0 exactly like the
  reference's never-written heap pages;
- `rint` rounds half-to-even (C default rounding mode);
- the returned count is the reference's `count` (not count-1;
  ``GardenerClockRecovery.c:112-113``).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from project_desert_tortoise_tpu.ops.fastmath import sign


class GardnerState(NamedTuple):
    next_sample: jnp.ndarray   # fractional on-time pointer (chunk-relative)
    half_raw: jnp.ndarray      # pending mid-bit pointer (NOT rolled over)
    prev_bit: jnp.ndarray


def gardner_init(dtype=jnp.float32, batch_shape=()) -> GardnerState:
    z = jnp.zeros(batch_shape, jnp.dtype(dtype))
    return GardnerState(next_sample=z, half_raw=z, prev_bit=z)


def gardner_step_size(fs: float, baud: float, dtype=np.float32):
    """stepSize = Fs/baud computed in double then stored in stream dtype,
    as the C mixed-precision expression does (GardenerClockRecovery.c:19)."""
    return float(np.dtype(dtype).type(np.float64(fs) / np.float64(baud)))


def gardner_scan(state: GardnerState, x, t, n, step_size: float,
                 err_limit: float, kp: float, max_syms: int, unroll: int = 4):
    """Recover up to `max_syms` symbols from block `x` (buffer image).

    x, t: (..., cap) buffer images; n: valid length (scalar or (...,)).
    Returns (state, symbols, times, valid_mask, count).
    """
    dt = x.dtype
    cap = x.shape[-1]
    c = lambda v: jnp.asarray(v, dt)
    n = jnp.asarray(n)

    def take(arr, i):
        # batched lane-wise gather along the last axis
        return jnp.take_along_axis(arr, i[..., None], axis=-1)[..., 0]

    def step(carry, _):
        st, count = carry
        idx = jnp.round(st.next_sample)
        active = idx < n
        ii = jnp.clip(idx.astype(jnp.int32), 0, cap - 1)
        cur = take(x, ii)
        hidx = jnp.round(st.half_raw)
        hi = hidx.astype(jnp.int32)
        in_img = (hidx >= 0) & (hidx < cap)
        hval = jnp.where(in_img, take(x, jnp.clip(hi, 0, cap - 1)),
                         jnp.zeros((), dt))
        tval = take(t, ii)

        err = c(kp) * (cur - st.prev_bit) * hval
        err = jnp.clip(err, c(-err_limit), c(err_limit))
        ns = st.next_sample - err
        half_new = ns + c(step_size) / 2.0
        ns = ns + c(step_size)

        new = GardnerState(
            next_sample=jnp.where(active, ns, st.next_sample),
            half_raw=jnp.where(active, half_new, st.half_raw),
            prev_bit=jnp.where(active, cur, st.prev_bit),
        )
        return (new, count + active.astype(jnp.int32)), (cur, tval, active)

    count0 = jnp.zeros(x.shape[:-1], jnp.int32)
    (state, count), (syms, times, valid) = jax.lax.scan(
        step, (state, count0), None, length=max_syms, unroll=unroll)
    syms = jnp.moveaxis(syms, 0, -1)
    times = jnp.moveaxis(times, 0, -1)
    valid = jnp.moveaxis(valid, 0, -1)
    # chunk rollover (GardenerClockRecovery.c:111): half_raw intentionally kept
    state = state._replace(next_sample=state.next_sample - n.astype(dt))
    return state, syms, times, valid, count


def mm_scan(state, x, t, n, fs: float, baud: float, step_range: float,
            kp: float, max_syms: int, unroll: int = 4):
    """Mueller & Muller TED with adaptive step (``common/MMClockRecovery.c``).

    Kept for capability parity ("gardner works better!",
    POESTIPdemod/main.c:23).  state: (next_sample, prev_bit, step_size).
    """
    dt = x.dtype
    cap = x.shape[-1]
    c = lambda v: jnp.asarray(v, dt)
    n = jnp.asarray(n)
    smin = c(fs / (baud + step_range))
    smax = c(fs / (baud - step_range))

    def take(arr, i):
        return jnp.take_along_axis(arr, i[..., None], axis=-1)[..., 0]

    def step(carry, _):
        (ns, prev, ss), count = carry
        idx = jnp.round(ns)
        active = idx < n
        ii = jnp.clip(idx.astype(jnp.int32), 0, cap - 1)
        cur = take(x, ii)
        tval = take(t, ii)
        err = sign(prev) * cur - sign(cur) * prev
        ss_new = jnp.clip(ss + c(kp) * err, smin, smax)
        ns_new = ns + ss_new
        carry_new = (jnp.where(active, ns_new, ns),
                     jnp.where(active, cur, prev),
                     jnp.where(active, ss_new, ss))
        return (carry_new, count + active.astype(jnp.int32)), (cur, tval, active)

    count0 = jnp.zeros(x.shape[:-1], jnp.int32)
    (st, count), (syms, times, valid) = jax.lax.scan(
        step, (state, count0), None, length=max_syms, unroll=unroll)
    st = (st[0] - n.astype(dt), st[1], st[2])
    return st, (jnp.moveaxis(syms, 0, -1), jnp.moveaxis(times, 0, -1),
                jnp.moveaxis(valid, 0, -1), count)
