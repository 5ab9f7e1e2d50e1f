"""Lossless bit-packing of int16 PCM planes for host->device staging.

The whole-file E2E wall on a container-tunneled TPU is ~96% host->device
upload (BENCH_r04); the staged int16 planes are the reference wav's PCM
samples (``common/wave.c:117`` — 16-bit PCM), whose real amplitude range
rarely fills 16 bits (the golden clip peaks at 13 signed bits).  Packing
each sample to the file's true significant width ``w`` cuts upload bytes
by ``16/w`` with EXACT reconstruction — the demod output is bit-identical
because the unpacked int16 values are bit-identical.

Layout: groups of 32 samples -> ``w`` little-endian uint32 words per group
(32*w bits, no inter-group spill).  Sample ``i`` of a group occupies bits
``[i*w, (i+1)*w)`` of the group's word block; fields may straddle one word
boundary.  Both directions are 32 static shift/mask ops vectorized over
all groups — no per-sample loops, no dynamic indexing, so the device-side
unpack compiles to a handful of fused elementwise XLA ops.

``pack_width`` scans the data once for the minimal signed width; width 16
means packing cannot help (the transport ships int16 as-is).
"""

from __future__ import annotations

import numpy as np

GROUP = 32  # samples per packed group (one uint32 word per width-bit)


def pack_width(*planes) -> int:
    """Minimal signed bit width covering every sample of every plane."""
    m = 0
    for x in planes:
        if len(x):
            m = max(m, int(np.max(np.abs(np.asarray(x, np.int32)))))
    # value range [-2^(w-1), 2^(w-1)-1]; |x| <= 2^(w-1) needs w bits
    # (np.abs(int16 -32768) is handled in int32 above)
    w = int(m).bit_length() + 1
    return min(max(w, 2), 16)


def pack(x: np.ndarray, w: int) -> np.ndarray:
    """Pack int16/int32 samples (n,) -> (ceil(n/32), w) uint32.

    Caller guarantees every value fits ``w`` signed bits (use
    :func:`pack_width`).  The trailing partial group is zero-padded.
    """
    n = len(x)
    ng = -(-n // GROUP)
    v = np.zeros(ng * GROUP, np.uint32)
    # two's-complement field: offset to unsigned [0, 2^w)
    v[:n] = (np.asarray(x, np.int32) + (1 << (w - 1))).astype(np.uint32)
    v = v.reshape(ng, GROUP)
    out = np.zeros((ng, w), np.uint32)
    for i in range(GROUP):
        off = i * w
        j0, sh = off >> 5, off & 31
        out[:, j0] |= v[:, i] << np.uint32(sh)
        if sh + w > 32:
            out[:, j0 + 1] |= v[:, i] >> np.uint32(32 - sh)
    return out


def unpack_jax(packed, w: int, n: int):
    """Device-side exact inverse of :func:`pack`.

    packed: (ng, w) uint32 on device; returns (n,) int32 samples.
    Static ``w``/``n`` -> 32 unrolled shift/mask column extractions that
    XLA fuses into the downstream int->float conversion.
    """
    import jax.numpy as jnp

    mask = jnp.uint32((1 << w) - 1)
    cols = []
    for i in range(GROUP):
        off = i * w
        j0, sh = off >> 5, off & 31
        lo = packed[:, j0] >> np.uint32(sh)
        if sh + w > 32:
            lo = lo | (packed[:, j0 + 1] << np.uint32(32 - sh))
        cols.append(lo & mask)
    vals = jnp.stack(cols, axis=1).reshape(-1)[:n]
    return vals.astype(jnp.int32) - (1 << (w - 1))
