"""Device-mesh sharding for multi-chip / multi-host demodulation.

Axes (SURVEY.md section 2.4):
- ``ch``  — channel parallelism: independent recordings/satellites
            (embarrassingly parallel, the reference's "4 separate apps" axis);
- ``blk`` — sequence parallelism over time blocks: the recording is sharded
            contiguously along time; each shard exchanges halo samples with
            its ring neighbors via ``lax.ppermute`` over ICI, then runs the
            same block-parallel demod locally (warm-up head from the left
            neighbor, frame-completion tail from the right neighbor).

Multi-host: the same code runs under ``jax.distributed.initialize`` with a
global mesh; ppermute rides ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from project_desert_tortoise_tpu import chain as chain_lib
from project_desert_tortoise_tpu.parallel import blocked as blocked_lib


def make_mesh(n_channel: int, n_block: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_channel * n_block:
        raise ValueError(f"need {n_channel * n_block} devices, "
                         f"have {len(devices)}")
    devs = np.asarray(devices[: n_channel * n_block]).reshape(
        n_channel, n_block)
    return Mesh(devs, ("ch", "blk"))


def _halo_exchange(x, head: int, tail: int, axis_name: str):
    """Build [left-halo | local | right-halo] along the last axis using ring
    ppermute.  Edge shards receive zeros (stream boundary)."""
    n_shards = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # my tail -> right neighbor's head halo
    right = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    left = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    from_left = jax.lax.ppermute(x[..., -head:], axis_name, right)
    from_right = jax.lax.ppermute(x[..., :tail], axis_name, left)
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n_shards - 1,
                           jnp.zeros_like(from_right), from_right)
    return jnp.concatenate([from_left, x, from_right], axis=-1)


def sharded_demod_step(params: chain_lib.ChainParams, plan, framer_cfg,
                       mesh: Mesh, fs: float, use_pallas=False):
    """Returns a jitted function: (re, im, t_next, norm) sharded over
    (ch, blk) -> per-shard FrameBatch pytree.

    re/im/t_next: (C, N) global arrays, sharded P('ch', 'blk'); each shard's
    local slice length must be a multiple of plan.core.
    """
    from jax.experimental.shard_map import shard_map

    head, tail, core = plan.head, plan.tail, plan.core
    # step_size = Fs*interp/baud  =>  bit rate = baud/2
    bit_rate = fs * params.interp / params.step_size / 2.0
    total = plan.total

    def local_demod(re, im, tn, norm):
        # re/im/tn: (C_loc, N_loc) local contiguous slices
        re_h = _halo_exchange(re, head, tail, "blk")
        im_h = _halo_exchange(im, head, tail, "blk")
        tn_h = _halo_exchange(tn, head, tail, "blk")

        c_loc, n_loc = re.shape
        b_loc = n_loc // core
        # cut overlapping blocks: block j covers [j*core, j*core + total)
        def cut(x):
            blocks = [jax.lax.dynamic_slice_in_dim(x, j * core, total, axis=-1)
                      for j in range(b_loc)]
            return jnp.stack(blocks, axis=1).reshape(c_loc * b_loc, total)

        bre, bim, btn = cut(re_h), cut(im_h), cut(tn_h)
        fest = blocked_lib.coarse_carrier_est(bre, bim, fs, bit_rate)
        bits_c, times_c, n_bits, avgp = blocked_lib.demod_blocks(
            params, total, bre, bim, fs, btn, fest, norm[0, 0],
            4096, use_pallas)
        fb = blocked_lib.extract_frames(framer_cfg, plan.max_frames,
                                        bits_c, times_c, n_bits)
        # reshape frame outputs back to (C_loc, B_loc, ...)
        def rs(a):
            return a.reshape((c_loc, b_loc) + a.shape[1:])
        return jax.tree.map(rs, fb)

    fn = shard_map(
        local_demod, mesh=mesh,
        in_specs=(P("ch", "blk"), P("ch", "blk"), P("ch", "blk"), P(None, None)),
        out_specs=P("ch", "blk"),
        check_rep=False,
    )
    return jax.jit(fn)


def demodulate_sharded(iq, t, fs, mode_cfg, mesh: Mesh,
                       norm_factor: Optional[float] = None,
                       plan=None, use_pallas=False):
    """Multi-channel, multi-shard demodulation of (C, N) recordings.

    iq: (C, N) complex, t: (N,) time axis (shared across channels).
    Returns a list of per-channel frame lists.
    """
    from project_desert_tortoise_tpu.ops import agc as agc_ops
    from project_desert_tortoise_tpu.ops.framer import Frame

    dt = np.dtype(np.float32) if mode_cfg.np_dtype().itemsize == 4 \
        else mode_cfg.np_dtype()
    params = chain_lib.make_params(mode_cfg, fs, quirks=False)
    C, N = iq.shape
    n_blk = mesh.shape["blk"]
    plan = plan or blocked_lib.default_plan(mode_cfg, fs)
    # shard-local length must be a multiple of plan.core
    loc = -(-N // n_blk)
    loc = -(-loc // plan.core) * plan.core
    Np = loc * n_blk
    re = np.zeros((C, Np), dt)
    im = np.zeros((C, Np), dt)
    re[:, :N] = np.real(iq)
    im[:, :N] = np.imag(iq)
    ts = dt.type(1.0) / dt.type(fs)
    t_ext = np.concatenate([np.asarray(t, dt), [dt.type(t[-1] + ts)]])
    tn = np.zeros((C, Np), dt)
    if params.interp > 1:
        tn[:, :N] = t_ext[1:N + 1]
    else:
        tn[:, :N] = t_ext[:N]
    if norm_factor is None:
        norm_factor = agc_ops.static_gain(
            iq[0, :min(N, mode_cfg.chunk_size)], mode_cfg.static_gain_level, dt)
    norm = np.full((1, 1), norm_factor, dt)

    sh = NamedSharding(mesh, P("ch", "blk"))
    step = sharded_demod_step(params, plan, mode_cfg.framer, mesh, float(fs),
                              use_pallas)
    fb = step(jax.device_put(re, sh), jax.device_put(im, sh),
              jax.device_put(tn, sh), jax.device_put(norm, NamedSharding(mesh, P(None, None))))

    counts = np.asarray(fb.count)       # (C, n_blk, B_loc)? -> (C, blocks)
    f_times = np.asarray(fb.times)
    f_inv = np.asarray(fb.inverted)
    f_data = np.asarray(fb.data)
    counts = counts.reshape(C, -1)
    nb_total = counts.shape[1]
    f_times = f_times.reshape(C, nb_total, -1)
    f_inv = f_inv.reshape(C, nb_total, -1)
    f_data = f_data.reshape(C, nb_total, f_times.shape[2], -1)

    results = []
    for c in range(C):
        frames = []
        for b in range(nb_total):
            lo_i = b * plan.core
            hi_i = min((b + 1) * plan.core, N)
            if lo_i >= N:
                continue
            lo_t = float(t_ext[lo_i])
            hi_t = float(t_ext[hi_i]) if hi_i < len(t_ext) else float("inf")
            for j in range(int(counts[c, b])):
                tt = float(f_times[c, b, j])
                if lo_t <= tt < hi_t:
                    frames.append(Frame(tt, bool(f_inv[c, b, j]),
                                        f_data[c, b, j].copy(), True))
        frames.sort(key=lambda f: f.time)
        results.append(frames)
    return results
