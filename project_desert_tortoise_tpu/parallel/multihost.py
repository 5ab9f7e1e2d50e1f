"""Multi-host orchestration (the N-host scaling configuration).

The demod workload has no cross-host model state — hosts cooperate only
through the ``blk`` halo ring (ICI in-slice, DCN across slices) — so
multi-host setup is just `jax.distributed.initialize` plus a global mesh.

Typical driver on every host of a pod slice:

    from project_desert_tortoise_tpu.parallel import multihost as MH
    MH.init()                       # env-driven (TPU pods autoconfigure)
    mesh = MH.global_mesh(n_channel=2)
    # feed each host its local shard of the recording(s):
    local = MH.local_time_slice(n_total_samples, mesh)
    ...
    results = demodulate_sharded(iq, t, fs, mode, mesh)

Process-0 gathers frames (frame outputs are tiny) via
`multihost_utils.process_allgather` when a global view is needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None):
    """`jax.distributed.initialize` wrapper: on TPU pods all arguments are
    discovered from the environment; pass them explicitly elsewhere."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(n_channel: int = 1, devices=None) -> Mesh:
    """(ch, blk) mesh over all global devices; blk spans hosts so the halo
    ring crosses DCN exactly once per host boundary."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % n_channel:
        raise ValueError(f"{n} devices not divisible by {n_channel} channels")
    arr = np.asarray(devices).reshape(n_channel, n // n_channel)
    return Mesh(arr, ("ch", "blk"))


def local_time_slice(n_samples: int, mesh: Mesh) -> Tuple[int, int]:
    """[lo, hi) sample range this process should load from the recording
    (each host only reads its own slice plus nothing — halos travel over
    the interconnect, not the filesystem).

    Requires this process's mesh columns to be contiguous (the natural
    layout from :func:`global_mesh`); raises otherwise rather than silently
    returning a range that spans other hosts' data."""
    n_blk = mesh.shape["blk"]
    per = -(-n_samples // n_blk)
    local_blk = [d for d in mesh.devices.flatten()
                 if d.process_index == jax.process_index()]
    cols = sorted({int(np.where(mesh.devices == d)[1][0]) for d in local_blk})
    if cols != list(range(cols[0], cols[-1] + 1)):
        raise ValueError(
            f"process {jax.process_index()} owns non-contiguous mesh "
            f"columns {cols}; local_time_slice needs a contiguous blk "
            f"layout (use multihost.global_mesh)")
    lo = cols[0] * per
    hi = min((cols[-1] + 1) * per, n_samples)
    return lo, hi


def demodulate_multihost(iq, t, fs, mode_cfg, mesh: Mesh,
                         norm_factor=None, plan=None, use_pallas=False):
    """Multi-process twin of `sharding.demodulate_sharded`.

    Every process calls this with the same (C, N) recording view (a file
    mmap is fine — only the process-local time slice is materialized onto
    devices, via `jax.make_array_from_process_local_data`).  Channel rows
    must not be split across processes.  Returns the per-channel frame
    lists, identical on every process (frames are all-gathered).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from project_desert_tortoise_tpu.ops.framer import Frame
    from project_desert_tortoise_tpu.parallel import sharding as SH

    C = iq.shape[0]
    params, plan, re, im, tn, bounds, norm = SH.stage_global(
        iq, t, fs, mode_cfg, mesh, plan, norm_factor)
    Np = re.shape[1]
    lo, hi = local_time_slice(Np, mesh)
    n_blk = mesh.shape["blk"]
    nb_total = bounds.shape[1]
    b_per = nb_total // n_blk
    col_lo = lo // (Np // n_blk)
    col_hi = hi // (Np // n_blk)

    sh = NamedSharding(mesh, P("ch", "blk"))
    sh_b = NamedSharding(mesh, P("ch", "blk", None))
    sh_r = NamedSharding(mesh, P(None, None))
    mk = jax.make_array_from_process_local_data
    g_re = mk(sh, np.ascontiguousarray(re[:, lo:hi]), re.shape)
    g_im = mk(sh, np.ascontiguousarray(im[:, lo:hi]), im.shape)
    g_tn = mk(sh, np.ascontiguousarray(tn[:, lo:hi]), tn.shape)
    g_bd = mk(sh_b,
              np.ascontiguousarray(bounds[:, col_lo * b_per:col_hi * b_per]),
              bounds.shape)
    g_nm = mk(sh_r, norm, norm.shape)

    step = SH.sharded_demod_step(params, plan, mode_cfg.framer, mesh,
                                 float(fs), use_pallas)
    times, inv, data, n = step(g_re, g_im, g_tn, g_bd, g_nm)

    # collect this process's shards, keyed by device so the four outputs line up
    def by_dev(arr):
        return {s.device: np.asarray(s.data) for s in arr.addressable_shards}
    d_t, d_i, d_d, d_n = by_dev(times), by_dev(inv), by_dev(data), by_dev(n)

    tagged = []            # (channel, Frame) pairs from local shards
    for dev, tt in d_t.items():
        ii, dd, nn = d_i[dev], d_d[dev], d_n[dev]
        for c in range(tt.shape[0]):
            for j in range(int(nn[c, 0])):
                tagged.append((c, Frame(float(tt[c, j]), bool(ii[c, j]),
                                        dd[c, j].copy(), True)))
    all_tagged = gather_frames(tagged)
    results = [[] for _ in range(C)]
    for c, f in all_tagged:
        results[c].append(f)
    for frames in results:
        frames.sort(key=lambda f: f.time)
    return results


def gather_frames(frames):
    """All-gather per-host frame lists to process 0 (frames are tiny)."""
    from jax.experimental import multihost_utils
    import pickle
    blob = np.frombuffer(pickle.dumps(frames), np.uint8)
    # pad to a common size
    n = int(multihost_utils.process_allgather(np.array([len(blob)])).max())
    padded = np.zeros(n, np.uint8)
    padded[:len(blob)] = blob
    sizes = multihost_utils.process_allgather(np.array([len(blob)]))
    blobs = multihost_utils.process_allgather(padded)
    out = []
    for i in range(blobs.shape[0]):
        out.extend(pickle.loads(blobs[i, :int(sizes[i])].tobytes()))
    return out
