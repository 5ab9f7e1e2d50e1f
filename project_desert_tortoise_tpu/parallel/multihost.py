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
    the interconnect, not the filesystem)."""
    n_blk = mesh.shape["blk"]
    per = -(-n_samples // n_blk)
    local_blk = [d for d in mesh.devices.flatten()
                 if d.process_index == jax.process_index()]
    cols = sorted({int(np.where(mesh.devices == d)[1][0]) for d in local_blk})
    lo = cols[0] * per
    hi = min((cols[-1] + 1) * per, n_samples)
    return lo, hi


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
