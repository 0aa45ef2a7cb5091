"""Device mesh + sharding helpers: the NCCL/DataParallel equivalent.

Reference capability (SURVEY.md §2 "PARALLELISM — DP", "COMM BACKEND"): multi-GPU
data parallel via torch DataParallel/DDP with NCCL all-reduce.  TPU-native rebuild
obligation #4: no hand-written comm layer — a 1-D `Mesh(('data',))`, batch arrays
sharded on the data axis, state replicated; GSPMD lowers the gradient reduction to
ICI collectives.  Multi-host DCN would come free via `jax.distributed.initialize`
(out of scope per SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aas_enhancement_tpu.config import MeshConfig


def maybe_init_distributed() -> None:
    """Multi-host (DCN) initialization hook.

    Single-host v5e-8 is the in-scope target (SURVEY.md §5); on a multi-host pod
    slice, calling this before any jax use (JAX_COORDINATOR_ADDRESS etc. set by
    the launcher) makes jax.devices() span all hosts and the same Mesh code path
    shards over DCN+ICI with no other changes.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(cfg: MeshConfig | None = None, num_devices: int = 0) -> Mesh:
    cfg = cfg or MeshConfig()
    n = num_devices or cfg.num_devices or len(jax.devices())
    available = jax.devices()
    if n > len(available):
        raise ValueError(
            f"make_mesh: requested {n} devices but only {len(available)} are "
            f"visible on platform {available[0].platform!r}. For a virtual CPU "
            f"mesh set JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} before jax "
            f"initializes (or use __graft_entry__.dryrun_multichip, which "
            f"self-hosts this in a subprocess).")
    devices = np.asarray(available[:n])
    return Mesh(devices, axis_names=(cfg.data_axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis, rest replicated."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict[str, Any]) -> dict[str, Any]:
    """Host batch dict -> device arrays with the batch dim over the data axis."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items() if v is not None}


def replicate_state(mesh: Mesh, state: Any) -> Any:
    rep = replicated(mesh)
    return jax.device_put(state, rep)


def pad_batch_to_devices(batch: dict[str, Any], n: int) -> dict[str, Any]:
    """Repeat-pad the batch dim to a multiple of n (shard evenness requirement)."""
    out = {}
    for k, v in batch.items():
        if v is None:
            continue
        b = v.shape[0]
        rem = (-b) % n
        if rem:
            # np.resize tiles the batch cyclically, covering rem > b (e.g. b=2,
            # n=8 -> 8 rows), which a single v[:rem] concat would not.
            v = np.resize(np.asarray(v), (b + rem,) + tuple(v.shape[1:]))
        out[k] = v
    return out
