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

    Single-host v5e-8 is the in-scope target (SURVEY.md §5).  On a multi-host
    pod slice, calling this before any jax use (JAX_COORDINATOR_ADDRESS etc.
    set by the launcher) makes jax.devices() span all hosts; shard_batch then
    feeds each process's LOCAL rows via make_array_from_process_local_data, so
    the same Mesh code path shards over DCN+ICI.  (Each process still composes
    the full global batch deterministically and slices its own rows — decode
    work is duplicated across hosts, correctness is not affected.)
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


def process_local_rows(v, process_count: int, process_index: int):
    """The rows of a global batch that belong to one process (contiguous
    row-block layout, matching a 1-D data-axis NamedSharding over hosts)."""
    g = v.shape[0]
    if g % process_count:
        raise ValueError(f"global batch {g} not divisible by "
                         f"{process_count} processes")
    per = g // process_count
    return v[process_index * per: (process_index + 1) * per]


def shard_batch(mesh: Mesh, batch: dict[str, Any]) -> dict[str, Any]:
    """Host batch dict -> device arrays with the batch dim over the data axis.

    Multi-host: every process composes the same global batch (the pipeline is
    deterministic), then contributes only its local row-block through
    jax.make_array_from_process_local_data — no host ever device_puts rows it
    does not own (SURVEY.md §5 "Distributed comm backend").
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sh) for k, v in batch.items() if v is not None}
    out = {}
    pc, pi = jax.process_count(), jax.process_index()
    for k, v in batch.items():
        if v is None:
            continue
        local = np.ascontiguousarray(process_local_rows(np.asarray(v), pc, pi))
        out[k] = jax.make_array_from_process_local_data(sh, local, v.shape)
    return out


def replicate_state(mesh: Mesh, state: Any) -> Any:
    rep = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(state, rep)
    # Multi-host: device_put rejects shardings spanning non-addressable
    # devices; build each global (fully replicated) array from the local copy
    # instead — every process holds identical values (deterministic init), so
    # the callback serves any requested shard index from the host buffer.
    def put(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            g = jax.make_array_from_callback(data.shape, rep,
                                             lambda idx, a=data: a[idx])
            return jax.random.wrap_key_data(g, impl=jax.random.key_impl(x))
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, rep,
                                            lambda idx, a=arr: a[idx])
    return jax.tree.map(put, state)


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
