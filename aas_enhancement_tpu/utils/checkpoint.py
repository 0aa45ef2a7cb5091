"""Checkpoint save/restore via Orbax.

Reference capability: `torch.save` dicts of model+optimizer+epoch with
`--continue_from` resume (SURVEY.md §2 "Checkpointing", §5).  TPU-native: Orbax
CheckpointManager with async save; restore is exact — resuming must continue the loss
curve bit-for-bit (SURVEY.md §5 "Checkpoint/resume").
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def make_manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True, enable_async_checkpointing=True)
    return ocp.CheckpointManager(directory, options=options)


def save(mgr: ocp.CheckpointManager, step: int, state: Any) -> None:
    mgr.save(step, args=ocp.args.StandardSave(state))


def restore(mgr: ocp.CheckpointManager, step: int, template: Any) -> Any:
    return mgr.restore(step, args=ocp.args.StandardRestore(template))


def restore_rehosted(mgr: ocp.CheckpointManager, step: int) -> Any:
    """Template-less restore onto THIS host's devices.

    A plain ``mgr.restore(step)`` resolves each array's SAVED sharding
    metadata, so a checkpoint written on TPU fails to open on a CPU-only
    host ("Device TPU v5 lite0 was not found in jax.local_devices()").
    Checkpoints must be portable across hosts (train on TPU, evaluate or
    fine-tune anywhere — SURVEY.md §5 "Checkpoint/resume"), so this reads
    only the shape/dtype metadata and pins every leaf to the default local
    device instead.
    """
    import jax

    path = os.path.join(str(mgr.directory), str(step), "default")
    meta = ocp.StandardCheckpointer().metadata(path)
    tree = getattr(meta, "item_metadata", meta).tree
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    abstract = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        tree)
    return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def restore_latest(directory: str, template: Any) -> Any:
    """Restore the newest checkpoint in `directory` into the shape of `template`."""
    mgr = make_manager(directory)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {directory}")
    out = restore(mgr, step, template)
    mgr.close()
    return out
