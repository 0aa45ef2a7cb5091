"""Driver-entry regression tests (VERDICT r1 item 1): dryrun_multichip must work
through the IMPORT path — no __main__ gating — including when the current process
has too few devices (it must self-host an n-device virtual CPU platform in a
subprocess)."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402

from aas_enhancement_tpu.config import MeshConfig  # noqa: E402
from aas_enhancement_tpu.parallel.mesh import make_mesh, pad_batch_to_devices  # noqa: E402


@pytest.mark.slow
def test_dryrun_import_path_direct():
    """Under the 8-virtual-CPU conftest the import-path call runs in-process."""
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_import_path_subprocess(monkeypatch):
    """With fewer visible devices than requested (the driver's axon situation),
    dryrun_multichip must re-exec itself under a virtual CPU platform and
    propagate success."""
    real = jax.devices()
    monkeypatch.setattr(jax, "devices", lambda *a, **k: real[:1])
    # Remove the conftest's device-count forcing from the inherited env so the
    # child genuinely has to install its own (as it would under axon).
    monkeypatch.setenv("XLA_FLAGS", "")
    monkeypatch.delenv("_AAS_DRYRUN_CHILD", raising=False)
    graft.dryrun_multichip(4)  # 4 keeps the child's compile small


def test_dryrun_subprocess_failure_propagates(monkeypatch):
    real = jax.devices()
    monkeypatch.setattr(jax, "devices", lambda *a, **k: real[:1])
    monkeypatch.setattr(sys, "executable", "/nonexistent/python")
    with pytest.raises((RuntimeError, OSError)):
        graft.dryrun_multichip(4)


def test_make_mesh_raises_on_shortfall():
    with pytest.raises(ValueError, match="requested 99 devices"):
        make_mesh(MeshConfig(num_devices=99))


def test_pad_batch_shortfall_exceeding_batch():
    """b=2, n=8: remainder (6) exceeds the batch; padding must tile cyclically
    to a full multiple of n (ADVICE r1 medium finding)."""
    b = {"x": np.arange(2 * 3, dtype=np.float32).reshape(2, 3)}
    padded = pad_batch_to_devices(b, 8)
    assert padded["x"].shape == (8, 3)
    np.testing.assert_array_equal(padded["x"][2], b["x"][0])
    np.testing.assert_array_equal(padded["x"][7], b["x"][1])


def test_process_local_rows_partition():
    """Multi-host input sharding contract: the per-process row blocks exactly
    tile the global batch, in order."""
    from aas_enhancement_tpu.parallel.mesh import process_local_rows
    g = np.arange(24, dtype=np.float32).reshape(8, 3)
    parts = [process_local_rows(g, 4, i) for i in range(4)]
    np.testing.assert_array_equal(np.concatenate(parts), g)
    with pytest.raises(ValueError, match="not divisible"):
        process_local_rows(g, 3, 0)
