"""Two-process jax.distributed smoke test for the multi-host input path.

VERDICT r2 weak #4 / next-round #4: `shard_batch`'s multi-host branch
(parallel/mesh.py — jax.make_array_from_process_local_data when
process_count > 1) had never executed.  This script launches TWO local
processes with jax.distributed.initialize (coordinator on localhost, CPU
platform, 4 virtual devices each -> one global 8-device mesh), runs a few AAS
steps through the REAL train loop — exercising per-process input sharding —
and asserts the loss trajectory matches a single-process 8-device run of the
same configuration bit-for-bit-close.

Run:  python scripts/multihost_smoke.py [--steps 4] [--out MULTIHOST.json]
Worker mode (internal): python scripts/multihost_smoke.py --worker ...
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_worker(args) -> None:
    """One process of the 2-process run (or the 1-process control run)."""
    # The image's sitecustomize imports jax at interpreter start with
    # JAX_PLATFORMS=axon already read, so the env override alone is not
    # enough — jax.config.update after import is what actually flips the
    # platform (same trick as tests/conftest.py + __graft_entry__).
    import re

    os.environ["JAX_PLATFORMS"] = "cpu"
    # REPLACE any inherited device-count flag (e.g. the pytest conftest's 8)
    # — this worker's local device count must be exactly args.local_devices.
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count="
        f"{args.local_devices}").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")

    if args.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert len(jax.devices()) == 8, f"global devices: {len(jax.devices())}"

    from aas_enhancement_tpu.config import (AMConfig, Config, DataConfig,
                                            DiscriminatorConfig,
                                            EnhancerConfig, TrainConfig)
    from aas_enhancement_tpu.train.loop import train

    cfg = Config(
        am=AMConfig(rnn_hidden=16, rnn_layers=1, conv_channels=8),
        enhancer=EnhancerConfig(conv_channels=8, conv_layers=1,
                                rnn_hidden=12, rnn_layers=1),
        discriminator=DiscriminatorConfig(channels=(8, 8)),
        train=TrainConfig(objective="aas", batch_size=8, epochs=100,
                          log_every=1, prefetch=0),
        data=DataConfig(num_buckets=1),
    )
    _, recs = train(cfg, args.noisy, args.clean, max_steps=args.steps)
    losses = [[r["step"], r["loss_g"], r["loss_d"]] for r in recs
              if "loss_g" in r]
    if jax.process_index() == 0:
        with open(args.result, "w") as f:
            json.dump({"losses": losses,
                       "process_count": jax.process_count()}, f)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--out", default="")
    # worker-mode internals
    p.add_argument("--worker", action="store_true")
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--local-devices", type=int, default=8)
    p.add_argument("--noisy", default="")
    p.add_argument("--clean", default="")
    p.add_argument("--result", default="")
    args = p.parse_args()

    if args.worker:
        run_worker(args)
        return

    # ------------------------------------------------------------- launcher
    from aas_enhancement_tpu.data.synthetic import generate_corpus

    wd = tempfile.mkdtemp(prefix="aas_multihost_")
    corpus = generate_corpus(os.path.join(wd, "corpus"), n_utts=8, seed=11,
                             vocab_chars=6)

    env_base = dict(os.environ)
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base.pop("JAX_COORDINATOR_ADDRESS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base["PYTHONPATH"] = (env_base.get("PYTHONPATH", "") + os.pathsep
                              + repo)

    def launch(n_proc, pid, n_local_dev, port, result):
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--steps", str(args.steps), "--port", str(port),
               "--num-processes", str(n_proc), "--process-id", str(pid),
               "--local-devices", str(n_local_dev),
               "--noisy", corpus["noisy"], "--clean", corpus["clean"],
               "--result", result]
        return subprocess.Popen(cmd, env=dict(env_base),
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT)

    # Control: single process, 8 virtual devices.
    res1 = os.path.join(wd, "single.json")
    proc = launch(1, 0, 8, 0, res1)
    out1, _ = proc.communicate(timeout=900)
    if proc.returncode != 0:
        sys.stderr.write(out1.decode())
        raise SystemExit("single-process control run failed")

    # Two processes x 4 local devices, same global mesh and batches.
    port = _free_port()
    res2 = os.path.join(wd, "multi.json")
    procs = [launch(2, pid, 4, port, res2) for pid in range(2)]
    outs = []
    failed = False
    for pr in procs:
        o, _ = pr.communicate(timeout=900)
        outs.append(o.decode())
        failed |= pr.returncode != 0
    if failed:
        sys.stderr.write("\n".join(outs))
        raise SystemExit("2-process run failed")

    with open(res1) as f:
        single = json.load(f)
    with open(res2) as f:
        multi = json.load(f)
    assert multi["process_count"] == 2
    max_rel = 0.0
    for (s1, g1, d1), (s2, g2, d2) in zip(single["losses"], multi["losses"]):
        assert s1 == s2
        for a, b in ((g1, g2), (d1, d2)):
            max_rel = max(max_rel, abs(a - b) / max(abs(a), 1e-9))
    ok = max_rel < 1e-4
    result = {"ok": ok, "steps": args.steps, "max_rel_loss_diff": max_rel,
              "single": single["losses"], "multi": multi["losses"]}
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    if not ok:
        raise SystemExit(f"loss trajectories diverged: {max_rel}")


if __name__ == "__main__":
    main()
