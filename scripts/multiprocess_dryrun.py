#!/usr/bin/env python
"""TRUE multi-process (multi-"host") dryrun: 2 processes x 4 CPU devices.

The virtual 8-device mesh in tests/ is single-process; this script proves
the actual multi-host code path (BASELINE config 5, "2 hosts"): it spawns
two processes that join a ``jax.distributed`` cluster, build one global
(data=1, model=8) mesh spanning both, run the tensor-parallel int8 GPT
forward + generate on it, and save a per-process sharded checkpoint (each
process writes ONLY its addressable shards — proc0.npz / proc1.npz).

Parent mode (default): spawns the two workers, waits, checks both wrote
their shard files and agreed on the forward checksum. Worker mode
(--process-id N): joins the cluster and runs the program.

Usage: python scripts/multiprocess_dryrun.py
"""

import argparse
import os
import subprocess
import sys
import tempfile

N_PROC = 2
LOCAL_DEVICES = 4
PORT = 48762


def worker(process_id: int, ckpt_dir: str) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={LOCAL_DEVICES}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=N_PROC, process_id=process_id)
    import jax.numpy as jnp
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES
    assert jax.process_count() == N_PROC

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.parallel.mesh import make_mesh
    from qgemm_tpu.parallel.sharding import shard_quantized_model
    from qgemm_tpu.utils.checkpoint import save_checkpoint_sharded

    mesh = make_mesh((1, N_PROC * LOCAL_DEVICES), ("data", "model"))
    cfg = GPTConfig(vocab_size=64, d_model=32, n_heads=8, d_ff=64,
                    n_layers=2, max_seq_len=32)
    qm = GPT.init(cfg, key=jax.random.PRNGKey(0)).quantize()
    qms = shard_quantized_model(qm, mesh)

    toks = jnp.ones((1, 8), jnp.int32)
    logits = jax.jit(lambda m, t: m.forward(t))(qms, toks)
    # every process must compute the same replicated answer
    checksum = float(jnp.sum(logits.astype(jnp.float64)))
    gen = jax.jit(lambda m, t: m.generate(t, 3))(qms, toks)
    jax.block_until_ready(gen)

    save_checkpoint_sharded(ckpt_dir, qms)

    # all processes must finish writing before anyone reloads
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("ckpt_saved")

    from qgemm_tpu.utils.checkpoint import load_checkpoint_sharded
    template = shard_quantized_model(
        GPT.init(cfg, key=jax.random.PRNGKey(99)).quantize(), mesh)
    restored = load_checkpoint_sharded(ckpt_dir, template)
    relogits = jax.jit(lambda m, t: m.forward(t))(restored, toks)
    assert bool(jnp.all(relogits == logits)), "restore mismatch"

    print(f"proc{process_id}: checksum {checksum:.6f} gen "
          f"{[int(t) for t in gen[0]]} restore_ok", flush=True)
    jax.distributed.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--ckpt-dir", default=None)
    args = ap.parse_args()

    if args.process_id is not None:
        worker(args.process_id, args.ckpt_dir)
        return

    ckpt_dir = tempfile.mkdtemp(prefix="qgemm_mp_ckpt_")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--process-id", str(i), "--ckpt-dir", ckpt_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(N_PROC)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        tail = "\n".join(out.strip().splitlines()[-3:])
        print(f"--- proc{i} (rc={p.returncode}) ---\n{tail}", file=sys.stderr)
        if p.returncode != 0:
            raise SystemExit(f"worker {i} failed")

    sums = set()
    for out in outs:
        for line in out.splitlines():
            if line.startswith("proc") and "checksum" in line:
                sums.add(line.split("checksum")[1].split("gen")[0].strip())
    assert len(sums) == 1, f"processes disagree: {sums}"
    for i in range(N_PROC):
        path = os.path.join(ckpt_dir, f"proc{i}.npz")
        assert os.path.exists(path), f"missing {path}"
        print(f"{path}: {os.path.getsize(path)} bytes", file=sys.stderr)
    import json
    print(json.dumps({"ok": True, "processes": N_PROC,
                      "devices": N_PROC * LOCAL_DEVICES,
                      "checksum_agreement": True,
                      "per_process_ckpt": True}))


if __name__ == "__main__":
    main()
