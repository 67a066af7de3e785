"""2-process full-step throughput proxy for the >=90%-at-2-hosts target
(BASELINE.md; VERDICT r4 #8).

Times N data-parallel train steps of the FULL 123M ZipVoice (ScaledAdam,
gradient allreduce over jax.distributed gloo collectives — the CPU stand-in
for ICI/DCN) at 1 process x 8 virtual devices vs 2 processes x 4 devices,
with per-host input loading from disk (each process reads only its
local_rows' feature files, the train CLI's per-host sharding).  Total
device count and total batch are held constant, so the per-STEP time ratio
isolates the cross-process collective + per-host input cost — the terms a
second host adds (reference runs torch DDP across hosts,
zipvoice/utils/common.py:187-213; our analog parallel/mesh.py).

steps/s(2 proc) / steps/s(1 proc) >= 0.9 is the pass line.

Usage: python tools/multiproc_scaling_probe.py [--t 256] [--steps 4]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
num_procs = int(sys.argv[1]); pid = int(sys.argv[2]); port = sys.argv[3]
out_path = sys.argv[4]; data_dir = sys.argv[5]
T = int(sys.argv[6]); n_steps = int(sys.argv[7])
n_local = 8 // num_procs
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={n_local}"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(data_dir, "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if num_procs > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_procs, process_id=pid,
    )
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.environ["PROBE_REPO"])
from __graft_entry__ import _BASE_CFG
from zipvoice_tpu.models.zipvoice import ZipVoice
from zipvoice_tpu.parallel.mesh import (
    local_batch_rows, make_mesh, replicate_tree, shard_batch_per_host,
)
from zipvoice_tpu.train.optim import eden_schedule, scaled_adam
from zipvoice_tpu.train.train_step import (
    TrainState, init_train_state, make_train_step,
)

model = ZipVoice(**_BASE_CFG)
B, F, S = 8, model.feat_dim, 24
mesh = make_mesh(n_data=8)
local_rows = local_batch_rows(mesh, B)
n_local = len(local_rows)

def load_local_batch(step_i):
    # per-host input loading: each process reads ONLY its rows from disk
    # (train CLI local_rows sharding); shard_batch_per_host assembles the
    # global sharded array without any process holding the full batch.
    feats = np.stack([
        np.load(os.path.join(data_dir, f"row{(r + step_i) % B}.npy"))[:T]
        for r in local_rows
    ])
    return {
        "tokens": np.tile(
            np.arange(2, 2 + S, dtype=np.int32)[None], (n_local, 1)),
        "tokens_lens": np.full((n_local,), S - 2, np.int32),
        "features": feats,
        "features_lens": np.full((n_local,), T, np.int32),
    }

batch0 = load_local_batch(0)
full0 = {
    "tokens": np.tile(np.arange(2, 2 + S, dtype=np.int32)[None], (B, 1)),
    "tokens_lens": np.full((B,), S - 2, np.int32),
    "features": np.zeros((B, T, F), np.float32),
    "features_lens": np.full((B,), T, np.int32),
}
params = model.init(
    {"params": jax.random.PRNGKey(3)},
    tokens=jnp.asarray(full0["tokens"]),
    tokens_lens=jnp.asarray(full0["tokens_lens"]),
    features=jnp.asarray(full0["features"]),
    features_lens=jnp.asarray(full0["features_lens"]),
    noise=jnp.zeros((B, T, F)), t=jnp.full((B, 1, 1), 0.5),
    rng=jax.random.PRNGKey(4), train=False,
)["params"]
tx = scaled_adam(lr=eden_schedule(base_lr=0.02), clipping_scale=2.0)
state = init_train_state(params, tx)
state = TrainState(
    params=replicate_tree(state.params, mesh),
    opt_state=replicate_tree(state.opt_state, mesh),
    step=replicate_tree(state.step, mesh),
)
step = make_train_step(model, tx, mesh=mesh)
key = jax.random.PRNGKey(5)
# warmup (compile)
state, m = step(state, shard_batch_per_host(batch0, mesh, B), key)
_ = float(m["loss"])
ts = []
for i in range(n_steps):
    t0 = time.perf_counter()
    b = load_local_batch(i + 1)
    state, m = step(state, shard_batch_per_host(b, mesh, B), key)
    loss = float(m["loss"])  # blocks
    ts.append(time.perf_counter() - t0)
    print(f"proc {pid}: step {i} {ts[-1]:.3f}s loss={loss:.4f}",
          flush=True)
if pid == 0:
    json.dump({"num_procs": num_procs,
               "step_times": ts,
               "median_step_s": float(np.median(ts))},
              open(out_path, "w"))
"""


def run(num_procs, tmp, port, t_frames, n_steps):
    script = os.path.join(tmp, "worker.py")
    with open(script, "w") as f:
        f.write(WORKER)
    out = os.path.join(tmp, f"r{num_procs}.json")
    env = dict(os.environ)
    # do NOT inherit /root/.axon_site: these CPU workers must never touch
    # the remote-TPU tunnel (the axon sitecustomize registers a client at
    # interpreter start, and the relay is effectively single-tenant)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["PROBE_REPO"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(num_procs), str(pid), str(port),
             out, tmp, str(t_frames), str(n_steps)], env=env)
        for pid in range(num_procs)
    ]
    for p in procs:
        assert p.wait(timeout=3600) == 0
    return json.load(open(out))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--t", type=int, default=256)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()
    tmp = tempfile.mkdtemp(prefix="mpscale_")
    rng = np.random.RandomState(0)
    for r in range(8):
        np.save(os.path.join(tmp, f"row{r}.npy"),
                (rng.randn(args.t, 100) * 0.3).astype(np.float32))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    r1 = run(1, tmp, port, args.t, args.steps)
    r2 = run(2, tmp, port, args.t, args.steps)
    ratio = r1["median_step_s"] / r2["median_step_s"]
    print(json.dumps({
        "t_frames": args.t,
        "steps_timed": args.steps,
        "median_step_s_1proc": r1["median_step_s"],
        "median_step_s_2proc": r2["median_step_s"],
        "throughput_ratio_2proc_vs_1proc": round(ratio, 4),
        "pass_90pct": ratio >= 0.9,
    }))


if __name__ == "__main__":
    main()
