"""Per-host sharded data loading (VERDICT round-2 Next #4).

The reference shards the sampler per DDP rank
(reference zipvoice/dataset/datamodule.py:177-195).  Multi-controller jit
needs identical global shapes on every process, so here the batch
*composition* stays global (cheap metadata pass) while the expensive
feature IO is sharded: each process materializes only the rows whose
shards live on its devices (`SpeechSynthesisDataset(local_rows=...)` +
`shard_batch_per_host`).
"""

import os
import subprocess
import sys

import numpy as np

import conftest  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _StubTokenizer:
    pad_id = 0

    def tokens_to_token_ids(self, token_lists):
        return [[ord(t[0]) % 50 + 1 for t in toks] for toks in token_lists]

    def texts_to_token_ids(self, texts):
        return [[ord(c) % 50 + 1 for c in t] for t in texts]


def _make_cuts(tmp_path, n=6, F=20):
    from zipvoice_tpu.data.manifest import Cut

    rng = np.random.RandomState(0)
    cuts = []
    for i in range(n):
        T = int(rng.randint(40, 120))
        feats = rng.randn(T, F).astype(np.float32)
        path = tmp_path / f"f{i}.npy"
        np.save(path, feats)
        cuts.append(
            Cut(id=f"c{i}", duration=T * 256 / 24000,
                tokens=list("hello world"[: 3 + i]),
                features=str(path), num_frames=T)
        )
    return cuts


def test_local_rows_match_full_batch(tmp_path):
    """dataset(cuts, local_rows=rows) rows == full batch restricted to
    rows, including padded-row replication of global row 0, and feature IO
    touches exactly the local real rows (+ row 0 for padded rows)."""
    from zipvoice_tpu.data.dataset import SpeechSynthesisDataset

    cuts = _make_cuts(tmp_path, n=6)
    ds = SpeechSynthesisDataset(tokenizer=_StubTokenizer())
    full = ds(cuts)
    B = full["features"].shape[0]  # bucketed to 8 (6 real + 2 padded)
    assert B == 8

    loads = []
    orig = ds._features_of

    def counting(cut):
        loads.append(cut.id)
        return orig(cut)

    ds._features_of = counting

    # second "process" owns rows 4..7: reals 4,5 and padded 6,7
    rows = np.arange(4, 8)
    local = ds(cuts, local_rows=rows)
    assert local["global_batch_size"] == B
    for k in ("features", "features_lens", "tokens", "tokens_lens"):
        np.testing.assert_array_equal(
            local[k], full[k][rows], err_msg=k
        )
    np.testing.assert_array_equal(local["valid"], [True, True, False, False])
    # IO: rows 4, 5 plus row 0 (mirror source for the padded rows), once each
    assert sorted(loads) == ["c0", "c4", "c5"]


def test_local_rows_fn_auto(tmp_path):
    """local_rows_fn wires per-host materialization into plain
    dataset(cuts) calls; local_rows=False forces the full batch."""
    from zipvoice_tpu.data.dataset import SpeechSynthesisDataset

    cuts = _make_cuts(tmp_path, n=6)
    ds = SpeechSynthesisDataset(
        tokenizer=_StubTokenizer(),
        local_rows_fn=lambda B: np.arange(B // 2),
    )
    full = ds(cuts, local_rows=False)
    local = ds(cuts)
    assert local["features"].shape[0] == 4
    np.testing.assert_array_equal(local["features"], full["features"][:4])


def test_shard_batch_per_host_single_process(tmp_path):
    """On a single process (8-device CPU mesh) local rows = all rows and
    shard_batch_per_host reproduces shard_batch exactly."""
    import jax

    from zipvoice_tpu.parallel.mesh import (
        local_batch_rows,
        make_mesh,
        shard_batch,
        shard_batch_per_host,
    )

    mesh = make_mesh(n_data=8)
    B = 8
    rows = local_batch_rows(mesh, B)
    np.testing.assert_array_equal(rows, np.arange(B))

    rng = np.random.RandomState(1)
    batch = {
        "features": rng.randn(B, 16, 4).astype(np.float32),
        "features_lens": np.full((B,), 16, np.int32),
    }
    g1 = shard_batch(batch, mesh)
    g2 = shard_batch_per_host({k: v[rows] for k, v in batch.items()},
                              mesh, B)
    for k in batch:
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(g1[k])),
            np.asarray(jax.device_get(g2[k])), err_msg=k,
        )


WORKER = r"""
import os, sys
num_procs = int(sys.argv[1]); pid = int(sys.argv[2]); port = sys.argv[3]
n_local = 4 // num_procs
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={{n_local}}"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{{port}}",
    num_processes=num_procs, process_id=pid,
)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from __graft_entry__ import _TINY_CFG
from zipvoice_tpu.models.zipvoice import ZipVoice
from zipvoice_tpu.parallel.mesh import (
    local_batch_rows, make_mesh, replicate_tree, shard_batch,
    shard_batch_per_host,
)
from zipvoice_tpu.train.optim import scaled_adam
from zipvoice_tpu.train.train_step import (
    TrainState, init_train_state, make_train_step,
)

model = ZipVoice(**_TINY_CFG)
B, T, F = 4, 24, model.feat_dim
rng = np.random.RandomState(0)
batch = {{
    "tokens": np.tile(np.array([[3, 5, 7, 2, 0, 0]], np.int32), (B, 1)),
    "tokens_lens": np.full((B,), 4, np.int32),
    "features": rng.randn(B, T, F).astype(np.float32),
    "features_lens": np.full((B,), T, np.int32),
}}
params = jax.device_get(model.init(
    {{"params": jax.random.PRNGKey(0)}},
    tokens=jnp.asarray(batch["tokens"]),
    tokens_lens=jnp.asarray(batch["tokens_lens"]),
    features=jnp.asarray(batch["features"]),
    features_lens=jnp.asarray(batch["features_lens"]),
    noise=jnp.zeros((B, T, F)), t=jnp.full((B, 1, 1), 0.5),
    rng=jax.random.PRNGKey(1), train=False,
)["params"])

mesh = make_mesh(n_data=4)
rows = local_batch_rows(mesh, B)
# IO sharding: this process materializes exactly 1/num_procs of the rows
assert len(rows) == B // num_procs, (rows, num_procs)

g_rep = shard_batch(batch, mesh)
g_loc = shard_batch_per_host(
    {{k: v[rows] for k, v in batch.items()}}, mesh, B
)
for k in batch:
    for s1, s2 in zip(g_rep[k].addressable_shards,
                      g_loc[k].addressable_shards):
        np.testing.assert_array_equal(
            np.asarray(s1.data), np.asarray(s2.data),
        )

tx = scaled_adam(lr=0.03)
step = make_train_step(
    model, tx, condition_drop_ratio=0.0, dropout_rate=0.0, mesh=mesh,
    schedules=True, max_duration=50.0,
)
def fresh_state():
    s = init_train_state(params, tx)
    return TrainState(
        params=replicate_tree(s.params, mesh),
        opt_state=replicate_tree(s.opt_state, mesh),
        step=replicate_tree(s.step, mesh),
    )

key = jax.random.PRNGKey(42)
# the train step donates its state buffers — use a fresh state per call
_, m_rep = step(fresh_state(), g_rep, key)
_, m_loc = step(fresh_state(), g_loc, key)
l1, l2 = float(m_rep["loss"]), float(m_loc["loss"])
assert np.isfinite(l1) and abs(l1 - l2) < 1e-6, (l1, l2)
print(f"proc {{pid}} ok loss={{l1:.6f}}", flush=True)
"""


def test_two_process_per_host_batches(tmp_path):
    """2 procs x 2 devices: per-host assembled global batch is
    shard-identical to the replicated scheme and trains to the same loss."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), "2", str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    for p in procs:
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, f"STDOUT:{stdout}\nSTDERR:{stderr}"
        assert "ok loss=" in stdout
