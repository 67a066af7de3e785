"""On-chip timing of the 123M Dialog-Stereo train step (VERDICT r4 #7).

The two-stream stereo program is a different executable from base/distill:
dual in/out projections over (B, T, 2F) features, the speaker-exclusive
energy loss on the x1 estimate, and the trainer alternates it with the
mixed single-channel objective (se_weight=0 on (B, T, F)) — reference
train_zipvoice_dialog_stereo.py:349-378.  Both programs are timed with the
relay-proof scan methodology of train_probe.py.

    python stereo_probe.py [--b 8] [--t 1280] [--pallas] [--mode stereo|mixed]
"""

import argparse
import os
import time

import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=1280)
    ap.add_argument("--s", type=int, default=128)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--mode", default="stereo", choices=["stereo", "mixed"])
    args = ap.parse_args()

    from bench import host_init_params
    from zipvoice_tpu.models.dialog import ZipVoiceDialogStereo
    from zipvoice_tpu.train.optim import eden_schedule, scaled_adam
    from zipvoice_tpu.train.train_step import init_train_state, make_train_step

    B, T, S = args.b, args.t, args.s
    model = ZipVoiceDialogStereo(
        vocab_size=360, pad_id=0, dtype=jnp.bfloat16,
        use_pallas_attention=args.pallas,
    )
    F = model.feat_dim
    n_ch = 2 if args.mode == "stereo" else 1
    se_weight = 1.0 if args.mode == "stereo" else 0.0
    rng = np.random.RandomState(0)
    batch = {
        "tokens": rng.randint(4, 300, size=(B, S)).astype(np.int32),
        "tokens_lens": np.full((B,), S - 1, np.int32),
        "features": (rng.randn(B, T, n_ch * F) * 0.3).astype(np.float32),
        "features_lens": np.full((B,), T, np.int32),
    }
    # the stereo model has BOTH projection sets: stream0 (stereo,
    # se_weight=1 on (B,T,2F)) and stream1 (mixed, se_weight=0 on
    # (B,T,F)); the trainer alternates programs over ONE param tree, so
    # init with both input widths and merge (train CLI does the same via
    # its grafted init, bin/train_zipvoice.py:401-419)
    def init_for(n_ch_, se_w):
        feats = (rng.randn(B, T, n_ch_ * F) * 0.3).astype(np.float32)
        kw = dict(
            tokens=jnp.asarray(batch["tokens"]),
            tokens_lens=jnp.asarray(batch["tokens_lens"]),
            features=jnp.asarray(feats),
            features_lens=jnp.asarray(batch["features_lens"]),
            noise=jnp.zeros((B, T, n_ch_ * F)),
            t=jnp.full((B, 1, 1), 0.5),
            train=False,
            se_weight=se_w,
            speech_condition_mask=jnp.zeros((B, T), bool),
        )
        return host_init_params(model, rng, **kw)["params"]

    def merge(a, b):
        if not isinstance(a, dict):
            return a
        out = dict(a)
        for k, v in b.items():
            out[k] = merge(out[k], v) if k in out else v
        return out

    params = jax.device_put(merge(init_for(2, 1.0), init_for(1, 0.0)))
    n_par = sum(p.size for p in jax.tree.leaves(params))
    print(f"# ZipVoiceDialogStereo params: {n_par / 1e6:.1f}M "
          f"mode={args.mode}", flush=True)
    tx = scaled_adam(lr=eden_schedule(base_lr=0.02), clipping_scale=2.0)
    state = init_train_state(params, tx)
    raw_step = make_train_step(
        model, tx, jit=False, dropout_rate=0.1, max_duration=250.0,
        model_kwargs={"se_weight": se_weight},
    )
    batch_dev = jax.device_put({k: jnp.asarray(v) for k, v in batch.items()})

    def make_run(n):
        @jax.jit
        def run(state, batch, key):
            def body(st, k):
                st, metrics = raw_step(st, batch, k)
                return st, metrics["loss"]

            st, losses = jax.lax.scan(body, state, jax.random.split(key, n))
            chk = sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                      for x in jax.tree.leaves(st.params))
            return losses, chk

        return run

    n = max(args.iters, 4)
    r1, rn = make_run(1), make_run(n)
    t0 = time.perf_counter()
    losses, chk = r1(state, batch_dev, jax.random.PRNGKey(0))
    _ = float(chk)
    print(f"# warmup n=1 (incl. compile): {time.perf_counter() - t0:.1f}s "
          f"loss={float(losses[-1]):.4f}", flush=True)
    t0 = time.perf_counter()
    losses, chk = rn(state, batch_dev, jax.random.PRNGKey(1))
    _ = float(chk)
    print(f"# warmup n={n} (incl. compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    def med(f, seeds):
        ts = []
        for s_ in seeds:
            t0 = time.perf_counter()
            ls, c = f(state, batch_dev, jax.random.PRNGKey(s_))
            _ = float(c)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2], ls

    c1, _ = med(r1, (2, 3, 4))
    cn, losses = med(rn, (12, 13, 14))
    per = (cn - c1) / (n - 1)
    frames = int(batch["features_lens"].sum())
    print(f"stereo({args.mode}) train step ({n}-step scan): {per:.3f}s/step "
          f"losses={[round(float(x), 3) for x in losses]} "
          f"frames/s={frames / per:.0f} "
          f"audio-s/s/chip={frames / per / 93.75:.1f}", flush=True)


if __name__ == "__main__":
    main()
