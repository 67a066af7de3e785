"""Component-wise training-step profile on the real chip (VERDICT r3 #3).

Decomposes the full 123M ScaledAdam train step into forward / backward /
optimizer phases with the relay-proof scan methodology (N steps inside ONE
jitted program + full-tree checksum; per-step = (t_N - t_1)/(N-1), which
cancels dispatch overhead and input upload shared by both programs).

    python train_scan_probe.py [--b 8] [--t 1280] [--pallas] [--phase all]

Phases:
    fwd     loss only (no grad)
    fwdbwd  jax.value_and_grad (no optimizer)
    full    fwd+bwd+ScaledAdam update (the real step)
The optimizer cost is full - fwdbwd; the backward cost is fwdbwd - fwd.
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
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--phase", type=str, default="all",
                    choices=["all", "fwd", "fwdbwd", "full"])
    args = ap.parse_args()

    from bench import host_init_params
    from zipvoice_tpu.models.zipvoice import ZipVoice
    from zipvoice_tpu.train.optim import eden_schedule, scaled_adam
    from zipvoice_tpu.train.train_step import TrainState, init_train_state

    B, T, S = args.b, args.t, args.s
    model = ZipVoice(vocab_size=360, pad_id=0, dtype=jnp.bfloat16,
                     use_pallas_attention=args.pallas)
    F = model.feat_dim
    rng = np.random.RandomState(0)
    batch = {
        "tokens": rng.randint(1, 300, size=(B, S)).astype(np.int32),
        "tokens_lens": np.full((B,), S - 1, np.int32),
        "features": (rng.randn(B, T, F) * 0.3).astype(np.float32),
        "features_lens": np.full((B,), T, np.int32),
    }
    init_kwargs = dict(
        tokens=jnp.asarray(batch["tokens"]),
        tokens_lens=jnp.asarray(batch["tokens_lens"]),
        features=jnp.asarray(batch["features"]),
        features_lens=jnp.asarray(batch["features_lens"]),
        noise=jnp.zeros((B, T, F)),
        t=jnp.full((B, 1, 1), 0.5),
        train=False,
        speech_condition_mask=jnp.zeros((B, T), bool),
    )
    params = jax.device_put(
        host_init_params(model, rng, **init_kwargs)["params"]
    )
    tx = scaled_adam(lr=eden_schedule(base_lr=0.02), clipping_scale=2.0)
    state = init_train_state(params, tx)
    batch_dev = jax.device_put({k: jnp.asarray(v) for k, v in batch.items()})

    def model_loss(params, key, step):
        k_t, k_noise, k_mask, k_drop, k_dropout, k_reg, k_skip = (
            jax.random.split(jax.random.fold_in(key, step), 7)
        )
        t = jax.random.uniform(k_t, (B, 1, 1))
        noise = jax.random.normal(k_noise, (B, T, F))
        cond_drop = jax.random.uniform(k_drop, (B,)) <= 0.2
        return model.apply(
            {"params": params},
            tokens=batch_dev["tokens"],
            tokens_lens=batch_dev["tokens_lens"],
            features=batch_dev["features"],
            features_lens=batch_dev["features_lens"],
            noise=noise, t=t, condition_drop_mask=cond_drop,
            rng=k_mask, train=True, dropout_rate=0.1,
            rngs={"dropout": k_dropout, "reg": k_reg, "skip": k_skip},
        )

    def tree_chk(tr):
        return sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                   for x in jax.tree.leaves(tr))

    def make_fwd(n):
        @jax.jit
        def run(params, key):
            def body(acc, i):
                return acc + model_loss(params, key, i), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()),
                                  jnp.arange(n, dtype=jnp.int32))
            return acc
        return run

    def make_fwdbwd(n):
        @jax.jit
        def run(params, key):
            def body(acc, i):
                loss, grads = jax.value_and_grad(model_loss)(params, key, i)
                return acc + loss + tree_chk(grads), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()),
                                  jnp.arange(n, dtype=jnp.int32))
            return acc
        return run

    def make_full(n):
        @jax.jit
        def run(state, key):
            def body(st, i):
                loss, grads = jax.value_and_grad(model_loss)(
                    st.params, key, i
                )
                updates, opt_state = tx.update(grads, st.opt_state, st.params)
                params2 = jax.tree.map(lambda p, u: p + u, st.params, updates)
                return TrainState(params=params2, opt_state=opt_state,
                                  step=st.step + 1), loss
            st, losses = jax.lax.scan(body, state,
                                      jnp.arange(n, dtype=jnp.int32))
            return losses, tree_chk(st.params)
        return run

    def timeit(mk, arg, n):
        r1, rn = mk(1), mk(n)
        key = jax.random.PRNGKey(0)
        for r in (r1, rn):  # compile
            out = r(arg, key)
            jax.block_until_ready(out)
        def med(r, seeds):
            ts = []
            for s in seeds:
                k = jax.random.PRNGKey(s)
                t0 = time.perf_counter()
                out = r(arg, k)
                jax.block_until_ready(jax.tree.leaves(out)[-1])
                _ = float(np.asarray(jax.tree.leaves(out)[-1]).ravel()[0])
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[len(ts) // 2]
        c1 = med(r1, (2, 3, 4))
        cn = med(rn, (12, 13, 14))
        return (cn - c1) / (n - 1)

    n = args.n
    frames = B * T
    results = {}
    phases = (["fwd", "fwdbwd", "full"] if args.phase == "all"
              else [args.phase])
    for ph in phases:
        t0 = time.perf_counter()
        if ph == "fwd":
            per = timeit(make_fwd, params, n)
        elif ph == "fwdbwd":
            per = timeit(make_fwdbwd, params, n)
        else:
            per = timeit(make_full, state, n)
        results[ph] = per
        print(f"{ph:8s} {per * 1000:8.1f} ms/step   "
              f"({time.perf_counter() - t0:.0f}s incl. compile)", flush=True)
    if "fwd" in results and "fwdbwd" in results:
        print(f"backward  {(results['fwdbwd'] - results['fwd']) * 1000:8.1f} ms")
    if "fwdbwd" in results and "full" in results:
        print(f"optimizer {(results['full'] - results['fwdbwd']) * 1000:8.1f} ms")
    if "full" in results:
        per = results["full"]
        print(f"frames/s={frames / per:.0f} "
              f"audio-s/s/chip={frames / per / 93.75:.1f}")


if __name__ == "__main__":
    main()
