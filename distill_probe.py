"""On-chip timing of the 123M distillation train step (VERDICT r3 #6).

The distill step is a different compiled program from the base step: the
teacher runs two chained no-grad 1-step solves (stage "first": base
ZipVoice with CFG batch-doubling; stage "second": EMA copy of the
student) and the student backprops through a single sample_intermediate
solve (reference zipvoice/bin/train_zipvoice_distill.py:484-507).

Relay-proof scan methodology as in train_probe.py: N steps inside one
jitted program + full-param checksum; per-step = (t_N - t_1)/(N-1).

    python distill_probe.py [--b 8] [--t 1280] [--stage first|second]
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
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--stage", default="first", choices=["first", "second"])
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    from bench import host_init_params
    from zipvoice_tpu.models.zipvoice import ZipVoice, ZipVoiceDistill
    from zipvoice_tpu.train.distill import ema_update, make_distill_train_step
    from zipvoice_tpu.train.optim import eden_schedule, scaled_adam
    from zipvoice_tpu.train.train_step import TrainState, init_train_state

    B, T, S = args.b, args.t, args.s
    student = ZipVoiceDistill(vocab_size=360, pad_id=0, dtype=jnp.bfloat16,
                              use_pallas_attention=args.pallas)
    teacher_model = (student if args.stage == "second"
                     else ZipVoice(vocab_size=360, pad_id=0,
                                   dtype=jnp.bfloat16,
                                   use_pallas_attention=args.pallas))
    F = student.feat_dim
    rng = np.random.RandomState(0)
    batch = {
        "tokens": rng.randint(1, 300, size=(B, S)).astype(np.int32),
        "tokens_lens": np.full((B,), S - 1, np.int32),
        "features": (rng.randn(B, T, F) * 0.3).astype(np.float32),
        "features_lens": np.full((B,), T, np.int32),
    }
    sample_kwargs = dict(
        tokens=jnp.asarray(batch["tokens"]),
        tokens_lens=jnp.asarray(batch["tokens_lens"]),
        features=jnp.asarray(batch["features"]),
        features_lens=jnp.asarray(batch["features_lens"]),
        noise=jnp.zeros((B, T, F)),
        speech_condition_mask=jnp.zeros((B, T), bool),
        t_start=0.0, t_end=1.0, num_step=1, guidance_scale=1.0,
        method="sample_intermediate",
    )
    s_params = jax.device_put(
        host_init_params(student, rng, **sample_kwargs)["params"]
    )
    if args.stage == "second":
        t_params = s_params
    else:
        t_params = jax.device_put(host_init_params(
            teacher_model, np.random.RandomState(1),
            tokens=jnp.asarray(batch["tokens"]),
            tokens_lens=jnp.asarray(batch["tokens_lens"]),
            features=jnp.asarray(batch["features"]),
            features_lens=jnp.asarray(batch["features_lens"]),
            noise=jnp.zeros((B, T, F)),
            t=jnp.full((B, 1, 1), 0.5),
            train=False,
            speech_condition_mask=jnp.zeros((B, T), bool),
        )["params"])

    tx = scaled_adam(lr=eden_schedule(base_lr=0.02), clipping_scale=2.0)
    state = init_train_state(s_params, tx)
    raw = make_distill_train_step(student, teacher_model, tx,
                                  stage=args.stage, mesh=None)
    # make_distill_train_step returns a jitted step; we need the raw fn to
    # scan — re-jit a scanned wrapper around it (jit of jit is fine)
    batch_dev = jax.device_put({k: jnp.asarray(v) for k, v in batch.items()})

    def make_run(n):
        @jax.jit
        def run(state, t_params, key):
            def body(carry, i):
                st, tp = carry
                st, metrics = raw(st, tp, batch_dev,
                                  jax.random.fold_in(key, i))
                if args.stage == "second":
                    tp = ema_update(tp, st.params, 0.9999)
                return (st, tp), metrics["loss"]
            (st, tp), losses = jax.lax.scan(
                body, (state, t_params), jnp.arange(n, dtype=jnp.int32)
            )
            chk = sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                      for x in jax.tree.leaves(st.params))
            return losses, chk
        return run

    r1, rn = make_run(1), make_run(args.n)
    t0 = time.perf_counter()
    losses, chk = r1(state, t_params, jax.random.PRNGKey(0))
    _ = float(chk)
    print(f"# warmup n=1 (incl. compile): {time.perf_counter() - t0:.1f}s "
          f"loss={float(losses[-1]):.4f}", flush=True)
    t0 = time.perf_counter()
    losses, chk = rn(state, t_params, jax.random.PRNGKey(1))
    _ = float(chk)
    print(f"# warmup n={args.n}: {time.perf_counter() - t0:.1f}s", flush=True)

    def med(f, seeds):
        ts = []
        for s in seeds:
            t0 = time.perf_counter()
            ls, c = f(state, t_params, jax.random.PRNGKey(s))
            _ = float(c)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2], ls

    c1, _ = med(r1, (2, 3, 4))
    cn, losses = med(rn, (12, 13, 14))
    per = (cn - c1) / (args.n - 1)
    frames = B * T
    print(f"distill {args.stage} step ({args.n}-scan): {per:.3f}s/step "
          f"losses={[round(float(x), 3) for x in losses]} "
          f"frames/s={frames / per:.0f} "
          f"audio-s/s/chip={frames / per / 93.75:.1f}", flush=True)


if __name__ == "__main__":
    main()
