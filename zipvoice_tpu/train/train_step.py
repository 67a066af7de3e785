"""Jitted, mesh-sharded training step for the ZipVoice model family.

The reference's epoch loop (zipvoice/bin/train_zipvoice.py:488-721) runs
fp16 AMP with a GradScaler babysitter; TPU-native we train in bf16 compute /
fp32 params with no loss scaling (intentional divergence, SURVEY.md §7).

The step draws t ~ U(0,1), gaussian noise, the speech-condition span mask,
and the CFG text-condition drop mask on device from a threaded rng
(reference train_zipvoice.py:456-467 + zipvoice.py:358-370).
"""

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from zipvoice_tpu.parallel.mesh import batch_sharding, replicated


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def init_train_state(params, tx) -> TrainState:
    return TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    condition_drop_ratio: float = 0.2,
    dropout_rate: Optional[float] = 0.1,
    mesh=None,
    model_kwargs: Optional[dict] = None,
    jit: bool = True,
    schedules: bool = False,
    max_duration: float = 50.0,
    world_size: int = 1,
    ref_duration: float = 50.0,
    finetune: bool = False,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: dict with tokens (B,S) int32, tokens_lens (B,), features (B,T,F)
    (already feat_scale-multiplied), features_lens (B,).

    With ``mesh``, the step is jitted with the batch sharded over the 'data'
    axis and params/opt-state replicated; XLA inserts the gradient
    all-reduce over ICI (replacing the reference's DDP/NCCL allreduce).

    With ``schedules=True`` the reference's batch-count training schedules
    are active: the adjusted batch count (reference common.py:310-317) is
    derived in-graph from ``state.step``, driving scheduled dropout,
    sequence-level module skipping, const-attention, bypass clamping, and
    scheduled balancer/whitening bounds — all inside ONE compiled program
    (the count is a traced scalar).  ``dropout_rate=None`` then follows the
    reference's 0.3->0.1/20k ramp.
    """

    def step_fn(state: TrainState, batch, rng):
        B, T, F = batch["features"].shape
        rng = jax.random.fold_in(rng, state.step)
        k_t, k_noise, k_mask, k_drop, k_dropout, k_reg, k_skip = (
            jax.random.split(rng, 7)
        )
        t = jax.random.uniform(k_t, (B, 1, 1))
        noise = jax.random.normal(k_noise, (B, T, F))
        cond_drop = jax.random.uniform(k_drop, (B,)) <= condition_drop_ratio

        batch_count = None
        if schedules:
            from zipvoice_tpu.ops.schedule import adjusted_batch_count

            batch_count = adjusted_batch_count(
                state.step.astype(jnp.float32),
                max_duration=max_duration,
                world_size=world_size,
                ref_duration=ref_duration,
                finetune=finetune,
            )

        def loss_fn(params):
            return model.apply(
                {"params": params},
                tokens=batch["tokens"],
                tokens_lens=batch["tokens_lens"],
                features=batch["features"],
                features_lens=batch["features_lens"],
                noise=noise,
                t=t,
                condition_drop_mask=cond_drop,
                rng=k_mask,
                train=True,
                dropout_rate=dropout_rate,
                batch_count=batch_count,
                rngs={"dropout": k_dropout, "reg": k_reg, "skip": k_skip},
                **(model_kwargs or {}),
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    if not jit:
        # raw step (e.g. to scan several steps inside one program)
        return step_fn

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = replicated(mesh)
    data = batch_sharding(mesh)
    state_sh = TrainState(params=repl, opt_state=repl, step=repl)
    batch_sh = {
        "tokens": data, "tokens_lens": data, "features": data,
        "features_lens": data,
    }
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def make_eval_step(model) -> Callable:
    """Validation loss with the reference's stratified t grid
    (train_zipvoice.py:462-467: t_i = i/B) and a fixed rng."""

    @jax.jit
    def eval_step(params, batch, rng):
        B, T, F = batch["features"].shape
        k_noise, k_mask = jax.random.split(rng)
        t = (jnp.arange(B, dtype=jnp.float32) / B)[:, None, None]
        noise = jax.random.normal(k_noise, (B, T, F))
        return model.apply(
            {"params": params},
            tokens=batch["tokens"],
            tokens_lens=batch["tokens_lens"],
            features=batch["features"],
            features_lens=batch["features_lens"],
            noise=noise,
            t=t,
            rng=k_mask,
            train=False,
        )

    return eval_step
