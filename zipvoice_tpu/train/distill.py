"""Distillation training step (reference zipvoice/bin/train_zipvoice_distill.py).

The teacher advances two chained 1-step solves t -> t+d1 -> t+d1+d2 (no
grad); the student is trained to match the implied average velocity of a
single 1-step solve over [t, t_dest] (reference :378-515):

- stage "first": teacher is the (frozen, averaged) base ZipVoice run with
  CFG; guidance_scale ~ U[0,2).
- stage "second": teacher is an EMA copy of the student (decay configurable,
  applied every batch, :650); guidance_scale ~ U[1,3).

t, d1, d2 are scalars shared across the batch and drawn per step (the
reference uses python random; here jax.random inside the jitted step, so
everything stays one compiled program).
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from zipvoice_tpu.models.conditioning import condition_time_mask, make_pad_mask
from zipvoice_tpu.train.train_step import TrainState


def ema_update(ema_params, new_params, decay: float):
    """ema <- ema*decay + new*(1-decay) (reference :365-375)."""
    return jax.tree.map(
        lambda e, p: e * decay + p * (1 - decay), ema_params, new_params
    )


def make_distill_train_step(
    student_model,
    teacher_model,
    tx: optax.GradientTransformation,
    stage: str = "first",
    mesh=None,
    schedules: bool = True,
    max_duration: float = 250.0,
    ref_duration: float = 50.0,
) -> Callable:
    """Returns step(state, teacher_params, batch, rng) -> (state, metrics).

    ``teacher_model``: base ZipVoice for stage "first" (CFG teacher),
    the student model class for stage "second" (EMA teacher params passed
    in ``teacher_params``).

    With ``schedules`` (default on, matching the reference) the STUDENT
    forward runs in train mode with the schedule clock at
    adjusted_batch_count + 100000 — every ramp is past its end, so dropout
    is 0.1, module skips are ~0, and the regularizer bounds/limits sit at
    their final values (reference train_zipvoice_distill.py:564,589).  The
    teacher always runs in eval mode (:958).
    """
    assert stage in ("first", "second"), stage
    teacher_distill = stage == "second"

    def step_fn(state: TrainState, teacher_params, batch, rng):
        B, T, F = batch["features"].shape
        features = batch["features"]
        features_lens = batch["features_lens"]
        rng = jax.random.fold_in(rng, state.step)
        (k_noise, k_t, k_d1, k_d2, k_gs, k_mask, k_dropout, k_reg,
         k_skip) = jax.random.split(rng, 9)

        batch_count = None
        student_train = {}
        if schedules:
            from zipvoice_tpu.ops.schedule import adjusted_batch_count

            batch_count = adjusted_batch_count(
                state.step.astype(jnp.float32),
                max_duration=max_duration,
                ref_duration=ref_duration,
                finetune=True,
            )
            student_train = dict(
                train=True, dropout_rate=None, batch_count=batch_count
            )

        noise = jax.random.normal(k_noise, (B, T, F))
        t_value = jax.random.uniform(k_t)
        t = jnp.broadcast_to(t_value, (B, 1, 1))
        if stage == "first":
            guidance_scale = jax.random.uniform(k_gs, (B, 1, 1)) * 2.0
        else:
            guidance_scale = jax.random.uniform(k_gs, (B, 1, 1)) * 2.0 + 1.0
        xt = features * t + noise * (1 - t)
        t_delta_fix = jax.random.uniform(k_d1) * jnp.minimum(0.3, 1 - t_value)
        t_delta_ema = jax.random.uniform(k_d2) * jnp.minimum(
            0.3, 1 - t_value - t_delta_fix
        )
        t_dest = t_value + t_delta_fix + t_delta_ema

        speech_condition_mask = condition_time_mask(
            k_mask, features_lens, T, mask_percent=(0.7, 1.0)
        )

        common = dict(
            tokens=batch["tokens"], tokens_lens=batch["tokens_lens"],
            features=features, features_lens=features_lens,
            speech_condition_mask=speech_condition_mask, num_step=1,
            guidance_scale=guidance_scale,
        )

        # teacher: two chained 1-step solves, no grad
        teacher_x_mid, _ = teacher_model.apply(
            {"params": teacher_params}, noise=xt, t_start=t_value,
            t_end=t_value + t_delta_fix, distill=teacher_distill,
            method="sample_intermediate", **common,
        )
        target_x1, _ = teacher_model.apply(
            {"params": teacher_params}, noise=teacher_x_mid,
            t_start=t_value + t_delta_fix, t_end=t_dest,
            distill=teacher_distill, method="sample_intermediate", **common,
        )
        target_x1 = jax.lax.stop_gradient(target_x1)

        padding_mask = make_pad_mask(features_lens, T)
        loss_mask = speech_condition_mask & (~padding_mask)
        denom_t = t_dest - t_value

        def loss_fn(params):
            pred_x1, _ = student_model.apply(
                {"params": params}, noise=xt, t_start=t_value, t_end=t_dest,
                distill=True, method="sample_intermediate",
                rngs={"dropout": k_dropout, "reg": k_reg, "skip": k_skip},
                **student_train, **common,
            )
            pred_v = (pred_x1 - xt) / denom_t
            target_v = (target_x1 - xt) / denom_t
            se = jnp.sum(
                jnp.square(pred_v - target_v) * loss_mask[:, :, None]
            )
            d = jnp.maximum(jnp.sum(loss_mask) * F, 1)
            loss = se / d
            ut = features - noise
            ref_se = jnp.sum(jnp.square(pred_v - ut) * loss_mask[:, :, None])
            return loss, ref_se / d

        (loss, ref_loss), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = {
            "loss": loss,
            "ref_loss": ref_loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    from zipvoice_tpu.parallel.mesh import batch_sharding, replicated

    repl = replicated(mesh)
    data = batch_sharding(mesh)
    state_sh = TrainState(params=repl, opt_state=repl, step=repl)
    batch_sh = {
        "tokens": data, "tokens_lens": data, "features": data,
        "features_lens": data,
    }
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, repl, batch_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
