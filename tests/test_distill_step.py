"""Distillation training step: runs, finite, and decreases the distill loss
on a fixed tiny batch (stage first: frozen base teacher; stage second: EMA)."""

import numpy as np

import conftest  # noqa: F401

import jax
import jax.numpy as jnp


def _setup():
    from zipvoice_tpu.models.zipvoice import ZipVoice, ZipVoiceDistill
    from __graft_entry__ import _TINY_CFG

    student = ZipVoiceDistill(**_TINY_CFG)
    teacher = ZipVoice(**_TINY_CFG)
    B, T, F = 4, 24, student.feat_dim
    rng = np.random.RandomState(0)
    batch = {
        "tokens": np.tile(np.array([[3, 5, 7, 2, 0, 0]], np.int32), (B, 1)),
        "tokens_lens": np.full((B,), 4, np.int32),
        "features": rng.randn(B, T, F).astype(np.float32),
        "features_lens": np.full((B,), T, np.int32),
    }
    t_params = teacher.init(
        {"params": jax.random.PRNGKey(0)},
        tokens=jnp.asarray(batch["tokens"]),
        tokens_lens=jnp.asarray(batch["tokens_lens"]),
        features=jnp.asarray(batch["features"]),
        features_lens=jnp.asarray(batch["features_lens"]),
        noise=jnp.zeros((B, T, F)),
        t=jnp.full((B, 1, 1), 0.5),
        rng=jax.random.PRNGKey(1),
        train=False,
    )["params"]
    # student: init via sample_intermediate so the guidance-scale-embed
    # params exist
    s_params = student.init(
        {"params": jax.random.PRNGKey(2)},
        tokens=jnp.asarray(batch["tokens"]),
        tokens_lens=jnp.asarray(batch["tokens_lens"]),
        features=jnp.asarray(batch["features"]),
        features_lens=jnp.asarray(batch["features_lens"]),
        noise=jnp.zeros((B, T, F)),
        speech_condition_mask=jnp.zeros((B, T), bool),
        t_start=0.0,
        t_end=1.0,
        num_step=1,
        guidance_scale=1.0,
        method="sample_intermediate",
    )["params"]
    return student, teacher, s_params, t_params, batch


def test_distill_stage_first_and_second():
    from zipvoice_tpu.train.distill import ema_update, make_distill_train_step
    from zipvoice_tpu.train.optim import scaled_adam
    from zipvoice_tpu.train.train_step import init_train_state

    student, teacher, s_params, t_params, batch = _setup()
    tx = scaled_adam(lr=0.03)
    state = init_train_state(s_params, tx)
    step1 = make_distill_train_step(student, teacher, tx, stage="first")

    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(6):
        state, m = step1(state, t_params, batch, key)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert min(losses[2:]) < losses[0], losses

    # stage second: teacher = EMA of student (same class)
    ema_params = jax.tree.map(jnp.copy, state.params)
    step2 = make_distill_train_step(student, student, tx, stage="second")
    for _ in range(2):
        state, m = step2(state, ema_params, batch, key)
        ema_params = ema_update(ema_params, state.params, decay=0.99)
    assert np.isfinite(float(m["loss"]))
