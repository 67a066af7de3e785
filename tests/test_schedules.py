"""Training-schedule (ScheduledFloat) parity vs the reference.

Covers:
- PiecewiseLinear evaluation parity (python + traced) vs the reference class;
- every schedule table in ops/schedule.py against the ScheduledFloat
  instances a reference TTSZipformer actually constructs (incl. the
  per-layer layerdrop warmup ramps);
- full train-mode loss + gradient parity of the ZipVoice model at batch
  counts {0, 2000, 20000} with all stochastic gates pinned (coins fire, all
  keep-masks keep), comparing the complete parameter-gradient tree through
  the checkpoint converter;
- the scheduled train step compiles ONCE (the batch count is a traced
  scalar, not a static recompile trigger).
"""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from zipvoice_tpu.ops import schedule as sched

torch = pytest.importorskip("torch")


def test_piecewise_linear_matches_reference():
    from zipvoice.models.modules.scaling import PiecewiseLinear as RefPL

    pairs = ((0.0, 0.2), (4000.0, 0.05), (16000.0, 0.0))
    ours = sched.PiecewiseLinear(pairs)
    ref = RefPL(*pairs)
    xs = [-5.0, 0.0, 1.0, 1999.5, 4000.0, 9000.0, 16000.0, 1e6]
    for x in xs:
        assert abs(ours(x) - ref(x)) < 1e-12, x
        # traced evaluation agrees with the python one
        traced = float(jax.jit(ours)(jnp.asarray(x)))
        assert abs(traced - ref(x)) < 1e-5, x


def _pairs(ref_scheduled):
    return tuple(ref_scheduled.schedule.pairs)


@requires_reference
def test_schedule_tables_match_reference_model():
    """Build a reference TTSZipformer and check every ScheduledFloat it
    holds against our static tables (reference zipformer.py:328-346,
    421-451,688-699,760,1089,1117-1137,1354,1428,1470-1495,1592-1626)."""
    from zipvoice.models.modules.zipformer import TTSZipformer as RefTTS

    ds = (1, 2, 1)
    n_layers = (2, 1, 2)
    ref = RefTTS(
        in_dim=12, out_dim=12, downsampling_factor=list(ds),
        num_encoder_layers=list(n_layers), cnn_module_kernel=7,
        encoder_dim=32, query_head_dim=8, pos_head_dim=4, value_head_dim=4,
        num_heads=2, feedforward_dim=32, pos_dim=16, time_embed_dim=16,
    )

    def enc(i):
        e = ref.encoders[i]
        return e.encoder if ds[i] != 1 else e

    for i in range(len(ds)):
        encoder = enc(i)
        n = len(ds)
        warmup_begin = 4000.0 * (i + 1) / (n + 1)
        warmup_end = 4000.0 * (i + 2) / (n + 1)
        for j, layer in enumerate(encoder.layers):
            # per-layer layerdrop ramp
            ours = sched.layerdrop_schedule(
                warmup_begin, warmup_end, n_layers[i], j,
                final_layerdrop_rate=0.035 * (ds[i] ** 0.5),
            )
            assert _pairs(layer.bypass.skip_rate) == ours.schedule.pairs, (
                i, j, _pairs(layer.bypass.skip_rate), ours.schedule.pairs)
            # layer-level schedules
            assert _pairs(layer.attention_skip_rate) == \
                sched.ATTENTION_SKIP.schedule.pairs
            assert _pairs(layer.conv_skip_rate) == \
                sched.CONV_SKIP.schedule.pairs
            assert _pairs(layer.const_attention_rate) == \
                sched.CONST_ATTENTION.schedule.pairs
            assert _pairs(layer.ff2_skip_rate) == \
                sched.FF2_SKIP.schedule.pairs
            assert _pairs(layer.ff3_skip_rate) == \
                sched.FF3_SKIP.schedule.pairs
            assert _pairs(layer.bypass.scale_min) == \
                sched.BYPASS_SCALE_MIN.schedule.pairs
            # scheduled balancer bounds
            assert _pairs(layer.balancer_na.min_abs) == \
                sched.BALANCER_NA_MIN_ABS.schedule.pairs
            assert _pairs(layer.balancer_ff2.min_abs) == \
                sched.BALANCER_FF2_MIN_ABS.schedule.pairs
            assert _pairs(layer.balancer_ff3.min_abs) == \
                sched.BALANCER_FF3_MIN_ABS.schedule.pairs
            assert _pairs(layer.balancer1.prob) == \
                sched.BALANCER_PROB.schedule.pairs
            # whitening limits
            assert _pairs(layer.whiten.whitening_limit) == \
                sched.WHITEN_LAYER.schedule.pairs
            assert _pairs(layer.feed_forward2.out_whiten.whitening_limit) \
                == sched.WHITEN_FF.schedule.pairs
            assert _pairs(
                layer.self_attn_weights.whiten_keys.whitening_limit
            ) == sched.WHITEN_KEYS.schedule.pairs
            assert _pairs(layer.self_attn_weights.pos_emb_skip_rate) == \
                sched.POS_EMB_SKIP.schedule.pairs
            assert _pairs(layer.self_attn1.whiten.whitening_limit) == \
                sched.WHITEN_SELF_ATTN.schedule.pairs
            assert _pairs(layer.nonlin_attention.whiten1.whitening_limit) \
                == sched.WHITEN_NONLIN.schedule.pairs
            assert _pairs(layer.nonlin_attention.whiten2.whitening_limit) \
                == sched.WHITEN_NONLIN2.schedule.pairs
            assert _pairs(layer.nonlin_attention.balancer.min_positive) == \
                sched.NONLIN_MIN_POSITIVE.schedule.pairs
            assert _pairs(layer.nonlin_attention.balancer.max_positive) == \
                sched.NONLIN_MAX_POSITIVE.schedule.pairs
            assert _pairs(layer.conv_module1.balancer1.min_positive) == \
                sched.CONV_B1_MIN_POSITIVE.schedule.pairs
            assert _pairs(layer.conv_module1.balancer1.max_abs) == \
                sched.CONV_B1_MAX_ABS.schedule.pairs
            assert _pairs(layer.conv_module2.balancer2.min_positive) == \
                sched.CONV_B2_MIN_POSITIVE.schedule.pairs
            assert _pairs(layer.conv_module2.balancer2.min_abs) == \
                sched.CONV_B2_MIN_ABS.schedule.pairs
            assert _pairs(layer.conv_module1.whiten.whitening_limit) == \
                sched.WHITEN_CONV.schedule.pairs
            # scheduled FF dropout (consumed by ActivationDropoutAndLinear)
            assert _pairs(layer.feed_forward2.out_proj.dropout_p) == \
                sched.DROPOUT.schedule.pairs

    # adjusted batch count formula (reference common.py:310-317 quantized
    # every 10 batches, train_zipvoice.py:553-557)
    for step in (0, 7, 10, 123, 5000):
        expect = (step // 10 * 10) * (250.0 * 2) / 50.0
        got = sched.adjusted_batch_count(step, 250.0, world_size=2)
        assert got == expect, (step, got, expect)
    assert sched.adjusted_batch_count(
        40, 250.0, finetune=True
    ) == 40 * 5 + 100000


# ---------------------------------------------------------------------------
# Full-model loss + grad parity under active schedules
# ---------------------------------------------------------------------------

TINY = dict(
    fm_decoder_downsampling_factor=[1, 2, 1],
    fm_decoder_num_layers=[1, 1, 1],
    fm_decoder_cnn_module_kernel=[7, 7, 7],
    fm_decoder_feedforward_dim=96,
    fm_decoder_num_heads=4,
    fm_decoder_dim=64,
    text_encoder_num_layers=1,
    text_encoder_feedforward_dim=64,
    text_encoder_cnn_module_kernel=5,
    text_encoder_num_heads=4,
    text_encoder_dim=32,
    time_embed_dim=32,
    text_embed_dim=32,
    query_head_dim=8,
    value_head_dim=12,
    pos_head_dim=4,
    pos_dim=48,
    feat_dim=20,
    vocab_size=30,
    pad_id=0,
)


@requires_reference
@pytest.mark.parametrize("batch_count", [0.0, 2000.0, 20000.0])
def test_scheduled_train_grad_parity(batch_count, monkeypatch):
    """Train-mode loss and the FULL parameter-gradient tree match the
    reference at several points of the schedule, with every stochastic gate
    pinned: coins read 0.0 (const-attention ON, pos-emb term per its
    schedule, every balancer/whiten/penalty applied) and keep-masks read
    0.97 (sequence skips keep; layerdrop keeps).  Dropout is pinned OFF on
    both sides (the reference's no-k2 fallback never applies FF dropout,
    scaling.py:1338-1349).

    This exercises the deterministic scheduled machinery end to end:
    bypass-scale clamping against the scheduled scale_min, scheduled
    balancer bounds, scheduled whitening limits, const-attention weight
    replacement, and the pos-emb-skip schedule — through both forward and
    backward."""
    import random as pyrandom

    import zipvoice.models.modules.scaling as ref_scaling
    import zipvoice.models.zipvoice as ref_mod
    import zipvoice_tpu.models.zipformer as zf

    from zipvoice.utils.common import set_batch_count
    from zipvoice_tpu.frontend.batch import pad_tokens
    from zipvoice_tpu.models.zipvoice import ZipVoice
    from zipvoice_tpu.utils.convert import convert_zipvoice

    from zipvoice.models.zipvoice import ZipVoice as RefZipVoice

    torch.manual_seed(0)
    ref = RefZipVoice(**TINY)
    params = {"params": convert_zipvoice(ref.state_dict())}
    ours = ZipVoice(**TINY)

    rng = np.random.RandomState(11)
    tokens = [[5, 7, 9], [4, 6, 8, 2, 3]]
    B, T = 2, 19
    features = rng.randn(B, T, TINY["feat_dim"]).astype(np.float32)
    features_lens = np.array([19, 15], dtype=np.int64)
    noise = rng.randn(B, T, TINY["feat_dim"]).astype(np.float32)
    t = rng.rand(B, 1, 1).astype(np.float32)
    scm = (np.arange(T)[None, :] >= np.array([[6], [4]])) & (
        np.arange(T)[None, :] < np.array([[16], [13]])
    )

    # --- pin all randomness ---
    monkeypatch.setattr(pyrandom, "random", lambda: 0.0)
    real_rand = torch.rand

    def fake_rand(*shape, **kw):
        if shape and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        kw.pop("generator", None)
        return torch.full(
            shape, 0.97,
            device=kw.get("device"), dtype=kw.get("dtype") or torch.float32,
        )

    monkeypatch.setattr(torch, "rand", fake_rand)
    monkeypatch.setattr(
        torch.nn.functional, "dropout",
        lambda x, p=0.5, training=False, inplace=False: x,
    )
    # ours: coins (shape ()) read 0.0, keep-masks read 0.97; regularizer
    # coin-gates always apply
    monkeypatch.setattr(
        zf, "_rand_uniform",
        lambda rng_, shape: (
            jnp.zeros(shape) if shape == () else jnp.full(shape, 0.97)
        ),
    )
    monkeypatch.setattr(zf, "_stochastic", lambda m, p, fn, x: fn(x))
    # balancers are pinned OFF here: their per-channel violation gate is a
    # knife edge (stats land within 1e-7 of the bounds on random data), so
    # cross-framework float noise flips channels discretely and the diff is
    # not meaningful.  Scheduled balancer-bound grads are covered exactly in
    # test_scheduled_balancer_bounds_parity below.
    monkeypatch.setattr(zf, "balancer", lambda x, *a, **k: x)
    monkeypatch.setattr(ref_scaling.Balancer, "forward", lambda self, x: x)
    monkeypatch.setattr(
        ref_mod, "condition_time_mask",
        lambda features_lens, mask_percent, max_len: torch.from_numpy(scm),
    )
    # the reference's no-k2 Swoosh fallback stores its derivative uint8-
    # quantized with randomized rounding (scaling.py:1060-1086), a memory
    # trick that injects ~0.4% noise into torch's time-embed grads; replace
    # with the exact formula so both sides backprop the true derivative
    monkeypatch.setattr(
        ref_scaling.SwooshL, "forward",
        lambda self, x: torch.logaddexp(
            torch.zeros((), dtype=x.dtype), x - 4.0
        ) - 0.08 * x - 0.035,
    )
    monkeypatch.setattr(
        ref_scaling.SwooshR, "forward",
        lambda self, x: torch.logaddexp(
            torch.zeros((), dtype=x.dtype), x - 1.0
        ) - 0.08 * x - 0.313261687,
    )

    # --- reference: train mode, batch count set, full backward ---
    ref.train()
    set_batch_count(ref, batch_count)
    feats_t = torch.from_numpy(features).requires_grad_(True)
    ref_loss = ref(
        tokens=tokens,
        features=feats_t,
        features_lens=torch.from_numpy(features_lens),
        noise=torch.from_numpy(noise),
        t=torch.from_numpy(t),
        condition_drop_ratio=0.0,
    )
    ref_loss.backward()
    ref_grads = {
        name: p.grad if p.grad is not None else torch.zeros_like(p)
        for name, p in ref.named_parameters()
    }
    ref_grad_tree = convert_zipvoice(ref_grads)
    ref_feat_grad = feats_t.grad.numpy()
    monkeypatch.setattr(torch, "rand", real_rand)

    # --- ours: same batch, traced batch count, jax.grad ---
    tok, tok_lens = pad_tokens(tokens, pad_id=0)
    rngs = {
        "dropout": jax.random.PRNGKey(1),
        "reg": jax.random.PRNGKey(2),
        "skip": jax.random.PRNGKey(3),
    }

    def loss_fn(p, feats):
        return ours.apply(
            {"params": p},
            tokens=jnp.asarray(tok),
            tokens_lens=jnp.asarray(tok_lens),
            features=feats,
            features_lens=jnp.asarray(features_lens),
            noise=jnp.asarray(noise),
            t=jnp.asarray(t),
            speech_condition_mask=jnp.asarray(scm),
            train=True,
            dropout_rate=0.0,
            batch_count=jnp.asarray(batch_count, jnp.float32),
            rngs=rngs,
        )

    loss, (grads, feat_grad) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        params["params"], jnp.asarray(features)
    )

    np.testing.assert_allclose(
        float(loss), float(ref_loss.detach()), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(feat_grad), ref_feat_grad, atol=2e-5, rtol=1e-3
    )

    flat_ours = jax.tree_util.tree_flatten_with_path(grads)[0]
    ref_flat = {
        jax.tree_util.keystr(kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(ref_grad_tree)[0]
    }
    checked = 0
    for kp, v in flat_ours:
        key = jax.tree_util.keystr(kp)
        assert key in ref_flat, f"missing reference grad for {key}"
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref_flat[key]),
            atol=1e-4, rtol=2e-3, err_msg=f"{key} @ bc={batch_count}",
        )
        checked += 1
    assert checked > 50  # whole tree compared


@requires_reference
@pytest.mark.parametrize("batch_count", [0.0, 2000.0, 20000.0])
def test_scheduled_balancer_bounds_parity(batch_count):
    """Balancer gradients with SCHEDULED bounds match the reference exactly
    at several batch counts, for every scheduled-balancer site in the model
    (reference zipformer.py:416-446,1467-1474,1589-1619).  Inputs are scaled
    and shifted so min_abs / positivity violations actually fire."""
    import random as pyrandom

    from zipvoice.models.modules.scaling import (
        Balancer as RefBalancer,
        ScheduledFloat as RefSF,
    )
    from zipvoice.utils.common import set_batch_count
    from zipvoice_tpu.ops.scaling import balancer

    rng = np.random.RandomState(7)
    # small-amplitude, positively-shifted data violates min_abs bounds and
    # positivity bounds at various batch counts
    x = (0.15 * rng.randn(3, 7, 16) + 0.05).astype(np.float32)
    g = rng.randn(3, 7, 16).astype(np.float32)

    def sf(s):
        return RefSF(*s.schedule.pairs, default=s.default)

    SITES = [
        ("na", 0.3, 0.7, sf(sched.BALANCER_NA_MIN_ABS), 100.0),
        ("ff2", 0.3, 0.7, sf(sched.BALANCER_FF2_MIN_ABS), 2.0),
        ("ff3", 0.3, 0.7, sf(sched.BALANCER_FF3_MIN_ABS), 4.0),
        ("nonlin", sf(sched.NONLIN_MIN_POSITIVE),
         sf(sched.NONLIN_MAX_POSITIVE), 0.5, 5.0),
        ("conv_b1", sf(sched.CONV_B1_MIN_POSITIVE), 1.0, 1.5,
         sf(sched.CONV_B1_MAX_ABS)),
        ("conv_b2", sf(sched.CONV_B2_MIN_POSITIVE), 1.0,
         sf(sched.CONV_B2_MIN_ABS), 10.0),
    ]
    real_random = pyrandom.random
    pyrandom.random = lambda: 0.0  # always apply
    fired = 0
    try:
        for name, mnp, mxp, mna, mxa in SITES:
            ref = RefBalancer(
                16, channel_dim=-1, min_positive=mnp, max_positive=mxp,
                min_abs=mna, max_abs=mxa, grad_scale=0.04, prob=1.0,
            )
            ref.train()
            set_batch_count(ref, batch_count)
            xt = torch.from_numpy(x).requires_grad_(True)
            ref(xt).backward(torch.from_numpy(g))
            tgrad = xt.grad.numpy()

            def res(v):
                return (
                    sched.ScheduledFloat(
                        sched.PiecewiseLinear(v.schedule.pairs), v.default
                    )(batch_count)
                    if isinstance(v, RefSF) else v
                )

            def f(v):
                return jnp.vdot(
                    balancer(
                        v, res(mnp), res(mxp), res(mna), res(mxa), 0.04
                    ),
                    jnp.asarray(g),
                )

            jgrad = np.asarray(jax.grad(f)(jnp.asarray(x)))
            if np.abs(tgrad - g).max() > 1e-4:
                fired += 1  # this site's violation actually modified grads
            np.testing.assert_allclose(
                jgrad, tgrad, atol=1e-6, rtol=1e-4,
                err_msg=f"{name} @ bc={batch_count}",
            )
    finally:
        pyrandom.random = real_random
    assert fired >= 2, f"only {fired} sites fired; test is near-vacuous"


def test_scheduled_step_compiles_once():
    """The scheduled train step is ONE compiled program across the whole
    run: step indices 0, 1, 2 and 999999 hit the same executable."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _TINY_CFG
    from zipvoice_tpu.models.zipvoice import ZipVoice
    from zipvoice_tpu.train.optim import scaled_adam
    from zipvoice_tpu.train.train_step import (
        TrainState,
        init_train_state,
        make_train_step,
    )

    model = ZipVoice(**_TINY_CFG)
    B, T, F = 2, 24, model.feat_dim
    rng = np.random.RandomState(0)
    batch = {
        "tokens": np.tile(np.array([[3, 5, 7, 2, 0, 0]], np.int32), (B, 1)),
        "tokens_lens": np.full((B,), 4, np.int32),
        "features": rng.randn(B, T, F).astype(np.float32),
        "features_lens": np.full((B,), T, np.int32),
    }
    params = model.init(
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
    tx = scaled_adam(lr=0.01)
    step = make_train_step(
        model, tx, condition_drop_ratio=0.0, dropout_rate=None,
        schedules=True, max_duration=50.0,
    )
    state = init_train_state(params, tx)
    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(3):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    state = TrainState(
        params=state.params, opt_state=state.opt_state,
        step=jnp.asarray(999999, jnp.int32),
    )
    state, m = step(state, batch, key)
    losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert step._cache_size() == 1, step._cache_size()
