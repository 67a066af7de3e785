"""End-to-end ZipVoice model parity vs the reference (random weights, CPU).

Covers: text embedding + average-duration upsampling, duration prediction,
Euler solver with time-dependent CFG, distill (guidance-embedding) path, and
the training flow-matching loss.
"""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

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


def _models(distill=False):
    from zipvoice.models.zipvoice import ZipVoice as RefZipVoice
    from zipvoice_tpu.models.zipvoice import ZipVoice, ZipVoiceDistill
    from zipvoice_tpu.utils.convert import convert_zipvoice

    torch.manual_seed(0)
    if distill:
        from zipvoice.models.zipvoice_distill import ZipVoiceDistill as RefDistill

        ref = RefDistill(**TINY)
        ours = ZipVoiceDistill(**TINY)
    else:
        ref = RefZipVoice(**TINY)
        ours = ZipVoice(**TINY)
    ref.eval()
    params = {"params": convert_zipvoice(ref.state_dict())}
    return ref, ours, params


def _sample_inputs():
    rng = np.random.RandomState(3)
    tokens = [[5, 7, 9, 11, 2], [4, 6, 8]]
    prompt_tokens = [[1, 3], [2, 5, 7]]
    Tp = 11
    prompt_features = rng.randn(2, Tp, TINY["feat_dim"]).astype(np.float32)
    prompt_features_lens = np.array([11, 7], dtype=np.int64)
    return tokens, prompt_tokens, prompt_features, prompt_features_lens, rng


@requires_reference
@pytest.mark.parametrize("guidance_scale", [0.0, 1.0])
def test_sample_parity(guidance_scale):
    from zipvoice_tpu.frontend.batch import pad_tokens
    from zipvoice_tpu.models.conditioning import predict_features_lens
    from zipvoice_tpu.models.zipvoice import strip_prompt

    ref, ours, params = _models()
    tokens, prompt_tokens, prompt_features, prompt_features_lens, rng = (
        _sample_inputs()
    )

    # deterministic x0: patch torch.randn so both sides get identical noise
    cat_lens = [len(p) + len(t) for p, t in zip(prompt_tokens, tokens)]
    ptl = np.array([len(p) for p in prompt_tokens], dtype=np.int64)
    tl = np.array([len(t) for t in tokens], dtype=np.int64)
    feat_lens = predict_features_lens(
        jnp.asarray(prompt_features_lens), jnp.asarray(ptl), jnp.asarray(tl), 1.0
    )
    T = int(np.asarray(feat_lens).max())
    noise = rng.randn(2, T, TINY["feat_dim"]).astype(np.float32)

    orig_randn = torch.randn
    torch.randn = lambda *s, **kw: torch.from_numpy(noise)
    try:
        with torch.no_grad():
            ref_wo, ref_wo_lens, _, _ = ref.sample(
                tokens=tokens,
                prompt_tokens=prompt_tokens,
                prompt_features=torch.from_numpy(prompt_features),
                prompt_features_lens=torch.from_numpy(prompt_features_lens),
                speed=1.0,
                t_shift=0.5,
                duration="predict",
                num_step=4,
                guidance_scale=guidance_scale,
            )
    finally:
        torch.randn = orig_randn

    cat_tokens = [p + t for p, t in zip(prompt_tokens, tokens)]
    tok, tok_lens = pad_tokens(cat_tokens, pad_id=TINY["pad_id"])
    pf = np.zeros((2, T, TINY["feat_dim"]), dtype=np.float32)
    pf[:, : prompt_features.shape[1]] = prompt_features

    x1, padding_mask = ours.apply(
        params,
        tokens=jnp.asarray(tok),
        tokens_lens=jnp.asarray(tok_lens),
        prompt_tokens_lens=jnp.asarray(ptl),
        prompt_features=jnp.asarray(pf),
        prompt_features_lens=jnp.asarray(prompt_features_lens),
        features_lens=feat_lens,
        noise=jnp.asarray(noise),
        num_step=4,
        guidance_scale=guidance_scale,
        t_shift=0.5,
        method="sample",
    )
    x1_wo, wo_lens = strip_prompt(
        x1, padding_mask, jnp.asarray(prompt_features_lens)
    )

    np.testing.assert_array_equal(np.asarray(wo_lens), ref_wo_lens.numpy())
    ref_np = ref_wo.numpy()
    ours_np = np.asarray(x1_wo)[:, : ref_np.shape[1]]
    for i in range(2):
        L = int(ref_wo_lens[i])
        np.testing.assert_allclose(
            ours_np[i, :L], ref_np[i, :L], atol=5e-3, rtol=1e-3
        )


@requires_reference
def test_sample_parity_distill():
    """Distill path: guidance scale fed to the network, no CFG doubling."""
    from zipvoice_tpu.frontend.batch import pad_tokens
    from zipvoice_tpu.models.conditioning import make_pad_mask

    ref, ours, params = _models(distill=True)
    rng = np.random.RandomState(5)
    tokens = [[5, 7, 9, 11], [4, 6, 8, 2]]
    B, T = 2, 17
    features = rng.randn(B, T, TINY["feat_dim"]).astype(np.float32)
    features_lens = np.array([17, 13], dtype=np.int64)
    noise = rng.randn(B, T, TINY["feat_dim"]).astype(np.float32)
    scm = np.asarray(
        make_pad_mask(jnp.asarray(np.array([5, 4])), T)
    )  # condition on first frames

    gs = torch.full((B, 1, 1), 3.0)
    with torch.no_grad():
        ref_x, ref_lens = ref.sample_intermediate(
            tokens=tokens,
            features=torch.from_numpy(features),
            features_lens=torch.from_numpy(features_lens),
            noise=torch.from_numpy(noise),
            speech_condition_mask=torch.from_numpy(scm),
            t_start=0.0,
            t_end=1.0,
            num_step=2,
            guidance_scale=gs,
        )

    tok, tok_lens = pad_tokens(tokens, pad_id=0)
    x, padding_mask = ours.apply(
        params,
        tokens=jnp.asarray(tok),
        tokens_lens=jnp.asarray(tok_lens),
        features=jnp.asarray(features),
        features_lens=jnp.asarray(features_lens),
        noise=jnp.asarray(noise),
        speech_condition_mask=jnp.asarray(scm),
        t_start=0.0,
        t_end=1.0,
        num_step=2,
        guidance_scale=3.0,
        method="sample_intermediate",
    )
    lens = np.sum(~np.asarray(padding_mask), axis=-1)
    np.testing.assert_array_equal(lens, ref_lens.numpy())
    ref_np = ref_x.numpy()
    ours_np = np.asarray(x)
    for i in range(B):
        L = int(ref_lens[i])
        np.testing.assert_allclose(
            ours_np[i, :L], ref_np[i, :L], atol=5e-3, rtol=1e-3
        )


@requires_reference
def test_training_loss_parity():
    """Flow-matching training loss with a pinned speech-condition mask."""
    import zipvoice.models.zipvoice as ref_mod

    ref, ours, params = _models()
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

    orig = ref_mod.condition_time_mask
    ref_mod.condition_time_mask = (
        lambda features_lens, mask_percent, max_len: torch.from_numpy(scm)
    )
    try:
        with torch.no_grad():
            ref_loss = ref(
                tokens=tokens,
                features=torch.from_numpy(features),
                features_lens=torch.from_numpy(features_lens),
                noise=torch.from_numpy(noise),
                t=torch.from_numpy(t),
                condition_drop_ratio=0.0,
            ).item()
    finally:
        ref_mod.condition_time_mask = orig

    from zipvoice_tpu.frontend.batch import pad_tokens

    tok, tok_lens = pad_tokens(tokens, pad_id=0)
    loss = ours.apply(
        params,
        tokens=jnp.asarray(tok),
        tokens_lens=jnp.asarray(tok_lens),
        features=jnp.asarray(features),
        features_lens=jnp.asarray(features_lens),
        noise=jnp.asarray(noise),
        t=jnp.asarray(t),
        speech_condition_mask=jnp.asarray(scm),
        train=False,
    )
    np.testing.assert_allclose(float(loss), ref_loss, atol=1e-4, rtol=1e-4)
