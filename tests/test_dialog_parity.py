"""ZipVoice-Dialog / Dialog-Stereo parity vs the reference (random weights)."""

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
    vocab_size=40,
    pad_id=0,
    spk_a_id=36,
    spk_b_id=37,
)


@requires_reference
def test_dialog_loss_parity():
    import zipvoice.models.zipvoice_dialog as ref_mod
    from zipvoice_tpu.frontend.batch import pad_tokens
    from zipvoice_tpu.models.dialog import ZipVoiceDialog
    from zipvoice_tpu.utils.convert import convert_zipvoice

    torch.manual_seed(0)
    ref = ref_mod.ZipVoiceDialog(**TINY)
    ref.eval()
    ours = ZipVoiceDialog(**TINY)
    params = {"params": convert_zipvoice(ref.state_dict())}

    rng = np.random.RandomState(1)
    tokens = [[36, 5, 7, 37, 9, 11], [36, 4, 6, 8]]
    B, T, F = 2, 21, TINY["feat_dim"]
    features = rng.randn(B, T, F).astype(np.float32)
    features_lens = np.array([21, 15], dtype=np.int64)
    noise = rng.randn(B, T, F).astype(np.float32)
    t = rng.rand(B, 1, 1).astype(np.float32)
    scm = np.arange(T)[None, :] >= np.array([[8], [5]])

    orig = ref_mod.condition_time_mask_suffix
    ref_mod.condition_time_mask_suffix = (
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
        ref_mod.condition_time_mask_suffix = orig

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


@requires_reference
def test_dialog_stereo_loss_parity():
    import zipvoice.models.zipvoice_dialog as ref_mod
    from zipvoice_tpu.frontend.batch import pad_tokens
    from zipvoice_tpu.models.dialog import ZipVoiceDialogStereo
    from zipvoice_tpu.utils.convert import convert_zipvoice

    torch.manual_seed(2)
    ref = ref_mod.ZipVoiceDialogStereo(**TINY)
    ref.eval()
    ours = ZipVoiceDialogStereo(**TINY)
    params = {"params": convert_zipvoice(ref.state_dict())}

    rng = np.random.RandomState(3)
    tokens = [[36, 5, 7, 37, 9], [36, 4, 6, 8, 2]]
    B, T, F = 2, 17, TINY["feat_dim"]
    features = rng.randn(B, T, 2 * F).astype(np.float32)
    features_lens = np.array([17, 12], dtype=np.int64)
    noise = rng.randn(B, T, 2 * F).astype(np.float32)
    t = rng.rand(B, 1, 1).astype(np.float32)
    scm = np.arange(T)[None, :] >= np.array([[6], [4]])

    orig = ref_mod.condition_time_mask_suffix
    ref_mod.condition_time_mask_suffix = (
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
                se_weight=1.0,
            ).item()
    finally:
        ref_mod.condition_time_mask_suffix = orig

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
        se_weight=1.0,
    )
    np.testing.assert_allclose(float(loss), ref_loss, atol=1e-4, rtol=1e-4)


@requires_reference
def test_dialog_stereo_sample_parity():
    """Stereo inference path through the two-stream decoder."""
    import zipvoice.models.zipvoice_dialog as ref_mod
    from zipvoice_tpu.frontend.batch import pad_tokens
    from zipvoice_tpu.models.conditioning import predict_features_lens
    from zipvoice_tpu.models.dialog import ZipVoiceDialogStereo
    from zipvoice_tpu.models.zipvoice import strip_prompt
    from zipvoice_tpu.utils.convert import convert_zipvoice

    torch.manual_seed(4)
    ref = ref_mod.ZipVoiceDialogStereo(**TINY)
    ref.eval()
    ours = ZipVoiceDialogStereo(**TINY)
    params = {"params": convert_zipvoice(ref.state_dict())}

    rng = np.random.RandomState(5)
    F = TINY["feat_dim"]
    tokens = [[5, 7, 9, 11], [4, 6, 8]]
    prompt_tokens = [[36, 3], [36, 5, 37]]
    Tp = 9
    prompt_features = rng.randn(2, Tp, 2 * F).astype(np.float32)
    prompt_features_lens = np.array([9, 6], dtype=np.int64)

    ptl = np.array([len(p) for p in prompt_tokens], dtype=np.int64)
    tl = np.array([len(t) for t in tokens], dtype=np.int64)
    feat_lens = predict_features_lens(
        jnp.asarray(prompt_features_lens), jnp.asarray(ptl), jnp.asarray(tl), 1.0
    )
    T = int(np.asarray(feat_lens).max())
    noise = rng.randn(2, T, 2 * F).astype(np.float32)

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
                num_step=2,
                guidance_scale=1.0,
            )
    finally:
        torch.randn = orig_randn

    cat_tokens = [p + t for p, t in zip(prompt_tokens, tokens)]
    tok, tok_lens = pad_tokens(cat_tokens, pad_id=0)
    pf = np.zeros((2, T, 2 * F), dtype=np.float32)
    pf[:, :Tp] = prompt_features

    x1, padding_mask = ours.apply(
        params,
        tokens=jnp.asarray(tok),
        tokens_lens=jnp.asarray(tok_lens),
        prompt_tokens_lens=jnp.asarray(ptl),
        prompt_features=jnp.asarray(pf),
        prompt_features_lens=jnp.asarray(prompt_features_lens),
        features_lens=feat_lens,
        noise=jnp.asarray(noise),
        num_step=2,
        guidance_scale=1.0,
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
