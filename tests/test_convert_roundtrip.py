"""torch -> flax -> torch checkpoint conversion round trip."""

import numpy as np
import pytest

from conftest import requires_reference

torch = pytest.importorskip("torch")


@requires_reference
def test_zipvoice_conversion_roundtrip():
    from zipvoice.models.zipvoice import ZipVoice as RefZipVoice

    from zipvoice_tpu.utils.convert import convert_zipvoice, invert_zipvoice

    cfg = dict(
        fm_decoder_downsampling_factor=[1, 2, 1],
        fm_decoder_num_layers=[1, 1, 1],
        fm_decoder_cnn_module_kernel=[7, 7, 7],
        fm_decoder_feedforward_dim=64,
        fm_decoder_num_heads=4,
        fm_decoder_dim=48,
        text_encoder_num_layers=1,
        text_encoder_feedforward_dim=48,
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
    torch.manual_seed(0)
    ref = RefZipVoice(**cfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params = convert_zipvoice(sd)
    back = invert_zipvoice(
        params,
        downsampling_factors={
            "fm_decoder": tuple(cfg["fm_decoder_downsampling_factor"]),
            "text_encoder": (1,),
        },
    )

    assert set(back.keys()) == set(sd.keys()), (
        sorted(set(sd) - set(back))[:5],
        sorted(set(back) - set(sd))[:5],
    )
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], atol=0, err_msg=k)


@requires_reference
def test_our_init_loads_into_reference():
    """Reverse interop: a natively-initialized flax model exports to a
    torch state dict the reference loads strict=True, and both forwards
    agree — certifying that models TRAINED here serve in the reference
    ecosystem."""
    import jax
    import jax.numpy as jnp

    from zipvoice.models.zipvoice import ZipVoice as RefZipVoice

    from zipvoice_tpu.models.zipvoice import ZipVoice
    from zipvoice_tpu.utils.convert import invert_zipvoice

    cfg = dict(
        fm_decoder_downsampling_factor=[1, 2, 1],
        fm_decoder_num_layers=[1, 1, 1],
        fm_decoder_cnn_module_kernel=[7, 7, 7],
        fm_decoder_feedforward_dim=64,
        fm_decoder_num_heads=4,
        fm_decoder_dim=48,
        text_encoder_num_layers=1,
        text_encoder_feedforward_dim=48,
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
    ours = ZipVoice(**cfg)
    B, T, F = 2, 24, cfg["feat_dim"]
    params = ours.init(
        jax.random.PRNGKey(3),
        t=jnp.full((B,), 0.4),
        xt=jnp.zeros((B, T, F)),
        text_condition=jnp.zeros((B, T, F)),
        speech_condition=jnp.zeros((B, T, F)),
        method="forward_fm_decoder",
    )["params"]
    # text encoder + embed need init too
    p2 = ours.init(
        jax.random.PRNGKey(4),
        tokens=jnp.zeros((B, 6), jnp.int32),
        tokens_lens=jnp.full((B,), 4),
        method="forward_text_embed",
    )["params"]
    params = {**p2, **params}

    sd = invert_zipvoice(
        params,
        downsampling_factors={
            "fm_decoder": tuple(cfg["fm_decoder_downsampling_factor"]),
            "text_encoder": (1,),
        },
    )
    ref = RefZipVoice(**cfg)
    ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True
    )
    ref.eval()

    rng = np.random.RandomState(0)
    xt = rng.randn(B, T, F).astype(np.float32)
    tc = rng.randn(B, T, F).astype(np.float32)
    sc = rng.randn(B, T, F).astype(np.float32)
    t = np.full((B,), 0.37, np.float32)
    with torch.no_grad():
        ref_v = ref.forward_fm_decoder(
            t=torch.from_numpy(t).reshape(B, 1, 1),
            xt=torch.from_numpy(xt),
            text_condition=torch.from_numpy(tc),
            speech_condition=torch.from_numpy(sc),
        ).numpy()
    our_v = np.asarray(
        ours.apply(
            {"params": params}, t=jnp.asarray(t), xt=jnp.asarray(xt),
            text_condition=jnp.asarray(tc), speech_condition=jnp.asarray(sc),
            method="forward_fm_decoder",
        )
    )
    np.testing.assert_allclose(our_v, ref_v, atol=2e-4, rtol=1e-4)


STEREO_TINY = dict(
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
def test_stereo_conversion_roundtrip():
    """Two-stream (Dialog-Stereo) state dicts survive torch -> flax -> torch
    exactly — the riskiest conversion path (dual in/out projections,
    reference zipvoice_dialog.py:218-256)."""
    import zipvoice.models.zipvoice_dialog as ref_mod

    from zipvoice_tpu.utils.convert import convert_zipvoice, invert_zipvoice

    torch.manual_seed(7)
    ref = ref_mod.ZipVoiceDialogStereo(**STEREO_TINY)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params = convert_zipvoice(sd)
    back = invert_zipvoice(
        params,
        downsampling_factors={
            "fm_decoder": tuple(STEREO_TINY["fm_decoder_downsampling_factor"]),
            "text_encoder": (1,),
        },
    )
    assert set(back.keys()) == set(sd.keys()), (
        sorted(set(sd) - set(back))[:5],
        sorted(set(back) - set(sd))[:5],
    )
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], atol=0, err_msg=k)
    # and the reference accepts it strict=True
    ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in back.items()}, strict=True
    )


@requires_reference
def test_our_stereo_init_loads_into_reference():
    """A natively-initialized flax Dialog-Stereo model exports to a torch
    state dict the reference loads strict=True, and the training losses
    agree — certifying stereo models TRAINED here serve in the reference
    ecosystem (VERDICT r2 item 10)."""
    import jax
    import jax.numpy as jnp

    import zipvoice.models.zipvoice_dialog as ref_mod

    from zipvoice_tpu.frontend.batch import pad_tokens
    from zipvoice_tpu.models.dialog import ZipVoiceDialogStereo
    from zipvoice_tpu.utils.convert import invert_zipvoice

    ours = ZipVoiceDialogStereo(**STEREO_TINY)
    rng = np.random.RandomState(11)
    tokens = [[36, 5, 7, 37, 9], [36, 4, 6, 8, 2]]
    B, T, F = 2, 17, STEREO_TINY["feat_dim"]
    features = rng.randn(B, T, 2 * F).astype(np.float32)
    features_lens = np.array([17, 12], dtype=np.int64)
    noise = rng.randn(B, T, 2 * F).astype(np.float32)
    t = rng.rand(B, 1, 1).astype(np.float32)
    scm = np.arange(T)[None, :] >= np.array([[6], [4]])
    tok, tok_lens = pad_tokens(tokens, pad_id=0)

    def _init(feats, nz, **kw):
        return ours.init(
            jax.random.PRNGKey(5),
            tokens=jnp.asarray(tok),
            tokens_lens=jnp.asarray(tok_lens),
            features=feats,
            features_lens=jnp.asarray(features_lens),
            noise=nz,
            t=jnp.asarray(t),
            speech_condition_mask=jnp.asarray(scm),
            train=False,
            **kw,
        )["params"]

    params = _init(jnp.asarray(features), jnp.asarray(noise), se_weight=1.0)
    # @nn.compact only creates the projection pair the init input exercises;
    # graft the mono-width pair exactly like the train CLI's from-scratch
    # stereo init does (bin/train_zipvoice.py:401-420)
    from zipvoice_tpu.utils.structural_loaders import graft_missing

    params_mixed = _init(
        jnp.asarray(features[:, :, :F]), jnp.asarray(noise[:, :, :F]),
        se_weight=0.0,
    )
    params = jax.tree.map(lambda x: x, params)
    graft_missing(params, params_mixed)

    sd = invert_zipvoice(
        params,
        downsampling_factors={
            "fm_decoder": tuple(STEREO_TINY["fm_decoder_downsampling_factor"]),
            "text_encoder": (1,),
        },
    )
    ref = ref_mod.ZipVoiceDialogStereo(**STEREO_TINY)
    ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True
    )
    ref.eval()

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

    loss = ours.apply(
        {"params": params},
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
