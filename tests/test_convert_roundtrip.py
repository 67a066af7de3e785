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
