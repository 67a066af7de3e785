"""Layer-by-layer numerical parity of the JAX TTSZipformer vs the reference
PyTorch implementation (random weights, fixed seeds, fp32, CPU)."""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _ref_modules():
    from zipvoice.models.modules import zipformer as ref_zip

    return ref_zip


def to_np(t):
    return t.detach().cpu().numpy()


@requires_reference
def test_timestep_embedding():
    ref_zip = _ref_modules()
    from zipvoice_tpu.models.zipformer import timestep_embedding

    t = np.array([0.0, 0.1, 0.5, 0.9999], dtype=np.float32)
    ref = to_np(ref_zip.timestep_embedding(torch.from_numpy(t), 192))
    ours = np.asarray(timestep_embedding(jnp.asarray(t), 192))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@requires_reference
def test_compact_rel_pos_encoding():
    ref_zip = _ref_modules()
    from zipvoice_tpu.models.zipformer import compact_rel_pos_encoding

    T = 37
    mod = ref_zip.CompactRelPositionalEncoding(48, dropout_rate=0.0)
    mod.eval()
    x = torch.zeros(T, 2, 48)
    ref = to_np(mod(x))[0]  # (2T-1, 48)
    ours = np.asarray(compact_rel_pos_encoding(T, 48))
    assert ref.shape == ours.shape == (2 * T - 1, 48)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("seq_len,with_mask", [(25, False), (40, True)])
def test_full_zipformer_forward(seq_len, with_mask):
    """End-to-end TTSZipformer forward parity with converted random weights."""
    ref_zip = _ref_modules()
    from zipvoice_tpu.models.zipformer import TTSZipformer
    from zipvoice_tpu.utils.convert import convert_tts_zipformer

    torch.manual_seed(0)
    cfg = dict(
        in_dim=30,
        out_dim=10,
        downsampling_factor=(1, 2, 1),
        num_encoder_layers=(1, 2, 1),
        cnn_module_kernel=(31, 15, 31),
        encoder_dim=64,
        feedforward_dim=96,
        num_heads=4,
        query_head_dim=8,
        pos_head_dim=4,
        value_head_dim=12,
        pos_dim=48,
        use_time_embed=True,
        time_embed_dim=32,
    )
    ref_model = ref_zip.TTSZipformer(**cfg)
    ref_model.eval()

    B = 3
    rng = np.random.RandomState(42)
    x = rng.randn(B, seq_len, cfg["in_dim"]).astype(np.float32)
    t = rng.rand(B).astype(np.float32)
    if with_mask:
        lens = np.array([seq_len, seq_len - 7, seq_len - 15])
        mask = np.arange(seq_len)[None, :] >= lens[:, None]
    else:
        mask = np.zeros((B, seq_len), dtype=bool)

    with torch.no_grad():
        ref_out = to_np(
            ref_model(
                torch.from_numpy(x),
                t=torch.from_numpy(t),
                padding_mask=torch.from_numpy(mask),
            )
        )

    model = TTSZipformer(**cfg)
    params = convert_tts_zipformer(ref_model.state_dict())
    ours = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(x),
            t=jnp.asarray(t),
            padding_mask=jnp.asarray(mask),
        )
    )
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-4)


@requires_reference
def test_zipformer_guidance_scale_embed():
    """Distill-style decoder with guidance-scale embedding input."""
    ref_zip = _ref_modules()
    from zipvoice_tpu.models.zipformer import TTSZipformer
    from zipvoice_tpu.utils.convert import convert_tts_zipformer

    torch.manual_seed(1)
    cfg = dict(
        in_dim=30,
        out_dim=10,
        downsampling_factor=(1,),
        num_encoder_layers=(2,),
        cnn_module_kernel=(7,),
        encoder_dim=64,
        feedforward_dim=96,
        num_heads=4,
        query_head_dim=8,
        pos_head_dim=4,
        value_head_dim=12,
        pos_dim=48,
        use_time_embed=True,
        time_embed_dim=32,
        use_guidance_scale_embed=True,
        guidance_scale_embed_dim=64,
    )
    ref_model = ref_zip.TTSZipformer(**cfg)
    ref_model.eval()

    B, T = 2, 19
    rng = np.random.RandomState(7)
    x = rng.randn(B, T, cfg["in_dim"]).astype(np.float32)
    t = rng.rand(B).astype(np.float32)
    gs = np.array([1.0, 3.0], dtype=np.float32)
    mask = np.zeros((B, T), dtype=bool)

    with torch.no_grad():
        ref_out = to_np(
            ref_model(
                torch.from_numpy(x),
                t=torch.from_numpy(t),
                padding_mask=torch.from_numpy(mask),
                guidance_scale=torch.from_numpy(gs),
            )
        )

    model = TTSZipformer(**cfg)
    params = convert_tts_zipformer(ref_model.state_dict())
    ours = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(x),
            t=jnp.asarray(t),
            padding_mask=jnp.asarray(mask),
            guidance_scale=jnp.asarray(gs),
        )
    )
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-4)
