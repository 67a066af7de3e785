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
