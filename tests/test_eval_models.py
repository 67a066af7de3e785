"""Eval model ports: UTMOS exact parity vs the reference implementation;
ECAPA head shape sanity."""

import sys
import types

import numpy as np
import pytest

from conftest import requires_reference

torch = pytest.importorskip("torch")


def _stub_torchaudio():
    if "torchaudio" in sys.modules:
        return
    ta = types.ModuleType("torchaudio")
    ta.functional = types.ModuleType("torchaudio.functional")
    ta.functional.resample = lambda w, orig, new: w
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = ta.functional


@requires_reference
def test_utmos_matches_reference():
    _stub_torchaudio()
    from zipvoice.eval.models.utmos import UTMOS22Strong as Ref

    from zipvoice_tpu.eval.utmos_model import UTMOS22Strong as Mine

    m, r = Mine(), Ref()
    mk, rk = dict(m.state_dict()), dict(r.state_dict())
    assert set(mk) == set(rk), (set(mk) ^ set(rk))

    torch.manual_seed(0)
    sd = {k: torch.randn_like(v) * 0.02 for k, v in rk.items()}
    r.load_state_dict(sd)
    m.load_state_dict(sd)
    r.eval()
    m.eval()
    wav = torch.randn(2, 16000) * 0.1
    with torch.no_grad():
        rs, ms = r(wav, 16000), m(wav, 16000)
    np.testing.assert_allclose(
        ms.numpy(), rs.numpy(), atol=1e-5, rtol=1e-5
    )


def test_ecapa_head_shapes():
    import torch.nn.functional as F

    from zipvoice_tpu.eval.speaker_model import EcapaWavLM

    m = EcapaWavLM(wavlm_path=None, feat_dim=32, num_hidden_states=3)
    m.eval()
    x = torch.randn(2, 32, 40)
    out1 = m.layer1(x)
    out2 = m.layer2(out1)
    out3 = m.layer3(out2)
    out4 = m.layer4(out3)
    out = F.relu(m.conv(torch.cat([out2, out3, out4], dim=1)))
    emb = m.linear(m.bn(m.pooling(out)))
    assert emb.shape == (2, 192)
    assert torch.isfinite(emb).all()
