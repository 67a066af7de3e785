"""End-to-end exercise of the SIM and UTMOS evaluation drivers with
offline checkpoints (no network).

Reference: zipvoice/eval/speaker_similarity/sim.py (WavLM speaker
embeddings -> cosine SIM) and zipvoice/eval/mos/utmos.py.  These drivers
were import-gated until the weighted environment arrived; here the SIM
path runs against a miniature random-weight WavLMForXVector in the HF
layout and the UTMOS path against a random state dict of our own
UTMOS22Strong (whose numerics test_eval_models already pins)."""

import os
import sys

import numpy as np
import pytest

import conftest  # noqa: F401

from zipvoice_tpu.frontend.audio import save_wav

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _make_tiny_wavlm_sv(d: str) -> None:
    from transformers import (
        Wav2Vec2FeatureExtractor,
        WavLMConfig,
        WavLMForXVector,
    )

    os.makedirs(d, exist_ok=True)
    torch.manual_seed(0)
    cfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(32, 32), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_feat_extract_layers=2,
        tdnn_dim=(32, 32, 32, 32, 48), tdnn_kernel=(5, 3, 3, 1, 1),
        tdnn_dilation=(1, 2, 3, 1, 1), xvector_output_dim=32,
    )
    WavLMForXVector(cfg).save_pretrained(d)
    Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=True,
    ).save_pretrained(d)


def _wav(path: str, f0: float, seed: int = 0, dur: float = 0.8) -> None:
    rng = np.random.RandomState(seed)
    n = int(16000 * dur)
    t = np.arange(n) / 16000.0
    wav = 0.1 * np.sin(2 * np.pi * f0 * t) + 0.01 * rng.randn(n)
    save_wav(path, wav.astype(np.float32), 16000)


def test_sim_cli_end_to_end(tmp_path, monkeypatch):
    from zipvoice_tpu.eval import sim_cli

    d = str(tmp_path / "sv_model")
    _make_tiny_wavlm_sv(d)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rows = []
    for i, n in enumerate(["utt1", "utt2"]):
        _wav(str(wav_dir / f"{n}.wav"), f0=220 + 110 * i, seed=i)
        prompt = str(tmp_path / f"prompt{i}.wav")
        _wav(prompt, f0=220 + 110 * i, seed=10 + i)
        rows.append(f"{n}\tprompt text\t{prompt}\tsome text")
    test_list = tmp_path / "test.tsv"
    test_list.write_text("\n".join(rows) + "\n")
    out_file = tmp_path / "sim.txt"
    monkeypatch.setattr(sys, "argv", [
        "sim_cli", "--wav-dir", str(wav_dir), "--test-list", str(test_list),
        "--spk-model-path", d, "--out", str(out_file),
    ])
    sim_cli.main()
    report = out_file.read_text().strip().split("\n")
    assert report[0].startswith("overall SIM:")
    overall = float(report[0].split(":")[1])
    assert -1.0 <= overall <= 1.0
    assert len(report) == 3  # overall + one line per utterance
    for ln in report[1:]:
        name, sim = ln.split("\t")
        assert -1.0 <= float(sim) <= 1.0


def test_utmos_cli_state_dict(tmp_path, monkeypatch):
    """The state-dict branch: a random UTMOS22Strong checkpoint scores a
    wav through the full CLI (wav2vec2-base backbone, so one short wav)."""
    from zipvoice_tpu.eval import utmos_cli
    from zipvoice_tpu.eval.utmos_model import UTMOS22Strong

    torch.manual_seed(0)
    ckpt = str(tmp_path / "utmos22_strong.pt")
    torch.save(UTMOS22Strong().state_dict(), ckpt)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    _wav(str(wav_dir / "utt1.wav"), f0=220, dur=0.5)
    test_list = tmp_path / "test.tsv"
    test_list.write_text("utt1\tprompt\tp.wav\ttext\n")
    out_file = tmp_path / "utmos.txt"
    monkeypatch.setattr(sys, "argv", [
        "utmos_cli", "--wav-dir", str(wav_dir),
        "--test-list", str(test_list), "--utmos-model-path", ckpt,
        "--out", str(out_file),
    ])
    utmos_cli.main()
    report = out_file.read_text().strip().split("\n")
    assert report[0].startswith("overall UTMOS:")
    assert np.isfinite(float(report[0].split(":")[1]))
