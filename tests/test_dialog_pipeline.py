"""Dialog (mono + stereo) inference pipelines end to end (tiny models)."""

import json
import string

import numpy as np
import pytest

from conftest import requires_reference

torch = pytest.importorskip("torch")

TINY = dict(
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
    feat_dim=100,
)


def _model_dir(tmp_path, stereo: bool):
    import zipvoice.models.zipvoice_dialog as ref_mod

    chars = ["_"] + list(string.ascii_lowercase) + list(" .,!?'")
    spk_a, spk_b = len(chars), len(chars) + 1
    tokens = chars + ["[S1]", "[S2]"]
    (tmp_path / "tokens.txt").write_text(
        "".join(f"{t}\t{i}\n" for i, t in enumerate(tokens))
    )
    torch.manual_seed(0)
    cls = (
        ref_mod.ZipVoiceDialogStereo if stereo else ref_mod.ZipVoiceDialog
    )
    ref = cls(**TINY, vocab_size=len(tokens), pad_id=0,
              spk_a_id=spk_a, spk_b_id=spk_b)
    torch.save({"model": ref.state_dict()}, tmp_path / "model.pt")
    (tmp_path / "model.json").write_text(json.dumps({"model": TINY}))
    return tmp_path


def _prompts(tmp_path):
    from zipvoice_tpu.frontend.audio import save_wav

    sr = 24000
    t = np.arange(int(1.0 * sr), dtype=np.float32) / sr
    paths = []
    for i, f0 in enumerate((220, 300)):
        wav = (0.2 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)[None]
        p = str(tmp_path / f"prompt{i}.wav")
        save_wav(p, wav, sr)
        paths.append(p)
    return paths


@requires_reference
def test_mono_dialog_pipeline(tmp_path):
    from zipvoice_tpu.infer.dialog_pipeline import DialogInferencePipeline
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos

    model_dir = _model_dir(tmp_path, stereo=False)
    model, params, tokenizer = load_model_dir(
        str(model_dir), "zipvoice_dialog"
    )
    vocoder, vp = load_vocos(None)
    pipe = DialogInferencePipeline(model, params, vocoder, vp, tokenizer)
    p1, p2 = _prompts(tmp_path)
    wav, metrics = pipe.generate_dialog(
        prompt_text=["hi there.", "hello."],
        prompt_wav_path=[p1, p2],
        text="[S1] how are you? [S2] doing fine!",
        num_step=2,
    )
    assert wav.shape[0] == 1 and wav.shape[-1] > 0
    assert np.isfinite(wav).all()
    assert metrics["rtf"] > 0


@requires_reference
def test_stereo_dialog_pipeline(tmp_path):
    from zipvoice_tpu.infer.dialog_pipeline import (
        StereoDialogInferencePipeline,
    )
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos

    model_dir = _model_dir(tmp_path, stereo=True)
    model, params, tokenizer = load_model_dir(
        str(model_dir), "zipvoice_dialog_stereo"
    )
    vocoder, vp = load_vocos(None)
    pipe = StereoDialogInferencePipeline(
        model, params, vocoder, vp, tokenizer
    )
    p1, p2 = _prompts(tmp_path)
    wav, metrics = pipe.generate_dialog_stereo(
        prompt_text=["hi there.", "hello."],
        prompt_wav_path=[p1, p2],
        text="[S1] how are you? [S2] doing fine!",
        num_step=2,
    )
    assert wav.shape[0] == 2  # stereo
    assert np.isfinite(wav).all()
