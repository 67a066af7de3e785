"""End-to-end exercise of the WER ASR transcribe backends with tiny
offline models (no network, no real weights).

The reference's English scorer drives Whisper with a forced
language+transcribe prompt (zipvoice/eval/wer/seedtts.py:220-233) and the
hubert scorer drives a generic HF CTC pipeline (wer/hubert.py:70).  These
backends were previously import-gated and never ran in-image — in fact the
installed transformers (4.5x) removed the `forced_decoder_ids` generate
kwarg the reference uses, which would have crashed the whisper branch the
first time it met real weights.  These tests pin the repaired decode paths
by building miniature random-weight checkpoints in the published layouts.
"""

import json
import os
import sys

import numpy as np
import pytest

import conftest  # noqa: F401

from zipvoice_tpu.frontend.audio import save_wav

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

WHISPER_SPECIALS = [
    "<|endoftext|>", "<|startoftranscript|>", "<|en|>", "<|zh|>",
    "<|translate|>", "<|transcribe|>", "<|notimestamps|>",
]


def _make_tiny_whisper(d: str, with_lang_maps: bool) -> dict:
    """Random-weight WhisperForConditionalGeneration + processor in the
    published directory layout.  with_lang_maps mimics whisper-large-v3's
    generation_config (lang_to_id/task_to_id present)."""
    from transformers import (
        WhisperConfig,
        WhisperFeatureExtractor,
        WhisperForConditionalGeneration,
        WhisperProcessor,
        WhisperTokenizer,
    )

    os.makedirs(d, exist_ok=True)
    base = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [" ", "'"]
    vocab = {t: i for i, t in enumerate(base + WHISPER_SPECIALS)}
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    tok = WhisperTokenizer(
        os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt"),
        unk_token="<|endoftext|>", bos_token="<|endoftext|>",
        eos_token="<|endoftext|>",
    )
    tok.add_special_tokens({"additional_special_tokens": WHISPER_SPECIALS})
    proc = WhisperProcessor(
        feature_extractor=WhisperFeatureExtractor(feature_size=80),
        tokenizer=tok,
    )
    proc.save_pretrained(d)
    cfg = WhisperConfig(
        vocab_size=len(tok), d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=80,
        max_source_positions=1500, max_target_positions=64,
        bos_token_id=vocab["<|endoftext|>"],
        eos_token_id=vocab["<|endoftext|>"],
        decoder_start_token_id=vocab["<|startoftranscript|>"],
        pad_token_id=vocab["<|endoftext|>"],
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(cfg)
    model.generation_config.no_timestamps_token_id = vocab["<|notimestamps|>"]
    model.generation_config.max_length = 16
    if with_lang_maps:
        model.generation_config.lang_to_id = {
            "<|en|>": vocab["<|en|>"], "<|zh|>": vocab["<|zh|>"],
        }
        model.generation_config.task_to_id = {
            "transcribe": vocab["<|transcribe|>"],
            "translate": vocab["<|translate|>"],
        }
    model.save_pretrained(d)
    return vocab


def _make_tiny_ctc(d: str) -> None:
    """Random-weight Wav2Vec2ForCTC + processor (the hubert-large-ls960-ft
    layout the reference's hubert scorer loads via pipeline())."""
    from transformers import (
        Wav2Vec2Config,
        Wav2Vec2CTCTokenizer,
        Wav2Vec2FeatureExtractor,
        Wav2Vec2ForCTC,
        Wav2Vec2Processor,
    )

    os.makedirs(d, exist_ok=True)
    chars = ["<pad>", "<s>", "</s>", "<unk>", "|"]
    chars += [chr(c) for c in range(ord("a"), ord("z") + 1)] + ["'"]
    vocab = {c: i for i, c in enumerate(chars)}
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    tok = Wav2Vec2CTCTokenizer(
        os.path.join(d, "vocab.json"), unk_token="<unk>",
        pad_token="<pad>", word_delimiter_token="|",
    )
    proc = Wav2Vec2Processor(
        feature_extractor=Wav2Vec2FeatureExtractor(
            feature_size=1, sampling_rate=16000, padding_value=0.0,
            do_normalize=True, return_attention_mask=False,
        ),
        tokenizer=tok,
    )
    proc.save_pretrained(d)
    torch.manual_seed(0)
    Wav2Vec2ForCTC(
        Wav2Vec2Config(
            vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            conv_dim=(32, 32), conv_stride=(5, 2), conv_kernel=(10, 3),
            num_feat_extract_layers=2,
        )
    ).save_pretrained(d)


def _wav(path: str, seed: int = 0, dur: float = 0.6) -> None:
    rng = np.random.RandomState(seed)
    n = int(16000 * dur)
    t = np.arange(n) / 16000.0
    wav = 0.1 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.randn(n)
    save_wav(path, wav.astype(np.float32), 16000)


def test_whisper_backend_modern_api(tmp_path):
    """whisper-large-v3-style checkpoint (lang/task maps in the generation
    config) decodes through the supported language/task kwargs."""
    from zipvoice_tpu.eval.wer_cli import transcribe_whisper

    d = str(tmp_path / "whisper")
    _make_tiny_whisper(d, with_lang_maps=True)
    w = str(tmp_path / "a.wav")
    _wav(w)
    out = transcribe_whisper(d, [w], "en")
    assert len(out) == 1 and isinstance(out[0], str)


def test_whisper_backend_forced_prompt_fallback(tmp_path):
    """A checkpoint without lang/task maps takes the explicit
    decoder-prompt branch (same forced ids the reference builds)."""
    from zipvoice_tpu.eval.wer_cli import transcribe_whisper

    d = str(tmp_path / "whisper")
    _make_tiny_whisper(d, with_lang_maps=False)
    w = str(tmp_path / "a.wav")
    _wav(w)
    out = transcribe_whisper(d, [w], "en")
    assert len(out) == 1 and isinstance(out[0], str)


def test_pipeline_backend_and_cli(tmp_path, monkeypatch, capsys):
    """The CTC pipeline backend and the full wer_cli main (test-list →
    transcribe → reference-normalized WER report) run end-to-end."""
    from zipvoice_tpu.eval import wer_cli

    d = str(tmp_path / "ctc")
    _make_tiny_ctc(d)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    names = ["utt1", "utt2"]
    for i, n in enumerate(names):
        _wav(str(wav_dir / f"{n}.wav"), seed=i)
    test_list = tmp_path / "test.tsv"
    with open(test_list, "w") as f:
        for n in names:
            f.write(f"{n}\tprompt text\tprompt.wav\thello world\n")
    out_file = tmp_path / "wer.txt"
    monkeypatch.setattr(sys, "argv", [
        "wer_cli", "--wav-dir", str(wav_dir), "--test-list", str(test_list),
        "--lang", "en", "--asr-model-path", d, "--backend", "pipeline",
        "--out", str(out_file),
    ])
    wer_cli.main()
    report = out_file.read_text()
    assert report.startswith("overall WER:")
    # one line per utterance, tab-separated name / wer% / normalized hyp
    lines = report.strip().split("\n")[1:]
    assert [ln.split("\t")[0] for ln in lines] == names
    for ln in lines:
        float(ln.split("\t")[1])  # parsable WER percentage


def test_auto_backend_selection(tmp_path):
    """_auto_backend mirrors the reference's dispatch: whisper by model
    name for en, pipeline fallback for zh when funasr is absent."""
    from zipvoice_tpu.eval.wer_cli import _auto_backend

    assert _auto_backend("en", "/m/whisper-large-v3") == "whisper"
    assert _auto_backend("en", "/m/hubert-large-ls960-ft") == "pipeline"
    try:
        import funasr  # noqa: F401

        assert _auto_backend("zh", "/m/paraformer-zh") == "paraformer"
    except ImportError:
        assert _auto_backend("zh", "/m/paraformer-zh") == "pipeline"
