"""End-to-end training CLI smoke test: data prep CLIs -> 1 epoch of training
on a tiny synthetic corpus (CPU)."""

import json
import os
import string
import subprocess
import sys

import numpy as np

import conftest  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CFG = dict(
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


def _run(cmd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=600
    )
    assert r.returncode == 0, f"{cmd}\nSTDOUT:{r.stdout}\nSTDERR:{r.stderr}"
    return r


def test_data_prep_and_training(tmp_path):
    from zipvoice_tpu.frontend.audio import save_wav

    sr = 24000
    rng = np.random.RandomState(0)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rows = []
    for i in range(8):
        dur = 1.3  # equal durations -> one (B, T, S) shape -> one compile
        n = int(dur * sr)
        wav = (0.2 * np.sin(2 * np.pi * (200 + 30 * i) *
                            np.arange(n) / sr)).astype(np.float32)[None]
        path = wav_dir / f"u{i}.wav"
        save_wav(str(path), wav, sr)
        rows.append(f"u{i}\thello world number {i}.\t{path}")
    tsv = tmp_path / "train.tsv"
    tsv.write_text("\n".join(rows) + "\n")

    chars = ["_"] + list(string.ascii_lowercase) + list(" .,!?0123456789")
    token_file = tmp_path / "tokens.txt"
    token_file.write_text("".join(f"{c}\t{i}\n" for i, c in enumerate(chars)))

    py = sys.executable
    _run([py, "-m", "zipvoice_tpu.bin.prepare_dataset",
          "--tsv-path", str(tsv), "--prefix", "toy", "--subset", "train",
          "--output-dir", str(tmp_path / "manifests")])
    manifest = str(tmp_path / "manifests" / "toy_cuts_train.jsonl.gz")
    _run([py, "-m", "zipvoice_tpu.bin.compute_fbank",
          "--manifest", manifest, "--output-dir", str(tmp_path / "fbank")])

    cfg_path = tmp_path / "model.json"
    cfg_path.write_text(json.dumps({"model": TINY_CFG}))

    r = _run([py, "-m", "zipvoice_tpu.bin.train_zipvoice",
              "--train-manifest", manifest,
              "--token-file", str(token_file),
              "--tokenizer", "simple",
              "--model-config", str(cfg_path),
              "--exp-dir", str(tmp_path / "exp"),
              "--num-epochs", "1",
              "--max-duration", "4",
              "--num-buckets", "1",
              "--base-lr", "0.01",
              "--log-interval", "1",
              "--save-every-n", "0",
              "--num-data-parallel", "2",
              "--no-bf16",
              "--platform", "cpu"])
    out = r.stdout + r.stderr
    assert "loss" in out, out
    assert (tmp_path / "exp" / "epoch-1").exists()
    assert (tmp_path / "exp" / "epoch-1-avg").exists()
    assert (tmp_path / "exp" / "tokens.txt").exists()
