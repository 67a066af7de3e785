"""Engine export + exported-inference CLIs end to end (tiny model, CPU)."""

import json
import os
import string
import subprocess
import sys

import numpy as np
import pytest

from conftest import requires_reference

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=580
    )
    assert r.returncode == 0, f"{cmd}\nOUT:{r.stdout}\nERR:{r.stderr}"
    return r


@requires_reference
def test_export_and_infer_exported(tmp_path):
    from zipvoice.models.zipvoice import ZipVoice as RefZipVoice

    from test_infer_pipeline import TINY

    chars = ["_"] + list(string.ascii_lowercase) + list(" .,!?'")
    (tmp_path / "tokens.txt").write_text(
        "".join(f"{c}\t{i}\n" for i, c in enumerate(chars))
    )
    torch.manual_seed(0)
    ref = RefZipVoice(**TINY, vocab_size=len(chars), pad_id=0)
    torch.save({"model": ref.state_dict()}, tmp_path / "model.pt")
    (tmp_path / "model.json").write_text(json.dumps({"model": TINY}))

    from zipvoice_tpu.frontend.audio import load_wav, save_wav

    sr = 24000
    t = np.arange(int(1.2 * sr), dtype=np.float32) / sr
    prompt = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    wav_path = str(tmp_path / "prompt.wav")
    save_wav(wav_path, prompt, sr)

    py = sys.executable
    eng = str(tmp_path / "engines")
    _run([py, "-m", "zipvoice_tpu.bin.export_model",
          "--model-dir", str(tmp_path), "--out-dir", eng,
          "--buckets", "1:64:512", "--num-step", "2", "--platform", "cpu"])
    assert os.path.exists(os.path.join(eng, "manifest.json"))

    out = str(tmp_path / "out.wav")
    _run([py, "-m", "zipvoice_tpu.bin.infer_exported",
          "--engine-dir", eng, "--model-dir", str(tmp_path),
          "--prompt-wav", wav_path, "--prompt-text", "hello there.",
          "--text", "short test.", "--res-wav-path", out,
          "--platform", "cpu"])
    wav = load_wav(out, sr)
    assert wav.shape[-1] > 0 and np.isfinite(wav).all()
