"""Recipe-local tooling: Emilia preprocessing + token vocabulary builder."""

import json
import os
import subprocess
import sys

import conftest  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=120
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r


def test_build_emilia_tokens(tmp_path):
    out = str(tmp_path / "tokens.txt")
    _run([sys.executable, "egs/zipvoice/local/build_emilia_tokens.py",
          "--output", out, "--extra-tokens", "[S1],[S2]"])
    lines = open(out, encoding="utf-8").read().splitlines()
    tokens = dict(line.split("\t") for line in lines)
    assert tokens["_"] == "0"
    assert "zh0" in tokens and "ang1" in tokens and "ang5" in tokens
    assert "[S1]" in tokens and "[S2]" in tokens
    # ids are dense and unique
    ids = sorted(int(v) for v in tokens.values())
    assert ids == list(range(len(lines)))
    # the pinyin-split output space is covered
    from zipvoice_tpu.frontend.tokenizer import split_pinyin

    for py in ("yang2", "zhong1", "shi4", "le5", "er2"):
        for tok in split_pinyin(py):
            assert tok in tokens, tok


def test_preprocess_emilia(tmp_path):
    meta = tmp_path / "meta.jsonl"
    rows = [
        {"id": "a1", "wav": "wavs/a1.wav", "text": "hello", "language": "en",
         "dnsmos": 3.5},
        {"id": "z1", "wav": "wavs/z1.wav", "text": "你好", "language": "zh",
         "dnsmos": 3.2},
        {"id": "j1", "wav": "wavs/j1.wav", "text": "konnichiwa",
         "language": "ja", "dnsmos": 3.9},
        {"id": "bad", "wav": "wavs/bad.wav", "text": "noisy",
         "language": "en", "dnsmos": 2.0},
    ]
    meta.write_text("\n".join(json.dumps(r) for r in rows))
    out = tmp_path / "out"
    _run([sys.executable, "egs/zipvoice/local/preprocess_emilia.py",
          "--jsonl", str(meta), "--wav-root", "/corpus",
          "--output-dir", str(out)])
    en = (out / "emilia_en.tsv").read_text().splitlines()
    zh = (out / "emilia_zh.tsv").read_text().splitlines()
    assert len(en) == 1 and en[0].startswith("a1\thello\t/corpus/wavs")
    assert len(zh) == 1 and zh[0].startswith("z1\t你好")
