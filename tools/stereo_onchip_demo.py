"""Dialog-Stereo end-to-end on-chip demo (VERDICT r2 item 10).

Runs the full stereo loop with a tiny model:
  1. synthesize a 2-speaker stereo corpus + dialog token file
  2. prepare_dataset -> prepare_tokens(dialog) -> compute_fbank(2ch)
  3. train `zipvoice_dialog_stereo` from scratch for one epoch on the
     default platform (TPU when available)
  4. export the trained checkpoint to the reference torch layout and
     load it into reference ZipVoiceDialogStereo strict=True
  5. infer a stereo wav through bin/infer_zipvoice_dialog on the chip

Usage: python tools/stereo_onchip_demo.py [--workdir /tmp/stereo_demo]
       [--platform cpu]   # CI-sized CPU run
"""

import argparse
import json
import os
import string
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

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


def _run(cmd, platform=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    print("+", " ".join(map(str, cmd)), flush=True)
    r = subprocess.run(list(map(str, cmd)), cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        raise SystemExit(f"command failed: {cmd}")
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/stereo_demo")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"])
    args = ap.parse_args()

    from zipvoice_tpu.frontend.audio import save_wav

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    sr = 24000
    rng = np.random.RandomState(0)

    # 1. stereo corpus: spk1 on channel 0 (first half), spk2 on channel 1
    wav_dir = os.path.join(wd, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    rows = []
    for i in range(8):
        n = int(2.0 * sr)
        t = np.arange(n) / sr
        ch0 = 0.2 * np.sin(2 * np.pi * (180 + 20 * i) * t)
        ch1 = 0.2 * np.sin(2 * np.pi * (320 + 20 * i) * t)
        ch0[n // 2:] = 0.0  # speaker turns don't overlap
        ch1[: n // 2] = 0.0
        wav = np.stack([ch0, ch1]).astype(np.float32)
        path = os.path.join(wav_dir, f"d{i}.wav")
        save_wav(path, wav, sr)
        rows.append(f"d{i}\t[S1] hello number {i}. [S2] goodbye now.\t{path}")
    tsv = os.path.join(wd, "train.tsv")
    with open(tsv, "w") as f:
        f.write("\n".join(rows) + "\n")

    chars = ["_"] + list(string.ascii_lowercase) + list(" .,!?'0123456789")
    tokens = chars + ["[S1]", "[S2]"]
    token_file = os.path.join(wd, "tokens.txt")
    with open(token_file, "w") as f:
        f.write("".join(f"{tk}\t{i}\n" for i, tk in enumerate(tokens)))

    py = sys.executable
    plat = ["--platform", "cpu"] if args.platform == "cpu" else []

    # 2. data prep (stereo fbank -> 200-dim features)
    _run([py, "-m", "zipvoice_tpu.bin.prepare_dataset", "--tsv-path", tsv,
          "--prefix", "sdemo", "--subset", "train",
          "--output-dir", f"{wd}/manifests"])
    manifest = f"{wd}/manifests/sdemo_cuts_train.jsonl.gz"
    _run([py, "-m", "zipvoice_tpu.bin.prepare_tokens",
          "--manifest", manifest, "--tokenizer", "dialog"])
    _run([py, "-m", "zipvoice_tpu.bin.compute_fbank", "--manifest", manifest,
          "--output-dir", f"{wd}/fbank", "--num-channels", "2"])

    cfg_path = os.path.join(wd, "model.json")
    with open(cfg_path, "w") as f:
        json.dump({"model": TINY_CFG}, f)

    # 3. train stereo from scratch, one epoch
    _run([py, "-m", "zipvoice_tpu.bin.train_zipvoice",
          "--model-name", "zipvoice_dialog_stereo",
          "--train-manifest", manifest,
          "--token-file", token_file, "--tokenizer", "dialog",
          "--model-config", cfg_path, "--exp-dir", f"{wd}/exp",
          "--num-epochs", "1", "--max-duration", "8", "--num-buckets", "1",
          "--base-lr", "0.01", "--log-interval", "1", "--save-every-n", "0",
          *plat])

    # 4. export to the reference torch layout + strict load
    _run([py, "-m", "zipvoice_tpu.bin.export_torch_checkpoint",
          "--exp-dir", f"{wd}/exp", "--checkpoint", f"{wd}/exp/epoch-1",
          "--out-dir", f"{wd}/export"])
    check = (
        "import sys, json, torch;"
        "sys.path.insert(0, '/root/reference');"
        "from zipvoice.models.zipvoice_dialog import ZipVoiceDialogStereo;"
        f"cfg = json.load(open('{wd}/export/model.json'))['model'];"
        "tok = [l.split('\\t') for l in open"
        f"('{wd}/export/tokens.txt')];"
        "m = ZipVoiceDialogStereo(**cfg, vocab_size=len(tok), pad_id=0, "
        "spk_a_id=len(tok)-2, spk_b_id=len(tok)-1);"
        f"sd = torch.load('{wd}/export/model.pt', map_location='cpu');"
        "m.load_state_dict(sd['model'] if 'model' in sd else sd, "
        "strict=True);"
        "print('reference strict=True load: OK')"
    )
    r = _run([py, "-c", check])
    print(r.stdout.strip())

    # 5. stereo inference through the CLI (chip by default)
    t = np.arange(int(1.0 * sr)) / sr
    for i, f0 in enumerate((220, 330)):
        save_wav(os.path.join(wd, f"prompt{i}.wav"),
                 (0.2 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)[None],
                 sr)
    _run([py, "-m", "zipvoice_tpu.bin.infer_zipvoice_dialog",
          "--model-name", "zipvoice_dialog_stereo",
          "--model-dir", f"{wd}/export",
          "--prompt-text-1", "hello number one.",
          "--prompt-wav-1", f"{wd}/prompt0.wav",
          "--prompt-text-2", "goodbye now.",
          "--prompt-wav-2", f"{wd}/prompt1.wav",
          "--text", "[S1] hello there. [S2] goodbye friend.",
          "--num-step", "4", "--res-dir", wd,
          "--res-wav-path", os.path.join(wd, "stereo_out.wav"), *plat])

    import wave as wave_mod

    with wave_mod.open(os.path.join(wd, "stereo_out.wav")) as f:
        nch, n = f.getnchannels(), f.getnframes()
    assert nch == 2, nch
    print(f"stereo wav OK: {n / sr:.2f}s, 2 channels -> "
          f"{wd}/stereo_out.wav")


if __name__ == "__main__":
    main()
