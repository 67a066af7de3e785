"""UTMOS naturalness MOS prediction driver.

Reference: zipvoice/eval/mos/utmos.py (UTMOS22Strong reimplementation over a
wav2vec2 SSL backbone).  This driver loads a local UTMOS-style regressor via
torch (no network in this environment): pass --utmos-model-path with either
a TorchScript export or a state-dict + the reference's UTMOS22Strong class
importable from /root/reference.

  python -m zipvoice_tpu.eval.utmos_cli --wav-dir results \
    --test-list test.tsv --utmos-model-path /models/utmos22_strong.pt
"""

import argparse
import logging
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-dir", type=str, required=True)
    p.add_argument("--test-list", type=str, required=True)
    p.add_argument("--utmos-model-path", type=str, required=True)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import torch

    from zipvoice_tpu.frontend.audio import load_wav

    try:
        model = torch.jit.load(args.utmos_model_path, map_location="cpu")
    except Exception:
        from zipvoice_tpu.eval.utmos_model import UTMOS22Strong

        model = UTMOS22Strong()
        sd = torch.load(args.utmos_model_path, map_location="cpu")
        if "model" in sd:
            sd = sd["model"]
        model.load_state_dict(sd)
    model.eval()

    names = []
    with open(args.test_list) as f:
        for line in f:
            names.append(line.rstrip("\n").split("\t")[0])

    scores = []
    with torch.no_grad():
        for n in names:
            wav = load_wav(os.path.join(args.wav_dir, n + ".wav"), 16000)
            score = model(
                torch.from_numpy(wav), torch.tensor([16000])
            )
            scores.append(float(score))

    report = [f"overall UTMOS: {np.mean(scores):.4f}"]
    report += [f"{n}\t{s:.4f}" for n, s in zip(names, scores)]
    print("\n".join(report))
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(report) + "\n")


if __name__ == "__main__":
    main()
