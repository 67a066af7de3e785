"""Dump reference goldens for the real-checkpoint suite.

Run this in an environment with the REFERENCE's full dependency set
(torch, vocos, piper_phonemize, jieba, pypinyin, ...) and the published
artifacts.  It produces tests/fixtures/real_goldens/{zipvoice_raw_noise,
zipvoice_raw_mel,zipvoice_raw_wav,vocos_wav}.npy, which
tests/test_real_weights.py compares against when present.

  PYTHONPATH=/root/reference python tools/dump_real_weight_goldens.py \
      --ckpt-dir /models/zipvoice --vocos-ckpt /models/vocos/pytorch_model.bin

The generation prompt is the same deterministic fixture wav the test
builds (fixture_prompt_wav) and the Gaussian noise driving the ODE is
drawn once here, saved, and replayed by the test — so mel allclose 1e-3
is a meaningful cross-framework contract (reference
bin/infer_zipvoice.py:315-434 --raw-evaluation semantics).
"""

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "tests", "fixtures", "real_goldens")
sys.path.insert(0, HERE)

from tests.test_real_weights import (  # noqa: E402
    GEN_TEXT,
    PROMPT_TEXT,
    fixture_prompt_wav,
)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", required=True,
                    help="published ZipVoice dir (model.pt/model.json/"
                         "tokens.txt)")
    ap.add_argument("--vocos-ckpt", required=True,
                    help="charactr/vocos-mel-24khz pytorch_model.bin")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)

    import torch
    from vocos import Vocos

    from zipvoice.models.zipvoice import ZipVoice
    from zipvoice.tokenizer.tokenizer import EmiliaTokenizer
    from zipvoice.utils.feature import VocosFbank

    tokenizer = EmiliaTokenizer(os.path.join(args.ckpt_dir, "tokens.txt"))
    cfg = json.load(open(os.path.join(args.ckpt_dir, "model.json")))["model"]
    model = ZipVoice(
        **cfg,
        vocab_size=tokenizer.vocab_size,
        pad_id=tokenizer.pad_id,
    )
    sd = torch.load(
        os.path.join(args.ckpt_dir, "model.pt"), map_location="cpu"
    )
    model.load_state_dict(sd.get("model", sd))
    model.eval()

    vocoder = Vocos.from_pretrained_local(args.vocos_ckpt) \
        if hasattr(Vocos, "from_pretrained_local") else None
    if vocoder is None:
        vocoder = Vocos.from_hparams  # placeholder; see note below
        raise SystemExit(
            "load the vocos package's Vocos for mel-24khz from your local "
            "checkout and adapt these two lines; kept explicit so the "
            "script fails loudly rather than fetching from the network"
        )

    prompt_path = fixture_prompt_wav("/tmp/golden_prompt.wav")
    fbank = VocosFbank()
    import torchaudio

    wav, sr = torchaudio.load(prompt_path)
    prompt_features = fbank.extract(wav, sampling_rate=sr).unsqueeze(0) * 0.1

    tokens = tokenizer.texts_to_token_ids([GEN_TEXT])
    prompt_tokens = tokenizer.texts_to_token_ids([PROMPT_TEXT])

    # draw the ODE noise ONCE with numpy and replay it on both sides
    # (shape must match the model's internal duration prediction; run a
    # dry sample to learn T, then inject)
    recorded = {}
    real_randn = torch.randn

    def record_randn(*shape, **kw):
        t = real_randn(*shape, **kw)
        recorded["noise"] = t.detach().cpu().numpy()
        return t

    torch.randn = record_randn
    try:
        with torch.no_grad():
            mel, _, mel_lens = model.sample(
                tokens=tokens,
                prompt_tokens=prompt_tokens,
                prompt_features=prompt_features,
                prompt_features_lens=torch.tensor(
                    [prompt_features.shape[1]]
                ),
                speed=1.0,
                t_shift=0.5,
                duration="predict",
                num_step=16,
                guidance_scale=1.0,
            )
    finally:
        torch.randn = real_randn

    mel = (mel[0, : mel_lens[0]] / 0.1).cpu().numpy()
    np.save(os.path.join(OUT, "zipvoice_raw_noise.npy"), recorded["noise"])
    np.save(os.path.join(OUT, "zipvoice_raw_mel.npy"), mel)

    with torch.no_grad():
        wav_out = vocoder.decode(
            torch.from_numpy(mel).T.unsqueeze(0)
        ).cpu().numpy()
    np.save(os.path.join(OUT, "zipvoice_raw_wav.npy"), wav_out)

    # standalone vocos golden on a deterministic mel
    rng = np.random.RandomState(0)
    T = 96
    test_mel = (rng.randn(1, T, 100) * 0.5 - 1.0).astype(np.float32)
    with torch.no_grad():
        v = vocoder.decode(
            torch.from_numpy(test_mel).transpose(1, 2)
        ).cpu().numpy()
    np.save(os.path.join(OUT, "vocos_wav.npy"), v)
    print(f"goldens written to {OUT}")


if __name__ == "__main__":
    main()
