"""Dump reference goldens for the real-checkpoint suite.

Runs the REFERENCE implementation (torch, /root/reference) on the
published artifacts and writes the golden tensors that
tests/test_real_weights.py compares our TPU pipeline against:
{zipvoice_raw_noise,zipvoice_raw_mel,zipvoice_raw_wav,vocos_wav}.npy.

  PYTHONPATH=/root/reference python tools/dump_real_weight_goldens.py \
      --ckpt-dir /models/zipvoice --vocos-ckpt /models/vocos/pytorch_model.bin

Self-contained by design — weights day must be a zero-debug event
(VERDICT r3 #9), so every native reference dependency has a first-party
fallback when the real package is absent in the environment:

- vocos package       -> tools/torch_vocos.TorchVocos (published
                         state-dict schema, converter-tested)
- piper/jieba/pypinyin-> tools/dump_reference_tokens.install_stubs()
                         (the same first-party G2P stand-ins that
                         generated the committed token fixtures)
- torchaudio/lhotse   -> zipvoice_tpu.frontend audio + VocosFbank
                         (parity-tested vs torchaudio, tests/test_stft.py)

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
OUT_DEFAULT = os.path.join(HERE, "tests", "fixtures", "real_goldens")
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))
sys.path.insert(0, os.path.join(HERE, "tools"))


def load_vocoder(vocos_ckpt: str, **cfg):
    """The published mel-24khz vocoder.  Prefer the REAL vocos package
    when importable (like make_tokenizer prefers the reference
    tokenizer): wav goldens dumped from the actual published head are
    what drop-in parity means — dumping from the first-party TorchVocos
    would be circular (it can't catch its own iSTFT-head deviations,
    e.g. 'same'-padding overlap-add vs torch.istft center=True).  Fall
    back to the schema-matched first-party torch module
    (tools/torch_vocos.py) only when vocos isn't installed; the schema
    is pinned by tests/test_full_scale_parity.py.  On weights day, when
    both are importable, _maybe_diff_vocos_heads also records the
    TorchVocos-vs-vocos wav deviation once."""
    hparams = os.environ.get("ZIPVOICE_VOCOS_HPARAMS", "")
    try:
        from vocos import Vocos as RealVocos
        import torch

        if cfg and not hparams:
            # a TorchVocos-kwargs override (rehearsal/tiny ckpts) can't
            # configure the real package; it needs its own hparams yaml
            raise ImportError("custom cfg without ZIPVOICE_VOCOS_HPARAMS")
        model = (RealVocos.from_hparams(hparams) if hparams
                 else RealVocos.from_pretrained("charactr/vocos-mel-24khz"))
        state = torch.load(vocos_ckpt, map_location="cpu",
                           weights_only=True)
        state = state.get("state_dict", state)
        state = {k: v for k, v in state.items()
                 if k.startswith(("backbone.", "head."))}
        model.load_state_dict(state, strict=False)
        model.eval()
        print("load_vocoder: using the REAL vocos package")
        _maybe_diff_vocos_heads(model, vocos_ckpt, **cfg)
        return model
    except ImportError:
        from torch_vocos import TorchVocos

        print("load_vocoder: vocos not importable/configurable here; "
              "first-party TorchVocos")
        return TorchVocos.from_checkpoint(vocos_ckpt, **cfg)


def _maybe_diff_vocos_heads(real_model, vocos_ckpt: str, **cfg):
    """One-shot A/B: real vocos head vs first-party TorchVocos on a fixed
    mel, so a head deviation is caught the day weights land (ADVICE r4)."""
    import torch

    try:
        from torch_vocos import TorchVocos

        ours = TorchVocos.from_checkpoint(vocos_ckpt, **cfg)
    except Exception as e:  # noqa: BLE001
        print(f"vocos-head A/B skipped: TorchVocos load failed ({e})")
        return
    with torch.no_grad():
        mel = torch.randn(1, 100, 200, generator=torch.Generator()
                          .manual_seed(0))
        try:
            a = real_model.decode(mel)
        except Exception as e:  # noqa: BLE001
            print(f"vocos-head A/B skipped: real decode failed ({e})")
            return
        b = ours.decode(mel)
        n = min(a.shape[-1], b.shape[-1])
        dev = (a[..., :n] - b[..., :n]).abs().max().item()
        print(f"vocos-head A/B: max |real - TorchVocos| = {dev:.6f} "
              f"(lens {a.shape[-1]} vs {b.shape[-1]})")


def load_prompt_features(prompt_path: str):
    """prompt wav -> torch (1, T, 100) fbank x0.1, via torchaudio +
    reference VocosFbank when importable, else the first-party pair."""
    import torch

    try:
        import torchaudio

        from zipvoice.utils.feature import VocosFbank as RefFbank

        wav, sr = torchaudio.load(prompt_path)
        feats = RefFbank().extract(wav, sampling_rate=sr)
        return feats.unsqueeze(0) * 0.1
    except ImportError:
        from zipvoice_tpu.frontend.audio import load_wav
        from zipvoice_tpu.frontend.feature import VocosFbank

        wav = load_wav(prompt_path, 24000)
        feats = VocosFbank().extract(wav, 24000) * 0.1
        return torch.from_numpy(np.asarray(feats)).unsqueeze(0)


def make_tokenizer(token_file: str):
    """Reference EmiliaTokenizer; when its native deps (piper_phonemize,
    jieba, pypinyin, lhotse) are absent, install the same first-party
    stand-ins that generated the committed token fixtures."""
    try:
        from zipvoice.tokenizer.tokenizer import EmiliaTokenizer
    except Exception:  # noqa: BLE001 - any missing native dep
        from dump_reference_tokens import install_stubs

        install_stubs()
        from zipvoice.tokenizer.tokenizer import EmiliaTokenizer
    return EmiliaTokenizer(token_file)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", required=True,
                    help="published ZipVoice dir (model.pt/model.json/"
                         "tokens.txt)")
    ap.add_argument("--vocos-ckpt", required=True,
                    help="charactr/vocos-mel-24khz pytorch_model.bin")
    ap.add_argument("--out", default=OUT_DEFAULT,
                    help="golden output dir (default: the directory "
                         "tests/test_real_weights.py reads)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import torch

    from test_real_weights import (
        GEN_TEXT,
        PROMPT_TEXT,
        fixture_prompt_wav,
    )
    from zipvoice.models.zipvoice import ZipVoice

    tokenizer = make_tokenizer(os.path.join(args.ckpt_dir, "tokens.txt"))
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

    # config override for rehearsal/tiny checkpoints
    # (tests/test_goldens_rehearsal.py); default = published mel-24khz
    vcfg = json.loads(os.environ.get("ZIPVOICE_VOCOS_CFG", "{}"))
    vocoder = load_vocoder(args.vocos_ckpt, **vcfg)

    prompt_path = fixture_prompt_wav("/tmp/golden_prompt.wav")
    prompt_features = load_prompt_features(prompt_path)

    tokens = tokenizer.texts_to_token_ids([GEN_TEXT])
    prompt_tokens = tokenizer.texts_to_token_ids([PROMPT_TEXT])

    # draw the ODE noise ONCE and replay it on both sides (the shape
    # depends on the model's internal duration prediction, so intercept
    # torch.randn during the sample call)
    recorded = {}
    real_randn = torch.randn

    def record_randn(*shape, **kw):
        t = real_randn(*shape, **kw)
        recorded["noise"] = t.detach().cpu().numpy()
        return t

    torch.randn = record_randn
    try:
        with torch.no_grad():
            # (x1_wo_prompt, x1_wo_prompt_lens, x1_prompt, prompt_lens),
            # reference zipvoice.py:486
            mel, mel_lens, _, _ = model.sample(
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
    np.save(os.path.join(args.out, "zipvoice_raw_noise.npy"),
            recorded["noise"])
    np.save(os.path.join(args.out, "zipvoice_raw_mel.npy"), mel)

    with torch.no_grad():
        wav_out = vocoder.decode(
            torch.from_numpy(mel).T.unsqueeze(0)
        ).cpu().numpy()
    np.save(os.path.join(args.out, "zipvoice_raw_wav.npy"), wav_out)

    # standalone vocos golden on a deterministic mel
    rng = np.random.RandomState(0)
    T = 96
    test_mel = (rng.randn(1, T, 100) * 0.5 - 1.0).astype(np.float32)
    with torch.no_grad():
        v = vocoder.decode(
            torch.from_numpy(test_mel).transpose(1, 2)
        ).cpu().numpy()
    np.save(os.path.join(args.out, "vocos_wav.npy"), v)
    print(f"goldens written to {args.out}")


if __name__ == "__main__":
    main()
