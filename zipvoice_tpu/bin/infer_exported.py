"""Inference from AOT-exported (StableHLO) sampling programs.

Counterpart of the reference's ``infer_zipvoice_onnx`` (ONNX Runtime
inference from exported graphs): loads the serialized programs produced by
``serving.aot.export_sample_program`` and runs zero-shot TTS without
tracing/compiling the model code again.

  python -m zipvoice_tpu.bin.export_model --model-dir DIR --out-dir eng/
  python -m zipvoice_tpu.bin.infer_exported \
    --engine-dir eng --model-dir DIR --prompt-wav p.wav \
    --prompt-text "..." --text "..." --res-wav-path out.wav
"""

import argparse
import json
import logging
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--engine-dir", type=str, required=True)
    p.add_argument("--model-dir", type=str, required=True,
                   help="for tokens.txt + model.pt params + tokenizer")
    p.add_argument("--model-name", type=str, default="zipvoice")
    p.add_argument("--vocoder-path", type=str, default=None)
    p.add_argument("--prompt-wav", type=str, required=True)
    p.add_argument("--prompt-text", type=str, required=True)
    p.add_argument("--text", type=str, required=True)
    p.add_argument("--res-wav-path", type=str, default="out.wav")
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--target-rms", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=666)
    p.add_argument("--platform", type=str, default=None, choices=[None, "cpu"])
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from zipvoice_tpu.frontend.audio import (
        load_wav,
        remove_silence,
        rms_norm,
        save_wav,
    )
    from zipvoice_tpu.frontend.batch import pad_tokens
    from zipvoice_tpu.frontend.feature import VocosFbank
    from zipvoice_tpu.models.zipvoice import strip_prompt
    from zipvoice_tpu.serving.aot import load_exported
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos

    with open(os.path.join(args.engine_dir, "manifest.json")) as f:
        manifest = json.load(f)

    model, params, tokenizer = load_model_dir(args.model_dir, args.model_name)
    vocoder, vp = load_vocos(args.vocoder_path)

    sr = 24000
    feat_scale = 0.1
    wav = load_wav(args.prompt_wav, sr)
    wav = remove_silence(wav, sr, only_edge=False, trail_sil=200)
    wav, prompt_rms = rms_norm(wav, args.target_rms)
    prompt_features = VocosFbank().extract(wav, sr) * feat_scale

    tokens = tokenizer.texts_to_token_ids([args.text])[0]
    prompt_tokens = tokenizer.texts_to_token_ids([args.prompt_text])[0]

    # pick the smallest bucket that fits
    ptl = len(prompt_tokens)
    Tp = prompt_features.shape[0]
    pred = Tp + int(np.ceil(Tp / ptl * len(tokens) / args.speed))
    bucket = None
    for b in manifest["buckets"]:
        if (b["B"] >= 1 and b["S"] >= ptl + len(tokens) + 1
                and b["T"] >= pred):
            bucket = b
            break
    assert bucket is not None, "no exported bucket fits this input"
    B, S, T = bucket["B"], bucket["S"], bucket["T"]

    tok, tok_lens = pad_tokens(
        [prompt_tokens + tokens] * B, pad_id=model.pad_id, pad_to=S
    )
    pf = np.zeros((B, T, prompt_features.shape[1]), np.float32)
    pf[:, :Tp] = prompt_features[None]
    rng = np.random.RandomState(args.seed)
    noise = rng.randn(B, T, prompt_features.shape[1]).astype(np.float32)

    fn = load_exported(os.path.join(args.engine_dir, bucket["file"]))
    x1, padding_mask = fn(
        params, jnp.asarray(tok), jnp.asarray(tok_lens),
        jnp.asarray(np.full((B,), ptl, np.int32)), jnp.asarray(pf),
        jnp.asarray(np.full((B,), Tp, np.int32)),
        jnp.asarray(np.full((B,), pred, np.int32)), jnp.asarray(noise),
    )
    x1_wo, lens = strip_prompt(
        jnp.asarray(x1), jnp.asarray(padding_mask),
        jnp.asarray(np.full((B,), Tp, np.int32)),
    )
    mel = np.asarray(x1_wo)[0, : int(np.asarray(lens)[0])] / feat_scale
    wav_out = np.asarray(vocoder.apply(vp, jnp.asarray(mel)[None]))[0]
    wav_out = np.clip(wav_out, -1, 1)[None, : mel.shape[0] * 256]
    if prompt_rms < args.target_rms:
        wav_out = wav_out * prompt_rms / args.target_rms
    save_wav(args.res_wav_path, wav_out, sr)
    logging.info(
        f"{args.res_wav_path}: {wav_out.shape[-1] / sr:.2f}s "
        f"(bucket B={B} S={S} T={T}, {manifest['num_step']} steps)"
    )


if __name__ == "__main__":
    main()
