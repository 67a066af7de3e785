"""Dialogue TTS inference CLI (mono and stereo).

TPU-native counterpart of the reference
``python -m zipvoice.bin.infer_zipvoice_dialog`` (1286 LoC).

Mono:
  python -m zipvoice_tpu.bin.infer_zipvoice_dialog \
    --model-name zipvoice_dialog --model-dir DIR --vocoder-path VOCOS \
    --prompt-text-1 "..." --prompt-wav-1 a.wav \
    --prompt-text-2 "..." --prompt-wav-2 b.wav \
    --text "[S1] hi there [S2] hello!" --res-wav-path out.wav

Stereo: add --model-name zipvoice_dialog_stereo (prompts land on separate
channels; a single stereo --prompt-wav-1 also works with --merged-prompt).
"""

import argparse
import logging


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-name", type=str, default="zipvoice_dialog",
                   choices=["zipvoice_dialog", "zipvoice_dialog_stereo"])
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--vocoder-path", type=str, default=None)
    p.add_argument("--prompt-text-1", type=str, default=None)
    p.add_argument("--prompt-wav-1", type=str, default=None)
    p.add_argument("--prompt-text-2", type=str, default=None)
    p.add_argument("--prompt-wav-2", type=str, default=None)
    p.add_argument("--merged-prompt", action="store_true",
                   help="prompt-1 is a pre-merged [S1]..[S2].. prompt")
    p.add_argument("--text", type=str, default=None)
    p.add_argument("--test-list", type=str, default=None,
                   help="tsv rows: name\tptext\tpwav\ttext (merged prompt) "
                        "or name\tptext1\tptext2\tpwav1\tpwav2\ttext")
    p.add_argument("--res-dir", type=str, default="results")
    p.add_argument("--res-wav-path", type=str, default="out.wav")
    p.add_argument("--num-step", type=int, default=16)
    p.add_argument("--guidance-scale", type=float, default=1.5)
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--t-shift", type=float, default=0.5)
    p.add_argument("--target-rms", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=666)
    p.add_argument("--platform", type=str, default=None, choices=[None, "cpu"])
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--use-pallas-attention", action="store_true",
                   help="fused pallas attention kernel at the top U-Net "
                        "level (long first compile; persistently cached)")
    return p


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    from zipvoice_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from zipvoice_tpu.frontend.audio import save_wav
    from zipvoice_tpu.infer.dialog_pipeline import (
        DialogInferencePipeline,
        StereoDialogInferencePipeline,
    )
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model, params, tokenizer = load_model_dir(
        args.model_dir, args.model_name, dtype=dtype,
        use_pallas_attention=args.use_pallas_attention,
    )
    vocoder, vp = load_vocos(args.vocoder_path, dtype=dtype)
    if args.vocoder_path is None:
        logging.warning("randomly-initialized vocoder: output will be noise")

    jobs = []
    if args.test_list:
        # reference test-list formats (infer_zipvoice_dialog.py:1072-1089)
        import os

        os.makedirs(args.res_dir, exist_ok=True)
        with open(args.test_list) as f:
            for line in f:
                items = line.strip().split("\t")
                if len(items) == 6:
                    name, pt1, pt2, pw1, pw2, text = items
                    jobs.append((os.path.join(args.res_dir, name + ".wav"),
                                 [pt1, pt2], [pw1, pw2], text))
                elif len(items) == 4:
                    name, pt, pw, text = items
                    jobs.append((os.path.join(args.res_dir, name + ".wav"),
                                 pt, pw, text))
                else:
                    raise ValueError(f"invalid test-list line: {line!r}")
    else:
        assert args.text is not None, "--text or --test-list required"
        if args.merged_prompt or args.prompt_wav_2 is None:
            prompt_text = args.prompt_text_1
            prompt_wav = args.prompt_wav_1
        else:
            prompt_text = [args.prompt_text_1, args.prompt_text_2]
            prompt_wav = [args.prompt_wav_1, args.prompt_wav_2]
        jobs.append((args.res_wav_path, prompt_text, prompt_wav, args.text))

    if args.model_name == "zipvoice_dialog_stereo":
        pipe = StereoDialogInferencePipeline(
            model, params, vocoder, vp, tokenizer, seed=args.seed
        )
        generate = pipe.generate_dialog_stereo
    else:
        pipe = DialogInferencePipeline(
            model, params, vocoder, vp, tokenizer, seed=args.seed
        )
        generate = pipe.generate_dialog

    for save_path, prompt_text, prompt_wav, text in jobs:
        wav, metrics = generate(
            prompt_text=prompt_text,
            prompt_wav_path=prompt_wav,
            text=text,
            num_step=args.num_step,
            guidance_scale=args.guidance_scale,
            speed=args.speed,
            t_shift=args.t_shift,
            target_rms=args.target_rms,
        )
        save_wav(save_path, wav, pipe.sampling_rate)
        logging.info(
            f"{save_path}: {metrics['wav_seconds']:.2f}s audio, "
            f"rtf {metrics['rtf']:.4f}"
        )


if __name__ == "__main__":
    main()
