"""Zero-shot TTS inference CLI (TPU-native counterpart of the reference
``python -m zipvoice.bin.infer_zipvoice``, reference infer_zipvoice.py:720+).

Examples:
  python -m zipvoice_tpu.bin.infer_zipvoice \
      --model-dir /path/to/zipvoice  --vocoder-path /path/to/vocos.bin \
      --prompt-wav prompt.wav --prompt-text "..." \
      --text "Hello world." --res-wav-path out.wav

Differences vs the reference CLI:
- no HuggingFace auto-download (pass --model-dir; this environment has no
  egress).  The dir layout is the same: model.pt|model.safetensors,
  model.json, tokens.txt.
- --platform cpu|tpu selects the jax backend explicitly.
"""

import argparse
import logging
import os


def get_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--model-name", type=str, default="zipvoice",
        choices=["zipvoice", "zipvoice_distill"],
    )
    parser.add_argument("--model-dir", type=str, required=True,
                        help="dir with model.pt/model.json/tokens.txt")
    parser.add_argument("--vocoder-path", type=str, default=None,
                        help="vocos pytorch_model.bin (random init if absent)")
    parser.add_argument("--prompt-wav", type=str, default=None,
                        help="required unless --test-list is given")
    parser.add_argument("--prompt-text", type=str, default=None)
    parser.add_argument("--text", type=str, default=None)
    parser.add_argument("--test-list", type=str, default=None,
                        help="tsv: wav_name\\tprompt_text\\tprompt_wav\\ttext")
    parser.add_argument("--res-wav-path", type=str, default="out.wav")
    parser.add_argument("--res-dir", type=str, default="results")
    parser.add_argument("--num-step", type=int, default=None)
    parser.add_argument("--guidance-scale", type=float, default=None)
    parser.add_argument("--speed", type=float, default=1.0)
    parser.add_argument("--t-shift", type=float, default=0.5)
    parser.add_argument("--target-rms", type=float, default=0.1)
    parser.add_argument("--max-duration", type=float, default=100.0)
    parser.add_argument("--remove-long-sil", action="store_true")
    parser.add_argument("--raw-evaluation", action="store_true",
                        help="no chunking/silence processing (benchmark sets)")
    parser.add_argument("--seed", type=int, default=666)
    parser.add_argument("--platform", type=str, default=None,
                        choices=[None, "cpu", "tpu"])
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 compute (fp32 params)")
    parser.add_argument("--use-pallas-attention", action="store_true",
                        help="fused pallas attention-weights kernel at the "
                             "top U-Net level (long first compile; cached)")
    return parser


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
    from zipvoice_tpu.infer.pipeline import InferencePipeline
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir, load_vocos

    # per-model sampling defaults (reference infer_zipvoice.py:732-741)
    if args.num_step is None:
        args.num_step = 16 if args.model_name == "zipvoice" else 8
    if args.guidance_scale is None:
        args.guidance_scale = 1.0 if args.model_name == "zipvoice" else 3.0

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model, params, tokenizer = load_model_dir(
        args.model_dir, args.model_name, dtype=dtype,
        use_pallas_attention=args.use_pallas_attention,
    )
    vocoder, vocoder_params = load_vocos(args.vocoder_path, dtype=dtype)
    if args.vocoder_path is None:
        logging.warning(
            "no --vocoder-path: vocoder is RANDOMLY initialized; output "
            "audio will be noise (features are still valid)"
        )

    pipe = InferencePipeline(
        model, params, vocoder, vocoder_params, tokenizer, seed=args.seed
    )

    jobs = []
    if args.test_list:
        with open(args.test_list) as f:
            for line in f:
                name, ptext, pwav, text = line.strip().split("\t")
                jobs.append((os.path.join(args.res_dir, name + ".wav"),
                             ptext, pwav, text))
        os.makedirs(args.res_dir, exist_ok=True)
    else:
        assert args.text is not None, "--text or --test-list required"
        assert args.prompt_wav and args.prompt_text, (
            "--prompt-wav/--prompt-text required without --test-list"
        )
        jobs.append((args.res_wav_path, args.prompt_text, args.prompt_wav,
                     args.text))

    total_t, total_audio = 0.0, 0.0
    for save_path, prompt_text, prompt_wav, text in jobs:
        common = dict(
            prompt_text=prompt_text,
            prompt_wav_path=prompt_wav,
            text=text,
            num_step=args.num_step,
            guidance_scale=args.guidance_scale,
            speed=args.speed,
            t_shift=args.t_shift,
            target_rms=args.target_rms,
        )
        if args.raw_evaluation:
            wav, metrics = pipe.generate_raw(**common)
            metrics.setdefault("rtf_no_vocoder", metrics["rtf"])
            metrics.setdefault("rtf_vocoder", 0.0)
        else:
            wav, metrics = pipe.generate_sentence(
                **common,
                max_duration=args.max_duration,
                remove_long_sil=args.remove_long_sil,
            )
        save_wav(save_path, wav, pipe.sampling_rate)
        total_t += metrics["t"]
        total_audio += metrics["wav_seconds"]
        logging.info(
            f"{save_path}: {metrics['wav_seconds']:.2f}s audio, "
            f"rtf {metrics['rtf']:.4f} (model {metrics['rtf_no_vocoder']:.4f}"
            f" + vocoder {metrics['rtf_vocoder']:.4f})"
        )
    logging.info(
        f"total: {total_audio:.2f}s audio in {total_t:.2f}s "
        f"(rtf {total_t / max(total_audio, 1e-9):.4f})"
    )


if __name__ == "__main__":
    main()
