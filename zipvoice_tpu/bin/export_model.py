"""Export compiled sampling programs (StableHLO "engines").

Counterpart of the reference's onnx_export.py / tensorrt_export.py
(reference zipvoice/bin/): serializes the full jitted sample program at a
set of shape buckets via jax.export.

  python -m zipvoice_tpu.bin.export_model --model-dir DIR --out-dir eng \
    [--buckets "1:128:1024,4:128:1280"] [--num-step 16] [--guidance-scale 1]
"""

import argparse
import logging


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--model-name", type=str, default="zipvoice")
    p.add_argument("--out-dir", type=str, required=True)
    p.add_argument("--buckets", type=str, default="1:128:1024",
                   help="comma list of B:S:T shape buckets")
    p.add_argument("--num-step", type=int, default=16)
    p.add_argument("--guidance-scale", type=float, default=1.0)
    p.add_argument("--t-shift", type=float, default=0.5)
    p.add_argument("--platform", type=str, default=None, choices=[None, "cpu"])
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    from zipvoice_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from zipvoice_tpu.serving.aot import export_sample_program
    from zipvoice_tpu.utils.checkpoint_io import load_model_dir

    model, params, _ = load_model_dir(args.model_dir, args.model_name)
    buckets = [
        tuple(int(x) for x in b.split(":"))
        for b in args.buckets.split(",")
    ]
    manifest = export_sample_program(
        model, params, args.out_dir, buckets=buckets,
        num_step=args.num_step, guidance_scale=args.guidance_scale,
        t_shift=args.t_shift,
    )
    logging.info(f"exported {len(manifest['buckets'])} programs to "
                 f"{args.out_dir}")


if __name__ == "__main__":
    main()
