"""Export a natively-trained (orbax) model as a reference-layout model.pt.

Lets users of the reference ecosystem consume models trained here:
the output dir gets model.pt + model.json + tokens.txt, loadable by the
reference's ``zipvoice.bin.infer_zipvoice --model-dir``.

  python -m zipvoice_tpu.bin.export_torch_checkpoint \
    --exp-dir exp/zipvoice --checkpoint exp/zipvoice/model_avg \
    --out-dir release/zipvoice
"""

import argparse
import json
import logging
import os
import shutil


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp-dir", type=str, required=True,
                   help="training dir (for model.json + tokens.txt)")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="orbax params dir (e.g. from generate_averaged_model)")
    p.add_argument("--out-dir", type=str, required=True)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from zipvoice_tpu.utils import checkpoint_io
    from zipvoice_tpu.utils.convert import invert_zipvoice

    params, _ = checkpoint_io.load_checkpoint(args.checkpoint)
    if isinstance(params, dict) and "params" in params:
        params = params["params"]

    with open(os.path.join(args.exp_dir, "model.json")) as f:
        cfg = json.load(f)["model"]
    ds = {
        "fm_decoder": tuple(cfg.get("fm_decoder_downsampling_factor",
                                    (1, 2, 4, 2, 1))),
        "text_encoder": (1,),
    }
    sd = invert_zipvoice(params, downsampling_factors=ds)
    os.makedirs(args.out_dir, exist_ok=True)
    torch.save(
        {"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
        os.path.join(args.out_dir, "model.pt"),
    )
    shutil.copyfile(os.path.join(args.exp_dir, "model.json"),
                    os.path.join(args.out_dir, "model.json"))
    shutil.copyfile(os.path.join(args.exp_dir, "tokens.txt"),
                    os.path.join(args.out_dir, "tokens.txt"))
    logging.info(f"exported {len(sd)} tensors to {args.out_dir}/model.pt")


if __name__ == "__main__":
    main()
