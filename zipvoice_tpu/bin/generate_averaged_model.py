"""Produce a release model by averaging checkpoints.

Reference: zipvoice/bin/generate_averaged_model.py (offline range averaging
over the fp64 running averages saved with each epoch checkpoint, producing
e.g. ``epoch-11-avg-4`` release weights).

  python -m zipvoice_tpu.bin.generate_averaged_model \
    --exp-dir exp/zipvoice --epoch 11 --avg 4 --out exp/zipvoice/model
"""

import argparse
import logging
import os


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp-dir", type=str, required=True)
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--iter", type=int, default=None)
    p.add_argument("--avg", type=int, required=True,
                   help="number of epochs/iters before --epoch to average over")
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from zipvoice_tpu.train.averaging import (
        average_checkpoints_with_averaged_model,
    )
    from zipvoice_tpu.utils import checkpoint_io

    assert (args.epoch is None) != (args.iter is None), (
        "give exactly one of --epoch/--iter"
    )
    if args.epoch is not None:
        end_name = f"epoch-{args.epoch}"
        start_name = f"epoch-{args.epoch - args.avg}"
    else:
        # enumerate existing checkpoint-* saves (reference find_checkpoints,
        # checkpoint.py) — iteration checkpoints land at multiples of
        # --save-every-n, so stepping back by raw iteration count would name
        # files that never existed.  start = `avg` saves before the end one.
        import re

        iters = sorted(
            int(m.group(1))
            for name in os.listdir(args.exp_dir)
            if (m := re.fullmatch(r"checkpoint-(\d+)", name))
            and int(m.group(1)) <= args.iter
        )
        assert iters, f"no checkpoint-* at or below {args.iter} in {args.exp_dir}"
        end_iter = iters[-1]
        assert len(iters) > args.avg, (
            f"need {args.avg + 1} checkpoints at or below {args.iter}, "
            f"found {len(iters)}: {iters}"
        )
        start_iter = iters[-1 - args.avg]
        end_name = f"checkpoint-{end_iter}"
        start_name = f"checkpoint-{start_iter}"

    def load(name):
        path = os.path.join(args.exp_dir, name)
        avg, _ = checkpoint_io.load_checkpoint(path + "-avg")
        _, extra = checkpoint_io.load_checkpoint(path)
        return avg, extra["batch_idx_train"], extra["average_period"]

    avg_end, b_end, period = load(end_name)
    avg_start, b_start, _ = load(start_name)
    params = average_checkpoints_with_averaged_model(
        avg_start, avg_end, b_start, b_end, period
    )
    checkpoint_io.save_checkpoint(args.out, params)
    logging.info(f"wrote averaged model to {args.out} "
                 f"(batches {b_start}..{b_end})")


if __name__ == "__main__":
    main()
