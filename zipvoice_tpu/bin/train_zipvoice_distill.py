"""Two-stage distillation training for ZipVoice-Distill.

Reference: zipvoice/bin/train_zipvoice_distill.py (1158 LoC).
Stage "first": frozen base-ZipVoice teacher (pass --teacher-checkpoint, the
averaged base model); student initialized from the same weights.
Stage "second": the teacher is an EMA copy of the student, updated each step.

  python -m zipvoice_tpu.bin.train_zipvoice_distill \
    --distill-stage first --teacher-checkpoint exp/zipvoice/model.pt \
    --train-manifest ... --token-file ... --exp-dir exp/distill_1
"""

import argparse
import json
import logging
import shutil
import time
from pathlib import Path

import numpy as np


def get_parser():
    from zipvoice_tpu.bin.train_zipvoice import get_parser as base_parser

    p = base_parser()
    p.add_argument("--distill-stage", type=str, required=True,
                   choices=["first", "second"])
    p.add_argument("--teacher-checkpoint", type=str, default=None,
                   help="required for stage first (base ZipVoice weights)")
    p.add_argument("--ema-decay", type=float, default=0.9999)
    return p


def main():
    args = get_parser().parse_args()
    args.model_name = "zipvoice_distill"
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )

    import jax

    from zipvoice_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from zipvoice_tpu.bin.train_zipvoice import build_model
    from zipvoice_tpu.data.dataset import (
        SpeechSynthesisDataset,
        prefetch_batches,
    )
    from zipvoice_tpu.data.manifest import mux, read_manifest
    from zipvoice_tpu.data.sampler import DynamicBucketingSampler
    from zipvoice_tpu.frontend.tokenizer import get_tokenizer
    from zipvoice_tpu.models.zipvoice import ZipVoice
    from zipvoice_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from zipvoice_tpu.train.averaging import (
        init_model_avg,
        update_averaged_model,
    )
    from zipvoice_tpu.train.distill import ema_update, make_distill_train_step
    from zipvoice_tpu.train.optim import eden_schedule, scaled_adam
    from zipvoice_tpu.train.train_step import TrainState, init_train_state
    from zipvoice_tpu.utils import checkpoint_io
    from zipvoice_tpu.utils.convert import convert_zipvoice

    exp_dir = Path(args.exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    shutil.copyfile(args.token_file, exp_dir / "tokens.txt")
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    tokenizer = get_tokenizer(args.tokenizer, args.token_file, args.lang)
    student_model, cfg = build_model(args, tokenizer, dtype)
    (exp_dir / "model.json").write_text(json.dumps({"model": cfg}, indent=2))

    # ---- teacher / student initialization ---------------------------------
    assert args.teacher_checkpoint or args.checkpoint, (
        "need --teacher-checkpoint (stage first) or --checkpoint"
    )
    init_ckpt = args.checkpoint or args.teacher_checkpoint
    if init_ckpt.endswith(".pt") or init_ckpt.endswith(".safetensors"):
        params = convert_zipvoice(
            checkpoint_io.load_torch_state_dict(init_ckpt)
        )
    else:
        params, _ = checkpoint_io.load_checkpoint(init_ckpt)
    # the distill student adds guidance_scale_embed params not present in a
    # base checkpoint: init them fresh and graft
    if "guidance_scale_embed" not in params.get("fm_decoder", {}):
        dummy = student_model.init(
            {"params": jax.random.PRNGKey(0)},
            t=jnp.zeros((1,)),
            xt=jnp.zeros((1, 8, student_model.feat_dim)),
            text_condition=jnp.zeros((1, 8, student_model.feat_dim)),
            speech_condition=jnp.zeros((1, 8, student_model.feat_dim)),
            guidance_scale=jnp.zeros((1,)),
            method="forward_fm_decoder",
        )["params"]
        params.setdefault("fm_decoder", {})["guidance_scale_embed"] = (
            dummy["fm_decoder"]["guidance_scale_embed"]
        )

    if args.distill_stage == "first":
        teacher_model = ZipVoice(
            **cfg, vocab_size=tokenizer.vocab_size, pad_id=tokenizer.pad_id,
            dtype=dtype,
        )
        teacher_params = convert_zipvoice(
            checkpoint_io.load_torch_state_dict(args.teacher_checkpoint)
        ) if args.teacher_checkpoint.endswith((".pt", ".safetensors")) else (
            checkpoint_io.load_checkpoint(args.teacher_checkpoint)[0]
        )
    else:
        teacher_model = student_model
        teacher_params = jax.tree.map(np.copy, params)

    # ---- data -------------------------------------------------------------
    manifests = [read_manifest(m) for m in args.train_manifest]
    weights = args.train_weight or [len(m) for m in manifests]
    cuts = (
        mux(manifests, weights, seed=args.seed)
        if len(manifests) > 1 else manifests[0]
    )
    cuts = [c for c in cuts if args.min_len <= c.duration <= args.max_len]
    sampler = DynamicBucketingSampler(
        cuts, max_duration=args.max_duration, num_buckets=args.num_buckets,
        shuffle=True, seed=args.seed, drop_last=True,
    )
    dataset = SpeechSynthesisDataset(
        tokenizer=tokenizer, on_the_fly_feats=args.on_the_fly_feats,
        feat_scale=args.feat_scale,
    )

    schedule = eden_schedule(
        base_lr=args.base_lr, lr_batches=args.lr_batches,
        lr_epochs=args.lr_epochs, warmup_batches=args.warmup_batches,
        batches_per_epoch=max(1, len(sampler)),
    )
    tx = scaled_adam(lr=schedule, clipping_scale=args.clipping_scale)
    mesh = make_mesh(n_data=args.num_data_parallel)
    if args.per_host_data == "on" or (
        args.per_host_data == "auto" and jax.process_count() > 1
    ):
        from zipvoice_tpu.parallel.mesh import local_batch_rows

        _rows_cache = {}

        def _rows_fn(B_pad):
            if B_pad not in _rows_cache:
                _rows_cache[B_pad] = local_batch_rows(mesh, B_pad)
            return _rows_cache[B_pad]

        dataset.local_rows_fn = _rows_fn
        logging.info("per-host data loading enabled")
    step_fn = make_distill_train_step(
        student_model, teacher_model, tx, stage=args.distill_stage, mesh=mesh,
        schedules=args.schedules, max_duration=args.max_duration,
        ref_duration=args.ref_duration,
    )

    state = init_train_state(params, tx)
    model_avg = init_model_avg(params)
    state = TrainState(
        params=replicate_tree(state.params, mesh),
        opt_state=replicate_tree(state.opt_state, mesh),
        step=replicate_tree(state.step, mesh),
    )
    teacher_params = replicate_tree(teacher_params, mesh)

    rng = jax.random.PRNGKey(args.seed)
    tot_loss, tot_frames, t0 = 0.0, 0, time.time()
    last_epoch = args.num_epochs if not args.num_iters else 10**9
    for epoch in range(args.start_epoch, last_epoch + 1):
        sampler.set_epoch(epoch)
        for batch in prefetch_batches(sampler, dataset):
            sel = {k: v for k, v in batch.items()
                   if k in ("tokens", "tokens_lens", "features",
                            "features_lens")}
            if "global_batch_size" in batch:
                from zipvoice_tpu.parallel.mesh import shard_batch_per_host

                sharded = shard_batch_per_host(
                    sel, mesh, batch["global_batch_size"]
                )
            else:
                sharded = shard_batch(sel, mesh)
            state, metrics = step_fn(state, teacher_params, sharded, rng)
            if args.distill_stage == "second":
                teacher_params = ema_update(
                    teacher_params, state.params, args.ema_decay
                )
            step = int(state.step)
            frames = int(batch["features_lens"].sum())
            loss = float(metrics["loss"])
            tot_loss += loss * frames
            tot_frames += frames
            if step % args.log_interval == 0:
                logging.info(
                    f"epoch {epoch} step {step}: loss {loss:.5f} "
                    f"ref_loss {float(metrics['ref_loss']):.4f} "
                    f"(avg {tot_loss / max(tot_frames, 1):.5f}) "
                    f"frames/s {tot_frames / max(time.time() - t0, 1e-9):.0f}"
                )
                tot_loss, tot_frames, t0 = 0.0, 0, time.time()
            if step % args.average_period == 0:
                model_avg = update_averaged_model(
                    model_avg, jax.device_get(state.params), step,
                    args.average_period,
                )
            if args.save_every_n > 0 and step % args.save_every_n == 0:
                path = exp_dir / f"checkpoint-{step}"
                checkpoint_io.save_checkpoint(
                    str(path), jax.device_get(state),
                    extra={"batch_idx_train": step,
                           "average_period": args.average_period},
                )
                checkpoint_io.save_checkpoint(str(path) + "-avg", model_avg)
            if args.num_iters and step >= args.num_iters:
                break
        if args.num_iters and int(state.step) >= args.num_iters:
            final = exp_dir / f"checkpoint-{int(state.step)}"
            checkpoint_io.save_checkpoint(
                str(final), jax.device_get(state),
                extra={"batch_idx_train": int(state.step),
                       "average_period": args.average_period},
            )
            checkpoint_io.save_checkpoint(str(final) + "-avg", model_avg)
            logging.info(f"reached --num-iters {args.num_iters}; stopping")
            break
        path = exp_dir / f"epoch-{epoch}"
        checkpoint_io.save_checkpoint(
            str(path), jax.device_get(state),
            extra={"batch_idx_train": int(state.step),
                   "average_period": args.average_period},
        )
        checkpoint_io.save_checkpoint(str(path) + "-avg", model_avg)
        logging.info(f"saved epoch-{epoch}")
    logging.info("distillation done")


if __name__ == "__main__":
    main()
