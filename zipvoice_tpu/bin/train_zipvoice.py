"""Train ZipVoice (flow-matching TTS) on TPU.

TPU-native counterpart of the reference trainer
(reference zipvoice/bin/train_zipvoice.py, 1130 LoC): data-parallel over a
jax Mesh (XLA gradient allreduce replaces DDP/NCCL), bf16 compute / fp32
params with NO GradScaler (intentional divergence from fp16 AMP,
SURVEY.md §7), ScaledAdam + Eden, running fp64 model average, orbax
checkpoints with rotation, resumable sampler state.

Example:
  python -m zipvoice_tpu.bin.train_zipvoice \
    --manifest-dir data/manifests --token-file data/tokens.txt \
    --exp-dir exp/zipvoice --num-epochs 11 --max-duration 250
"""

import argparse
import json
import logging
import os
import shutil
import time
from pathlib import Path

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    # model / tokenizer
    p.add_argument("--model-config", type=str, default=None,
                   help="model.json; defaults to the base ZipVoice config")
    p.add_argument("--token-file", type=str, required=True)
    p.add_argument("--tokenizer", type=str, default="emilia",
                   choices=["emilia", "espeak", "dialog", "libritts", "simple"])
    p.add_argument("--lang", type=str, default="en-us")
    p.add_argument("--model-name", type=str, default="zipvoice",
                   choices=["zipvoice", "zipvoice_distill", "zipvoice_dialog",
                            "zipvoice_dialog_stereo"])
    # data
    p.add_argument("--train-manifest", type=str, action="append",
                   required=True, help="may repeat for muxed corpora")
    p.add_argument("--train-weight", type=float, action="append", default=None)
    p.add_argument("--dev-manifest", type=str, default=None)
    p.add_argument("--max-duration", type=float, default=250.0)
    p.add_argument("--num-buckets", type=int, default=30)
    p.add_argument("--on-the-fly-feats", action="store_true")
    p.add_argument("--streaming", action="store_true",
                   help="lazy manifest iteration with bounded shuffle/bucket "
                        "buffers (constant RSS at any corpus scale; the "
                        "reference streams lazy CutSets, datamodule.py:177-195)")
    p.add_argument("--shuffle-buffer", type=int, default=10000,
                   help="streaming shuffle buffer, in cuts")
    p.add_argument("--num-workers", type=int, default=2,
                   help="concurrent batch-assembly workers (the reference "
                        "uses 8 DataLoader workers, datamodule.py:143-151)")
    p.add_argument("--per-host-data", type=str, default="auto",
                   choices=("auto", "on", "off"),
                   help="each process materializes only its own batch rows "
                        "(feature IO sharded ~1/N per host; batch "
                        "composition stays global so padded shapes agree). "
                        "auto = on when multi-process. Replaces the "
                        "reference's per-rank DataLoader shards "
                        "(datamodule.py:177-195)")
    p.add_argument("--min-len", type=float, default=1.0)
    p.add_argument("--max-len", type=float, default=30.0)
    # optimization (reference train_zipvoice.py defaults)
    p.add_argument("--base-lr", type=float, default=0.02)
    p.add_argument("--scheduler", type=str, default="eden",
                   choices=["eden", "fixed"],
                   help="fixed = constant base-lr (the reference "
                        "FixedLRScheduler, used for finetuning)")
    p.add_argument("--lr-batches", type=float, default=7500)
    p.add_argument("--lr-epochs", type=float, default=10)
    p.add_argument("--lr-hours", type=float, default=0,
                   help="if >0, re-base the epoch axis to hours of audio")
    p.add_argument("--warmup-batches", type=float, default=500)
    p.add_argument("--clipping-scale", type=float, default=2.0)
    p.add_argument("--num-epochs", type=int, default=11)
    p.add_argument("--num-iters", type=int, default=0,
                   help="if >0, stop after this many optimizer steps "
                        "(reference --num-iters, used by finetune/distill)")
    p.add_argument("--condition-drop-ratio", type=float, default=0.2)
    p.add_argument("--dropout-rate", type=float, default=None,
                   help="Static dropout override; default follows the "
                        "reference's scheduled 0.3->0.1/20k ramp")
    p.add_argument("--no-schedules", dest="schedules", action="store_false",
                   default=True,
                   help="Disable the batch-count training schedules "
                        "(scheduled dropout, module skipping, const-attention"
                        ", bypass clamping, scheduled regularizer bounds)")
    p.add_argument("--ref-duration", type=float, default=50.0,
                   help="Reference batch duration for the schedule clock "
                        "(reference train_zipvoice.py:195-202)")
    p.add_argument("--finetune", action="store_true",
                   help="Shift the schedule clock past every ramp (+100k "
                        "batches, reference train_zipvoice.py:553-557)")
    p.add_argument("--feat-scale", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=42)
    # infra
    p.add_argument("--exp-dir", type=str, required=True)
    p.add_argument("--start-epoch", type=int, default=1)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="torch .pt / orbax dir to initialize from")
    p.add_argument("--init-from-base", type=str, default=None,
                   help="dialog finetune: base ZipVoice ckpt; the embedding "
                        "table is vocab-extended (reference "
                        "checkpoint.py:147-170)")
    p.add_argument("--init-from-dialog", type=str, default=None,
                   help="stereo finetune: mono Dialog ckpt; fm_decoder "
                        "projections are duplicated for two-stream "
                        "(reference checkpoint.py:173-229)")
    p.add_argument("--save-every-n", type=int, default=5000)
    p.add_argument("--keep-last-k", type=int, default=30)
    p.add_argument("--average-period", type=int, default=200)
    p.add_argument("--valid-interval", type=int, default=2000)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--num-data-parallel", type=int, default=None)
    # multi-host: jax.distributed (replaces the reference's mp.spawn + NCCL
    # process groups, train_zipvoice.py:1113-1124 / common.py:187-213)
    p.add_argument("--coordinator-address", type=str, default=None,
                   help="host:port of process 0 for multi-host training")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--platform", type=str, default=None, choices=[None, "cpu"])
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--use-pallas-attention", action="store_true",
                   help="train with the fused pallas attention-weights "
                        "kernel (custom VJP) at U-Net levels with "
                        "T >= ops.pallas_attention.MIN_SEQ_LEN; long first "
                        "Mosaic compile, persistently cached")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--inf-check", action="store_true",
                   help="assert finite loss/grads every step")
    p.add_argument("--scan-oom", action="store_true",
                   help="before training, run one step on the largest "
                        "bucket shape to surface OOM early (reference "
                        "--scan-oom, train_zipvoice.py:798-848)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="dump a jax.profiler trace of batches 10-14 of this "
                        "run (counted from invocation, so it also fires on "
                        "resumed runs) into this dir (view with "
                        "tensorboard/xprof); the reference has no profiler "
                        "integration, SURVEY §5")
    p.add_argument("--print-diagnostics", action="store_true",
                   help="dump per-module activation statistics for one "
                        "batch and exit (reference --print-diagnostics)")
    return p


BASE_CONFIG = dict(
    fm_decoder_downsampling_factor=[1, 2, 4, 2, 1],
    fm_decoder_num_layers=[2, 2, 4, 4, 4],
    fm_decoder_cnn_module_kernel=[31, 15, 7, 15, 31],
    fm_decoder_feedforward_dim=1536,
    fm_decoder_num_heads=4,
    fm_decoder_dim=512,
    text_encoder_num_layers=4,
    text_encoder_feedforward_dim=512,
    text_encoder_cnn_module_kernel=9,
    text_encoder_num_heads=4,
    text_encoder_dim=192,
    time_embed_dim=192,
    text_embed_dim=192,
    query_head_dim=32,
    value_head_dim=12,
    pos_head_dim=4,
    pos_dim=48,
    feat_dim=100,
)


def build_model(args, tokenizer, dtype):
    from zipvoice_tpu.models.dialog import ZipVoiceDialog, ZipVoiceDialogStereo
    from zipvoice_tpu.models.zipvoice import ZipVoice, ZipVoiceDistill

    if args.model_config:
        with open(args.model_config) as f:
            cfg = json.load(f)
            cfg = cfg.get("model", cfg)
    else:
        cfg = dict(BASE_CONFIG)
    cls = {
        "zipvoice": ZipVoice,
        "zipvoice_distill": ZipVoiceDistill,
        "zipvoice_dialog": ZipVoiceDialog,
        "zipvoice_dialog_stereo": ZipVoiceDialogStereo,
    }[args.model_name]
    extra = {}
    if args.model_name.startswith("zipvoice_dialog"):
        extra = dict(spk_a_id=tokenizer.spk_a_id, spk_b_id=tokenizer.spk_b_id)
    model = cls(
        **cfg, vocab_size=tokenizer.vocab_size, pad_id=tokenizer.pad_id,
        dtype=dtype,
        use_pallas_attention=getattr(args, "use_pallas_attention", False),
        **extra,
    )
    return model, cfg


def main():
    args = get_parser().parse_args()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
    )

    import jax

    from zipvoice_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.coordinator_address:
        jax.distributed.initialize(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        logging.info(
            f"distributed: process {jax.process_index()}/{jax.process_count()}"
        )
    import jax.numpy as jnp
    import optax

    from zipvoice_tpu.data.dataset import (
        SpeechSynthesisDataset,
        prefetch_batches,
    )
    from zipvoice_tpu.data.manifest import mux, read_manifest
    from zipvoice_tpu.data.sampler import DynamicBucketingSampler
    from zipvoice_tpu.frontend.tokenizer import get_tokenizer
    from zipvoice_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from zipvoice_tpu.train.averaging import (
        init_model_avg,
        update_averaged_model,
    )
    from zipvoice_tpu.train.optim import eden_schedule, scaled_adam
    from zipvoice_tpu.train.train_step import (
        TrainState,
        init_train_state,
        make_eval_step,
        make_train_step,
    )
    from zipvoice_tpu.utils import checkpoint_io

    exp_dir = Path(args.exp_dir)
    is_primary = jax.process_index() == 0
    exp_dir.mkdir(parents=True, exist_ok=True)
    from zipvoice_tpu.utils.metrics_tracker import MetricsTracker, setup_logger

    # console + per-process log file (reference common.py:448-498)
    setup_logger(str(exp_dir), jax.process_index())
    # self-describing exp dir (reference train_zipvoice.py:887-889); all
    # writes below are gated on process 0 (the reference gates on rank 0,
    # train_zipvoice.py:931-934,645-665)
    if is_primary:
        shutil.copyfile(args.token_file, exp_dir / "tokens.txt")
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    tokenizer = get_tokenizer(args.tokenizer, args.token_file, args.lang)
    model, cfg = build_model(args, tokenizer, dtype)
    if is_primary:
        (exp_dir / "model.json").write_text(
            json.dumps({"model": cfg}, indent=2)
        )
        # env/git provenance (reference common.py:569-582 stamps it into
        # the saved params; here it is a self-describing exp-dir file)
        from zipvoice_tpu.utils.provenance import write_provenance

        write_provenance(exp_dir, {"model_name": args.model_name})

    # ---- data -------------------------------------------------------------
    # Multi-host note: every process builds the IDENTICAL global batch (same
    # manifest, same seed) and device_put materializes only its addressable
    # shards of the mesh-sharded array.  Host-side batch assembly is thus
    # duplicated per host (cheap: npy reads + padding), but the compiled
    # program and its input shapes are guaranteed identical across
    # processes — which multi-controller jit requires.  The reference
    # instead gives each DDP rank a distinct sampler shard
    # (datamodule.py:177-195); per-process DISTINCT batches would need a
    # shape-synchronized sampler, which StreamingBucketingSampler's
    # rank/world args support for offline/feature jobs.
    rank, world = 0, 1
    if args.streaming:
        from zipvoice_tpu.data.manifest import iter_manifest, mux_iter
        from zipvoice_tpu.data.sampler import StreamingBucketingSampler

        paths = list(args.train_manifest)
        weights = args.train_weight or [1.0] * len(paths)

        def cuts_fn(epoch, _paths=paths, _w=weights):
            if len(_paths) > 1:
                base = mux_iter(
                    [lambda p=p: iter_manifest(p) for p in _paths],
                    _w, seed=args.seed + epoch,
                )
            else:
                base = iter_manifest(_paths[0])
            return (c for c in base
                    if args.min_len <= c.duration <= args.max_len)

        sampler = StreamingBucketingSampler(
            cuts_fn, max_duration=args.max_duration,
            num_buckets=args.num_buckets, shuffle=True, seed=args.seed,
            drop_last=True, shuffle_buffer=args.shuffle_buffer,
            rank=rank, world_size=world,
        )
    else:
        manifests = [read_manifest(m) for m in args.train_manifest]
        weights = args.train_weight or [len(m) for m in manifests]
        cuts = (
            mux(manifests, weights, seed=args.seed)
            if len(manifests) > 1
            else manifests[0]
        )
        cuts = [
            c for c in cuts if args.min_len <= c.duration <= args.max_len
        ]
        logging.info(f"training cuts: {len(cuts)}")
        sampler = DynamicBucketingSampler(
            cuts, max_duration=args.max_duration,
            num_buckets=args.num_buckets,
            shuffle=True, seed=args.seed, drop_last=True,
        )
    num_channels = 2 if args.model_name == "zipvoice_dialog_stereo" else 1
    dataset = SpeechSynthesisDataset(
        tokenizer=tokenizer,
        on_the_fly_feats=args.on_the_fly_feats,
        feat_scale=args.feat_scale,
        num_channels=num_channels,
    )
    dev_sampler = None
    if args.dev_manifest:
        dev_cuts = read_manifest(args.dev_manifest)
        dev_sampler = DynamicBucketingSampler(
            dev_cuts, max_duration=args.max_duration, shuffle=False,
            seed=args.seed,
        )

    # ---- model / optimizer ------------------------------------------------
    rng = jax.random.PRNGKey(args.seed)
    sample_batch = None
    for cuts_batch in sampler:
        sample_batch = dataset(cuts_batch[: 2])
        break
    assert sample_batch is not None, "empty dataset"
    B, T, F = sample_batch["features"].shape

    if args.init_from_base or args.init_from_dialog:
        from zipvoice_tpu.utils.convert import convert_zipvoice
        from zipvoice_tpu.utils.structural_loaders import (
            copy_proj_three_channel,
            extend_vocab,
        )

        src = args.init_from_base or args.init_from_dialog
        params = convert_zipvoice(checkpoint_io.load_torch_state_dict(src))
        if args.init_from_base:
            params = extend_vocab(
                params, tokenizer.vocab_size,
                rng=np.random.RandomState(args.seed),
                feat_dim=cfg.get("feat_dim", 100),
            )
            logging.info(f"dialog init from base ckpt {src} (vocab extended)")
        if args.init_from_dialog:
            params = copy_proj_three_channel(
                params, feat_dim=cfg.get("feat_dim", 100)
            )
            logging.info(f"stereo init from dialog ckpt {src} "
                         f"(two-stream projections duplicated)")
    elif args.checkpoint and args.checkpoint.endswith(".pt"):
        sd = checkpoint_io.load_torch_state_dict(args.checkpoint)
        from zipvoice_tpu.utils.convert import convert_zipvoice

        params = convert_zipvoice(sd)
        logging.info(f"initialized from torch checkpoint {args.checkpoint}")
    else:
        # initialize on the host CPU backend (exact initializers, no
        # accelerator compile), then transfer
        def _init(features, noise, **kw):
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                return model.init(
                    {"params": rng},
                    tokens=jnp.asarray(sample_batch["tokens"]),
                    tokens_lens=jnp.asarray(sample_batch["tokens_lens"]),
                    features=features,
                    features_lens=jnp.asarray(sample_batch["features_lens"]),
                    noise=noise,
                    t=jnp.full((B, 1, 1), 0.5),
                    rng=jax.random.PRNGKey(0),
                    train=False,
                    **kw,
                )["params"]

        params = _init(
            jnp.asarray(sample_batch["features"]), jnp.zeros((B, T, F))
        )
        if args.model_name == "zipvoice_dialog_stereo":
            # two-stream from-scratch init: @nn.compact only creates the
            # projection pair the init input exercises, so init again at the
            # mixed single-channel width and graft in the second pair (the
            # trunk params are identical — same rng, same module paths; the
            # reference creates both pairs structurally,
            # zipvoice_dialog.py:241-256 / zipformer_two_stream.py:161-167)
            Fm = F // 2
            params_mixed = _init(
                jnp.asarray(sample_batch["features"][:, :, :Fm]),
                jnp.zeros((B, T, Fm)),
                se_weight=0.0,
            )

            from zipvoice_tpu.utils.structural_loaders import graft_missing

            params = jax.tree.map(lambda x: x, params)  # mutable copy
            graft_missing(params, params_mixed)
            logging.info("stereo from-scratch init: grafted the mixed "
                         "single-channel projection pair")
        params = jax.device_get(params)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    logging.info(f"model parameters: {n_params / 1e6:.1f}M")

    if args.print_diagnostics:
        # one-batch diagnostics dump and exit (reference --print-diagnostics,
        # diagnostics.py:29-570): dim-wise percentile stats for every module
        # activation, every parameter, and every parameter GRADIENT
        from zipvoice_tpu.utils.diagnostics import (
            collect_module_stats,
            collect_tree_stats,
            format_stats,
        )

        B_, T_, F_ = sample_batch["features"].shape
        diag_kwargs = dict(
            tokens=jnp.asarray(sample_batch["tokens"]),
            tokens_lens=jnp.asarray(sample_batch["tokens_lens"]),
            features=jnp.asarray(sample_batch["features"]),
            features_lens=jnp.asarray(sample_batch["features_lens"]),
            noise=jnp.zeros((B_, T_, F_)),
            t=jnp.full((B_, 1, 1), 0.5),
            rng=jax.random.PRNGKey(0),
        )
        stats = collect_module_stats(
            model, {"params": params}, train=False, **diag_kwargs
        )
        print("==== module outputs ====")
        print(format_stats(stats))
        print("==== parameters ====")
        print(format_stats(collect_tree_stats(params)))
        grads = jax.grad(
            lambda p: model.apply(
                {"params": p}, train=False, **diag_kwargs
            )
        )(params)
        print("==== parameter grads ====")
        print(format_stats(collect_tree_stats(grads)))
        return

    if args.streaming:
        # metadata-only pass: exact batch count + audio hours for epoch 0
        # (replaces the old total/max_duration estimate, which skewed the
        # Eden epoch axis)
        hours_per_epoch = sum(
            c.duration for c in sampler.cuts_fn(0)
        ) / 3600
        batches_per_epoch = max(1, sampler.count_batches())
    else:
        hours_per_epoch = sum(c.duration for c in cuts) / 3600
        # exact count of epoch-0 batches (not the old duration estimate)
        batches_per_epoch = max(1, sum(1 for _ in sampler))
    if args.lr_hours > 0:
        # epoch axis re-based to hours of audio (reference :615-622)
        batches_per_epoch = args.lr_hours / (
            hours_per_epoch / batches_per_epoch
        )
    if args.scheduler == "fixed":
        # reference FixedLRScheduler (lr_scheduler.py:187-204), for finetune
        schedule = lambda step: args.base_lr  # noqa: E731
    else:
        schedule = eden_schedule(
            base_lr=args.base_lr, lr_batches=args.lr_batches,
            lr_epochs=args.lr_epochs, warmup_batches=args.warmup_batches,
            batches_per_epoch=batches_per_epoch,
        )
    tx = scaled_adam(lr=schedule, clipping_scale=args.clipping_scale)

    mesh = make_mesh(n_data=args.num_data_parallel)
    logging.info(f"mesh: {mesh}")
    stereo = args.model_name == "zipvoice_dialog_stereo"
    # schedule clock settings (reference common.py:310-317): the adjusted
    # batch count is derived in-graph from the optimizer step, so schedules
    # run inside one compiled program.  Any checkpoint/dialog/stereo init is
    # a finetune in the reference's sense.
    finetune = args.finetune or bool(
        args.checkpoint or args.init_from_base or args.init_from_dialog
    )
    # one GLOBAL batch of max_duration seconds per step regardless of the
    # process count (see the multi-host note in the data section), so the
    # schedule clock's world_size is 1 (the reference's is
    # max_duration * world because each DDP rank adds its own batch)
    sched_kw = dict(
        schedules=args.schedules,
        max_duration=args.max_duration,
        world_size=1,
        ref_duration=args.ref_duration,
        finetune=finetune,
    )
    train_step = make_train_step(
        model, tx, condition_drop_ratio=args.condition_drop_ratio,
        dropout_rate=args.dropout_rate, mesh=mesh,
        model_kwargs={"se_weight": 1.0} if stereo else None,
        **sched_kw,
    )
    if stereo:
        # alternate with the mixed single-channel objective
        # (reference train_zipvoice_dialog_stereo.py:349-378)
        train_step_mixed = make_train_step(
            model, tx, condition_drop_ratio=args.condition_drop_ratio,
            dropout_rate=args.dropout_rate, mesh=mesh,
            model_kwargs={"se_weight": 0.0},
            **sched_kw,
        )
        dataset_mixed = SpeechSynthesisDataset(
            tokenizer=tokenizer, on_the_fly_feats=args.on_the_fly_feats,
            feat_scale=args.feat_scale, num_channels=1,
        )
    eval_step = make_eval_step(model)

    per_host = args.per_host_data == "on" or (
        args.per_host_data == "auto" and jax.process_count() > 1
    )
    if per_host:
        from zipvoice_tpu.parallel.mesh import local_batch_rows

        _rows_cache = {}

        def _rows_fn(B_pad):
            if B_pad not in _rows_cache:
                _rows_cache[B_pad] = local_batch_rows(mesh, B_pad)
            return _rows_cache[B_pad]

        dataset.local_rows_fn = _rows_fn
        if stereo:
            dataset_mixed.local_rows_fn = _rows_fn
        logging.info("per-host data loading: each process materializes "
                     "only its own batch rows")

    state = init_train_state(params, tx)
    model_avg = init_model_avg(params)
    start_epoch = args.start_epoch

    resume_path = exp_dir / f"epoch-{args.start_epoch - 1}"
    if args.start_epoch > 1 and resume_path.exists():
        state, extra = checkpoint_io.load_checkpoint(str(resume_path), state)
        if extra and "sampler" in extra:
            sampler.load_state_dict(extra["sampler"])
        avg_path = str(resume_path) + "-avg"
        if os.path.exists(avg_path):
            model_avg, _ = checkpoint_io.load_checkpoint(avg_path, model_avg)
        logging.info(f"resumed from {resume_path}")

    state = TrainState(
        params=replicate_tree(state.params, mesh),
        opt_state=replicate_tree(state.opt_state, mesh),
        step=replicate_tree(state.step, mesh),
    )

    if args.scan_oom:
        # pessimistic-shape probe: biggest frame bucket at the batch size
        # the duration budget implies
        from zipvoice_tpu.data.dataset import FRAME_BUCKETS

        T_max = max(
            t for t in FRAME_BUCKETS if t <= args.max_len * 93.75 + 128
        )
        B_max = max(1, int(args.max_duration // args.min_len))
        logging.info(f"--scan-oom probe: B={B_max}, T={T_max}")
        probe = {
            "tokens": np.zeros((B_max, 64), np.int32),
            "tokens_lens": np.full((B_max,), 8, np.int32),
            "features": np.zeros((B_max, T_max, sample_batch["features"].shape[2]),
                                 np.float32),
            "features_lens": np.full((B_max,), T_max, np.int32),
        }
        state, m = train_step(
            state, shard_batch(probe, mesh), jax.random.PRNGKey(0)
        )
        logging.info(f"--scan-oom ok (loss {float(m['loss']):.3f})")

    tb = None
    if args.tensorboard and is_primary:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb = SummaryWriter(str(exp_dir / "tensorboard"))
        except ImportError:
            logging.warning("tensorboard unavailable")

    # ---- loop -------------------------------------------------------------
    profiling = False
    batches_this_run = 0
    step_rng = jax.random.PRNGKey(args.seed + 1)
    tracker = MetricsTracker()
    t_start = time.time()
    saved_iters = []

    # under --num-iters the iteration budget, not the epoch count, ends
    # training (reference num-iters mode)
    last_epoch = args.num_epochs if not args.num_iters else 10**9
    for epoch in range(start_epoch, last_epoch + 1):
        sampler.set_epoch(epoch)
        if stereo:
            # alternate stereo (se_weight=1) and mixed (se_weight=0) batches
            batch_iter = (
                ((dataset_mixed if i % 2 else dataset)(cuts), bool(i % 2))
                for i, cuts in enumerate(sampler)
            )
        else:
            batch_iter = (
                (b, False) for b in prefetch_batches(
                    sampler, dataset, num_workers=args.num_workers
                )
            )
        for batch, use_mixed in batch_iter:
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
            step_fn = train_step_mixed if use_mixed else train_step
            try:
                state, metrics = step_fn(state, sharded, step_rng)
                step = int(state.step)
                loss = float(metrics["loss"])
                if args.inf_check and not np.isfinite(loss):
                    # name the module that produced the first non-finite
                    # output (the reference's forward hooks, hooks.py:26-97)
                    from zipvoice_tpu.utils.diagnostics import find_nonfinite

                    try:
                        B_, T_, F_ = batch["features"].shape
                        stats_vars = model.apply(
                            {"params": jax.device_get(state.params)},
                            tokens=jnp.asarray(batch["tokens"]),
                            tokens_lens=jnp.asarray(batch["tokens_lens"]),
                            features=jnp.asarray(batch["features"]),
                            features_lens=jnp.asarray(
                                batch["features_lens"]),
                            noise=jnp.zeros((B_, T_, F_)),
                            t=jnp.full((B_, 1, 1), 0.5),
                            rng=jax.random.PRNGKey(0),
                            train=False,
                            capture_intermediates=True,
                        )[1]
                        bad = find_nonfinite(
                            stats_vars.get("intermediates", {})
                        )
                        logging.error(
                            f"--inf-check: non-finite module outputs: "
                            f"{list(bad)[:8] or '(forward clean; grads?)'}"
                        )
                    except Exception as diag_ex:  # noqa: BLE001
                        logging.error(f"--inf-check probe failed: {diag_ex}")
                    raise RuntimeError(
                        f"non-finite loss at step {step}: {loss}"
                    )
            except Exception:
                # save the offending batch + model for post-mortem
                # (reference train_zipvoice.py:536-549,769-795)
                # per-process batch dump (the reference writes
                # bad-model-{rank}.pt, train_zipvoice.py:536-549,769-795)
                bad = exp_dir / f"bad-batch-{jax.process_index()}.npz"
                np.savez(
                    bad,
                    **{k: v for k, v in batch.items()
                       if isinstance(v, np.ndarray)},
                )
                if is_primary:
                    checkpoint_io.save_checkpoint(
                        str(exp_dir / "bad-model"), jax.device_get(state)
                    )
                logging.error(f"step failed; batch saved to {bad}")
                raise
            frames = int(batch["features_lens"].sum())
            # frame-normalized multi-metric tracking (reference
            # MetricsTracker, common.py:57-146)
            tracker["loss"] += loss * frames
            tracker["grad_norm"] += float(metrics["grad_norm"]) * frames
            tracker["frames"] += frames
            tracker["utterances"] += int(batch["features"].shape[0])

            # trace batches 10-14 of THIS invocation (a resumed run's global
            # step never equals 10, so the trigger is run-local)
            batches_this_run += 1
            if args.profile_dir and batches_this_run == 10 and not profiling:
                try:
                    jax.profiler.start_trace(args.profile_dir)
                    profiling = True
                    logging.info(f"profiler: tracing to {args.profile_dir}")
                except Exception as e:  # noqa: BLE001
                    logging.warning(f"profiler unavailable: {e}")
            elif profiling and batches_this_run >= 15:
                jax.profiler.stop_trace()
                profiling = False
                logging.info("profiler: trace saved")

            if step % args.log_interval == 0:
                lr = float(schedule(step))
                speed = tracker.get("frames", 0) / max(
                    time.time() - t_start, 1e-9
                )
                # device-memory high-water (reference train_zipvoice.py:
                # 578-581 logs the CUDA max-allocated counter)
                from zipvoice_tpu.utils.provenance import (
                    device_memory_stats,
                )

                mem = device_memory_stats()
                mem_s = (
                    f" mem {mem['peak_bytes_in_use'] / 2**30:.2f}GiB peak"
                    if mem and "peak_bytes_in_use" in mem else ""
                )
                logging.info(
                    f"epoch {epoch} step {step}: loss {loss:.4f} "
                    f"[{tracker}] lr {lr:.2e} frames/s {speed:.0f}{mem_s}"
                )
                if tb:
                    tb.add_scalar("train/loss", loss, step)
                    tb.add_scalar("train/lr", lr, step)
                    tracker.write_summary(tb, "train", step)
                tracker, t_start = MetricsTracker(), time.time()

            if step % args.average_period == 0 and is_primary:
                model_avg = update_averaged_model(
                    model_avg, jax.device_get(state.params), step,
                    args.average_period,
                )

            if (args.save_every_n > 0 and step % args.save_every_n == 0
                    and is_primary):
                path = exp_dir / f"checkpoint-{step}"
                checkpoint_io.save_checkpoint(
                    str(path), jax.device_get(state),
                    extra={"sampler": sampler.state_dict(),
                           "batch_idx_train": step,
                           "average_period": args.average_period},
                )
                # every checkpoint carries its running average so
                # generate_averaged_model --iter works on iteration saves
                # (reference embeds model_avg in every checkpoint,
                # checkpoint.py:38-104)
                checkpoint_io.save_checkpoint(str(path) + "-avg", model_avg)
                saved_iters.append(path)
                while len(saved_iters) > args.keep_last_k:
                    old = saved_iters.pop(0)
                    shutil.rmtree(old, ignore_errors=True)
                    shutil.rmtree(str(old) + "-avg", ignore_errors=True)

            if args.num_iters and step >= args.num_iters:
                break

            if (dev_sampler and is_primary
                    and step % args.valid_interval == 0):
                v_loss, v_frames = 0.0, 0
                for i, vb in enumerate(
                    # dev eval runs whole batches on the primary only —
                    # force-full materialization even in per-host mode
                    prefetch_batches(
                        dev_sampler,
                        lambda cuts: dataset(cuts, local_rows=False),
                    )
                ):
                    vl = float(
                        eval_step(
                            state.params,
                            {k: jnp.asarray(v) for k, v in vb.items()
                             if k in ("tokens", "tokens_lens", "features",
                                      "features_lens")},
                            jax.random.PRNGKey(0),
                        )
                    )
                    f = int(vb["features_lens"].sum())
                    v_loss += vl * f
                    v_frames += f
                    if i >= 20:
                        break
                logging.info(
                    f"validation: loss {v_loss / max(v_frames, 1):.4f}"
                )
                if tb:
                    tb.add_scalar(
                        "valid/loss", v_loss / max(v_frames, 1), step
                    )

        if args.num_iters and int(state.step) >= args.num_iters:
            if not is_primary:
                logging.info(f"reached --num-iters {args.num_iters}")
                break
            final = exp_dir / f"checkpoint-{int(state.step)}"
            checkpoint_io.save_checkpoint(
                str(final), jax.device_get(state),
                extra={"sampler": sampler.state_dict(),
                       "batch_idx_train": int(state.step),
                       "average_period": args.average_period},
            )
            checkpoint_io.save_checkpoint(str(final) + "-avg", model_avg)
            logging.info(f"reached --num-iters {args.num_iters}; stopping")
            break

        # end of epoch checkpoint
        if not is_primary:
            continue
        path = exp_dir / f"epoch-{epoch}"
        checkpoint_io.save_checkpoint(
            str(path), jax.device_get(state),
            extra={"sampler": sampler.state_dict(),
                   "batch_idx_train": int(state.step),
                   "average_period": args.average_period},
        )
        checkpoint_io.save_checkpoint(str(path) + "-avg", model_avg)
        logging.info(f"saved {path}")

    if profiling:
        jax.profiler.stop_trace()
    logging.info("training done")


if __name__ == "__main__":
    main()
