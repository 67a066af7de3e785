"""Build a reference-layout model dir with RANDOM 123M weights for serving
latency benchmarks (latency is weight-independent; real checkpoints are not
fetchable in this environment).

Produces <out>/{model.pt, model.json, tokens.txt} loadable by
serving/server.py and bin/infer_zipvoice.py.

  python tools/make_bench_model_dir.py --out /tmp/bench_model \
      [--model-name zipvoice_distill]
"""

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model-name", default="zipvoice_distill",
                    choices=["zipvoice", "zipvoice_distill"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from zipvoice_tpu.models.zipvoice import ZipVoice, ZipVoiceDistill
    from zipvoice_tpu.utils.convert import invert_zipvoice

    os.makedirs(args.out, exist_ok=True)

    # real emilia vocabulary (punct + espeak IPA inventory + pinyin), so
    # the first-party G2P's phoneme tokens all have ids
    local = os.path.join(HERE, "egs", "zipvoice", "local")
    sys.path.insert(0, local)
    from build_emilia_tokens import (  # noqa: E402
        FINALS,
        INITIALS,
        PUNCT,
        espeak_ipa_inventory,
    )

    chars = ["_"] + PUNCT + espeak_ipa_inventory()
    chars += [i + "0" for i in INITIALS]
    chars += [f + str(t) for f in FINALS for t in range(1, 6)]
    with open(os.path.join(args.out, "tokens.txt"), "w") as f:
        for i, c in enumerate(chars):
            f.write(f"{c}\t{i}\n")

    cls = ZipVoiceDistill if args.model_name == "zipvoice_distill" else ZipVoice
    model = cls(**BASE_CONFIG, vocab_size=len(chars), pad_id=0)
    B, T, F = 1, 64, BASE_CONFIG["feat_dim"]
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        tokens=jnp.ones((B, 8), jnp.int32),
        tokens_lens=jnp.full((B,), 7, jnp.int32),
        features=jnp.zeros((B, T, F)),
        features_lens=jnp.full((B,), T, jnp.int32),
        noise=jnp.zeros((B, T, F)),
        t=jnp.full((B, 1, 1), 0.5),
        rng=jax.random.PRNGKey(1),
        train=False,
    )["params"]
    if args.model_name == "zipvoice_distill":
        # @nn.compact lazy init: the training call never creates the
        # sampling-only guidance_scale_embed, so init the sample path too
        # and graft it in (same pitfall as the stereo projection pair)
        from zipvoice_tpu.utils.structural_loaders import graft_missing

        params_sample = model.init(
            {"params": jax.random.PRNGKey(0)},
            tokens=jnp.ones((B, 8), jnp.int32),
            tokens_lens=jnp.full((B,), 7, jnp.int32),
            prompt_tokens_lens=jnp.full((B,), 3, jnp.int32),
            prompt_features=jnp.zeros((B, T, F)),
            prompt_features_lens=jnp.full((B,), 16, jnp.int32),
            features_lens=jnp.full((B,), T, jnp.int32),
            noise=jnp.zeros((B, T, F)),
            num_step=1,
            guidance_scale=2.0,
            t_shift=0.5,
            method="sample",
        )["params"]
        params = jax.tree.map(lambda x: x, params)
        graft_missing(params, params_sample)
    n = sum(p.size for p in jax.tree.leaves(params))
    print(f"params: {n / 1e6:.1f}M")

    sd = invert_zipvoice(
        jax.device_get(params),
        downsampling_factors={
            "fm_decoder": tuple(
                BASE_CONFIG["fm_decoder_downsampling_factor"]
            ),
            "text_encoder": (1,),
        },
    )
    torch.save(
        {"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
        os.path.join(args.out, "model.pt"),
    )
    json.dump(
        {"model": BASE_CONFIG}, open(os.path.join(args.out, "model.json"), "w"),
        indent=2,
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
