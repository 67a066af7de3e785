"""Benchmark: ZipVoice base 16-step sampling + Vocos vocoding on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: RTF (wall seconds per generated audio second) of the full mel
pipeline — text conditioning + 16-step Euler/CFG sampling + Vocos vocoding —
for a ~10 s utterance, bf16 compute.  BASELINE.json's north-star target is
RTF < 0.05/chip; vs_baseline reports target/actual (>1 = beating target).
"""

import json
import os
import time

import jax

# persistent compile cache: first run pays the (slow, remote) compile; the
# driver's subsequent bench runs start hot
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    from zipvoice_tpu.frontend.batch import pad_tokens
    from zipvoice_tpu.models.zipvoice import ZipVoice, strip_prompt
    from zipvoice_tpu.vocoder.vocos import Vocos

    dtype = jnp.bfloat16
    model = ZipVoice(vocab_size=360, pad_id=0, dtype=dtype)
    F = model.feat_dim

    # ~10 s of generated audio at 93.75 fps, plus a 3 s prompt
    frames_per_sec = 24000 / 256
    prompt_s, gen_s = 3.0, 10.0
    Tp = int(prompt_s * frames_per_sec)
    T = 1280  # bucket covering prompt+gen frames
    num_step, gs = 16, 1.0

    rng = np.random.RandomState(0)
    prompt_tokens = list(rng.randint(3, 300, size=30))
    text_tokens = list(rng.randint(3, 300, size=100))
    tok, tok_lens = pad_tokens([prompt_tokens + text_tokens], pad_id=0)
    ptl = np.array([len(prompt_tokens)], np.int32)
    pf = np.zeros((1, T, F), np.float32)
    pf[:, :Tp] = rng.randn(1, Tp, F) * 0.5
    pfl = np.array([Tp], np.int32)
    total_frames = Tp + int(gen_s * frames_per_sec)
    fl = np.array([total_frames], np.int32)
    noise = rng.randn(1, T, F).astype(np.float32)

    key = jax.random.PRNGKey(0)
    params = model.init(
        key,
        tokens=jnp.asarray(tok),
        tokens_lens=jnp.asarray(tok_lens),
        prompt_tokens_lens=jnp.asarray(ptl),
        prompt_features=jnp.asarray(pf),
        prompt_features_lens=jnp.asarray(pfl),
        features_lens=jnp.asarray(fl),
        noise=jnp.asarray(noise),
        num_step=1,
        guidance_scale=gs,
        t_shift=0.5,
        method="sample",
    )

    vocos = Vocos(dtype=dtype)
    vp = vocos.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, F)))

    @jax.jit
    def pipeline(params, vp, tok, tok_lens, ptl, pf, pfl, fl, noise):
        x1, padding_mask = model.apply(
            params, tokens=tok, tokens_lens=tok_lens, prompt_tokens_lens=ptl,
            prompt_features=pf, prompt_features_lens=pfl, features_lens=fl,
            noise=noise, num_step=num_step, guidance_scale=gs, t_shift=0.5,
            method="sample",
        )
        x1_wo, wo_lens = strip_prompt(x1, padding_mask, pfl)
        wav = vocos.apply(vp, x1_wo / 0.1)  # undo feat_scale
        return wav, wo_lens

    args = (
        params, vp, jnp.asarray(tok), jnp.asarray(tok_lens), jnp.asarray(ptl),
        jnp.asarray(pf), jnp.asarray(pfl), jnp.asarray(fl), jnp.asarray(noise),
    )

    # warmup/compile
    t0 = time.perf_counter()
    wav, wo_lens = pipeline(*args)
    _ = np.asarray(wav)
    print(f"# warmup (incl. compile): {time.perf_counter() - t0:.2f}s")

    # NOTE: block_until_ready does not reliably synchronize through the
    # remote-TPU relay in this environment, so each iteration materializes
    # the output on host (device->host of ~1 MB, negligible vs compute).
    # Distinct noise per iteration also defeats any remote result caching.
    noises = [
        jnp.asarray(rng.randn(1, T, F).astype(np.float32)) for _ in range(5)
    ]
    n_iters = len(noises)
    iter_times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        wav, wo_lens = pipeline(*args[:-1], noises[i])
        _ = np.asarray(wav)
        iter_times.append(time.perf_counter() - t0)
    print(f"# iter times: {[round(t, 4) for t in iter_times]}")
    wall = sorted(iter_times)[len(iter_times) // 2]  # median

    audio_seconds = float(np.asarray(wo_lens)[0]) / frames_per_sec
    rtf = wall / audio_seconds
    print(
        json.dumps(
            {
                "metric": "rtf_zipvoice_base_16step_bf16_1chip",
                "value": round(rtf, 5),
                "unit": "rtf (wall_s per audio_s, incl. vocoder)",
                "vs_baseline": round(0.05 / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
