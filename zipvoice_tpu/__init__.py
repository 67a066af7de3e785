"""zipvoice_tpu: a TPU-native (JAX/XLA/Pallas) zero-shot TTS framework.

A from-scratch rebuild of the capabilities of ZipVoice (k2-fsa/ZipVoice,
flow-matching zero-shot TTS) designed TPU-first:

- the flow-matching Zipformer denoiser and text encoder are implemented as
  functional flax modules with static shapes, compiled once per length bucket;
- the Euler ODE solver with classifier-free guidance is a single
  ``jax.lax.scan``-based jitted program;
- feature extraction (STFT+mel) and the Vocos-style vocoder (iSTFT head) are
  XLA programs with Pallas kernels on the hot paths;
- scaling is expressed via ``jax.sharding.Mesh`` + NamedSharding (data
  parallel by default; optional model axis), not per-process collectives.

Layout:
  ops/       numeric primitives & Pallas kernels (swoosh, bias-norm, stft, ...)
  models/    Zipformer backbone + ZipVoice model family + ODE solver
  frontend/  feature extraction, tokenizers, text normalization, audio utils
  vocoder/   Vocos-style mel->waveform vocoder
  data/      dataset/batching (duration-bucketed)
  train/     optimizer (ScaledAdam), LR schedule (Eden), train loops, ckpt
  parallel/  mesh / sharding helpers
  utils/     checkpoint conversion from the reference PyTorch weights, misc
"""

__version__ = "0.1.0"
