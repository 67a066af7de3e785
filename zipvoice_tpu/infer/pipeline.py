"""End-to-end zero-shot TTS inference pipeline.

Mirrors the reference's generate_sentence flow
(reference zipvoice/bin/infer_zipvoice.py:437-641):
prompt silence-strip -> rms norm -> fbank x0.1 -> punctuation chunking
(~25 s windows) -> duration-bounded batch packing -> flow-matching sampling
-> vocoder -> cross-fade merge -> edge silence trim.

TPU-first differences:
- every device computation is a cached jitted program with static shapes;
  token/frame lengths are bucketed so a handful of compilations serve any
  input length;
- the CFG Euler loop is a lax.scan inside one program (models/solver.py);
- vocoding runs batched on padded features and is trimmed on host (the
  reference loops per utterance, infer_zipvoice.py:589-602).
"""

import datetime as dt
import logging
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from zipvoice_tpu.frontend.audio import (
    cross_fade_concat,
    load_wav,
    remove_silence,
    rms_norm,
)
from zipvoice_tpu.frontend.batch import bucket_length, pad_tokens
from zipvoice_tpu.frontend.feature import VocosFbank
from zipvoice_tpu.frontend.text_chunking import (
    add_punctuation,
    batchify_tokens,
    chunk_tokens_punctuation,
)
from zipvoice_tpu.models.zipvoice import strip_prompt

TOKEN_BUCKETS = (32, 64, 96, 128, 192, 256, 384, 512, 768)
FRAME_BUCKETS = (128, 256, 384, 512, 768, 1024, 1280, 1536, 2048, 2560, 3072)
BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


class InferencePipeline:
    def __init__(
        self,
        model,
        params,
        vocoder,
        vocoder_params,
        tokenizer,
        sampling_rate: int = 24000,
        feat_scale: float = 0.1,
        seed: int = 0,
        quantize: Optional[str] = None,
    ):
        self.model = model
        self.quantize = quantize
        if quantize is not None:
            # weight-only int8 serving (reference's dynamic-int8 ONNX
            # analog, onnx_export.py:403-417): int8 params in HBM,
            # dequantized inside the jitted programs
            assert quantize == "int8", quantize
            from zipvoice_tpu.serving.quantize import quantize_params

            params = quantize_params(jax.device_get(params))
            if vocoder_params is not None:
                vocoder_params = quantize_params(
                    jax.device_get(vocoder_params)
                )
        # Pin weights on device ONCE.  Converted checkpoints arrive as host
        # numpy trees; passing those to a jitted program re-uploads every
        # parameter per call (~0.5 GB for the 123M model — seconds per
        # request through a remote-TPU relay, and a silent PCIe tax
        # everywhere else).
        params = jax.device_put(params)
        if vocoder_params is not None:
            vocoder_params = jax.device_put(vocoder_params)
        self.params = params
        self.vocoder = vocoder
        self.vocoder_params = vocoder_params
        self.tokenizer = tokenizer
        self.sampling_rate = sampling_rate
        self.feat_scale = feat_scale
        self.feature_extractor = VocosFbank()
        self.rng = np.random.RandomState(seed)
        self._sample_cache = {}
        self._vocode_cache = {}
        self._engines = None
        self._engine_manifest = None

    def attach_engines(self, engine_dir: str):
        """Serve shape buckets from AOT-exported StableHLO programs
        (serving/aot.py) instead of tracing the model — the reference's
        prebuilt-TensorRT-engine serving mode (runtime/nvidia_triton).
        Buckets not covered by the engine dir fall back to jit."""
        from zipvoice_tpu.serving.aot import load_engine_dir

        self._engine_manifest, self._engines = load_engine_dir(engine_dir)
        logging.info(
            f"attached {len(self._engines)} exported engine(s) from "
            f"{engine_dir}: {sorted(self._engines)}"
        )

    # --- compiled-program factories ---------------------------------------

    def _sample_fn(self, num_step: int, guidance_scale: float, t_shift: float):
        key = (num_step, guidance_scale, t_shift)
        if key not in self._sample_cache:

            @jax.jit
            def fn(params, tok, tok_lens, ptl, pf, pfl, fl, noise):
                if self.quantize:
                    from zipvoice_tpu.serving.quantize import (
                        dequantize_params,
                    )

                    params = dequantize_params(params, self.model.dtype)
                x1, padding_mask = self.model.apply(
                    params, tokens=tok, tokens_lens=tok_lens,
                    prompt_tokens_lens=ptl, prompt_features=pf,
                    prompt_features_lens=pfl, features_lens=fl, noise=noise,
                    num_step=num_step, guidance_scale=guidance_scale,
                    t_shift=t_shift, method="sample",
                )
                return strip_prompt(x1, padding_mask, pfl)

            self._sample_cache[key] = fn
        return self._sample_cache[key]

    def _strip_fn(self):
        if "s" not in self._vocode_cache:
            self._vocode_cache["s"] = jax.jit(strip_prompt)
        return self._vocode_cache["s"]

    def _vocode_fn(self):
        if "v" not in self._vocode_cache:

            @jax.jit
            def fn(vp, mel):
                if self.quantize:
                    from zipvoice_tpu.serving.quantize import (
                        dequantize_params,
                    )

                    vp = dequantize_params(vp, self.vocoder.dtype)
                return jnp.clip(self.vocoder.apply(vp, mel), -1.0, 1.0)

            self._vocode_cache["v"] = fn
        return self._vocode_cache["v"]

    # --- main entry ---------------------------------------------------------

    def generate_sentence(
        self,
        prompt_text: str,
        prompt_wav_path: str,
        text: str,
        num_step: int = 16,
        guidance_scale: float = 1.0,
        speed: float = 1.0,
        t_shift: float = 0.5,
        target_rms: float = 0.1,
        max_duration: float = 100.0,
        remove_long_sil: bool = False,
    ):
        """Returns (wav (C, T) float32, metrics dict)."""
        sr = self.sampling_rate
        prompt_wav = load_wav(prompt_wav_path, sr)
        prompt_wav = remove_silence(prompt_wav, sr, only_edge=False, trail_sil=200)
        prompt_wav, prompt_rms = rms_norm(prompt_wav, target_rms)
        prompt_duration = prompt_wav.shape[-1] / sr
        if prompt_duration > 10:
            logging.warning(
                f"prompt is long ({prompt_duration:.1f}s); 1-3 s recommended"
            )

        prompt_features = (
            self.feature_extractor.extract(prompt_wav, sr) * self.feat_scale
        )

        text = add_punctuation(text)
        prompt_text = add_punctuation(prompt_text)
        tokens_str = self.tokenizer.texts_to_tokens([text])[0]
        prompt_tokens_str = self.tokenizer.texts_to_tokens([prompt_text])[0]

        token_duration = prompt_duration / (len(prompt_tokens_str) * speed)
        max_tokens = max(4, int((25 - prompt_duration) / token_duration))
        chunked_tokens_str = chunk_tokens_punctuation(
            tokens_str, max_tokens=max_tokens
        )
        chunked_tokens = self.tokenizer.tokens_to_token_ids(chunked_tokens_str)
        prompt_tokens = self.tokenizer.tokens_to_token_ids(
            [prompt_tokens_str]
        )[0]

        tokens_batches, chunked_index = batchify_tokens(
            chunked_tokens, max_duration, prompt_duration, token_duration
        )

        start_t = dt.datetime.now()
        chunked_feats: List[np.ndarray] = []
        for batch_tokens in tokens_batches:
            feats, feats_lens = self._sample_batch(
                batch_tokens, prompt_tokens, prompt_features,
                num_step=num_step, guidance_scale=guidance_scale,
                speed=speed, t_shift=t_shift,
            )
            for i in range(len(batch_tokens)):
                chunked_feats.append(feats[i, : feats_lens[i]])

        start_vocoder_t = dt.datetime.now()
        chunked_wavs = self._vocode_chunks(chunked_feats)
        t = (dt.datetime.now() - start_t).total_seconds()

        if prompt_rms < target_rms:
            chunked_wavs = [w * prompt_rms / target_rms for w in chunked_wavs]

        order = sorted(range(len(chunked_wavs)), key=lambda i: chunked_index[i])
        seq_wavs = [chunked_wavs[i][None] for i in order]
        final_wav = cross_fade_concat(seq_wavs, fade_duration=0.1, sample_rate=sr)
        final_wav = remove_silence(
            final_wav, sr, only_edge=(not remove_long_sil), trail_sil=0
        )

        t_no_vocoder = (start_vocoder_t - start_t).total_seconds()
        t_vocoder = t - t_no_vocoder
        wav_seconds = final_wav.shape[-1] / sr
        metrics = {
            "t": t,
            "t_no_vocoder": t_no_vocoder,
            "t_vocoder": t_vocoder,
            "wav_seconds": wav_seconds,
            "rtf": t / max(wav_seconds, 1e-9),
            "rtf_no_vocoder": t_no_vocoder / max(wav_seconds, 1e-9),
            "rtf_vocoder": t_vocoder / max(wav_seconds, 1e-9),
        }
        return final_wav, metrics

    def generate_stream(
        self,
        prompt_tokens: List[int],
        prompt_features: np.ndarray,
        text: str,
        num_step: int = 16,
        guidance_scale: float = 1.0,
        speed: float = 1.0,
        t_shift: float = 0.5,
        prompt_rms: float = 0.1,
        target_rms: float = 0.1,
        fade_duration: float = 0.1,
    ):
        """Stream wav segments as text chunks are synthesized.

        Latency-oriented counterpart of ``generate_sentence`` (the
        reference's Triton decoupled/streaming mode): chunks run one at a
        time (B=1) so the first audio arrives after a single sample+vocode
        round, and the same linear cross-fade as ``cross_fade_concat`` is
        applied incrementally — concatenating every yielded segment equals
        the offline result.

        ``prompt_tokens``/``prompt_features`` are a SpeakerCache-style
        prepared prompt (features already feat-scaled).
        """
        sr = self.sampling_rate
        prompt_duration = prompt_features.shape[0] * 256 / sr
        text = add_punctuation(text)
        tokens_str = self.tokenizer.texts_to_tokens([text])[0]
        token_duration = prompt_duration / (len(prompt_tokens) * speed)
        max_tokens = max(4, int((25 - prompt_duration) / token_duration))
        chunked_tokens_str = chunk_tokens_punctuation(
            tokens_str, max_tokens=max_tokens
        )
        chunked_tokens = self.tokenizer.tokens_to_token_ids(
            chunked_tokens_str
        )

        fade = int(fade_duration * sr)
        carry: Optional[np.ndarray] = None
        gain = prompt_rms / target_rms if prompt_rms < target_rms else 1.0
        for tok in chunked_tokens:
            feats, lens = self._sample_batch(
                [tok], prompt_tokens, prompt_features,
                num_step=num_step, guidance_scale=guidance_scale,
                speed=speed, t_shift=t_shift,
            )
            wav = self._vocode_chunks([feats[0, : lens[0]]])[0][None] * gain
            if carry is None:
                merged = wav
            else:
                k = min(fade, carry.shape[-1], wav.shape[-1])
                if k > 0:
                    ramp = np.linspace(1.0, 0.0, k, dtype=wav.dtype)[None]
                    merged = np.concatenate(
                        [carry[..., :-k],
                         carry[..., -k:] * ramp + wav[..., :k] * (1 - ramp),
                         wav[..., k:]], axis=-1,
                    )
                else:
                    merged = np.concatenate([carry, wav], axis=-1)
            if merged.shape[-1] > fade:
                yield merged[..., :-fade]
                carry = merged[..., -fade:]
            else:
                carry = merged
        if carry is not None and carry.shape[-1]:
            yield carry

    def generate_raw(
        self,
        prompt_text: str,
        prompt_wav_path: str,
        text: str,
        num_step: int = 16,
        guidance_scale: float = 1.0,
        speed: float = 1.0,
        t_shift: float = 0.5,
        target_rms: float = 0.1,
    ):
        """Raw-evaluation path (reference infer_zipvoice.py:315-434): no
        silence removal, no chunking, no crossfade — a single sample call,
        for objective benchmark comparability."""
        sr = self.sampling_rate
        prompt_wav = load_wav(prompt_wav_path, sr)
        prompt_wav, prompt_rms = rms_norm(prompt_wav, target_rms)
        prompt_features = (
            self.feature_extractor.extract(prompt_wav, sr) * self.feat_scale
        )
        tokens = self.tokenizer.texts_to_token_ids([text])[0]
        prompt_tokens = self.tokenizer.texts_to_token_ids([prompt_text])[0]

        start_t = dt.datetime.now()
        feats, lens = self._sample_batch(
            [tokens], prompt_tokens, prompt_features,
            num_step=num_step, guidance_scale=guidance_scale,
            speed=speed, t_shift=t_shift,
        )
        wavs = self._vocode_chunks([feats[0, : lens[0]]])
        wav = wavs[0][None]
        if prompt_rms < target_rms:
            wav = wav * prompt_rms / target_rms
        t = (dt.datetime.now() - start_t).total_seconds()
        wav_seconds = wav.shape[-1] / sr
        return wav, {
            "t": t,
            "wav_seconds": wav_seconds,
            "rtf": t / max(wav_seconds, 1e-9),
        }

    def warm_bucket(self, B: int, S: int, T: int, num_step: int,
                    guidance_scale: float, t_shift: float = 0.5) -> None:
        """Precompile the jitted sample program (plus the strip/vocoder
        glue) at one exact (batch, token, frame) bucket.  The serving
        analog of a TensorRT optimization profile
        (reference zipvoice/bin/tensorrt_export.py:112-133): traffic on a
        warmed bucket never pays a compile stall."""
        # snap to the bucket ladder: _sample_batch always rounds shapes up
        # via bucket_length, so an off-ladder spec (e.g. 3:100:600) would
        # compile a program real traffic never reuses
        B_b, S_b, T_b = (
            bucket_length(B, BATCH_BUCKETS),
            bucket_length(S, TOKEN_BUCKETS),
            bucket_length(T, FRAME_BUCKETS),
        )
        if (B_b, S_b, T_b) != (B, S, T):
            logging.warning(
                f"warm_bucket({B},{S},{T}) is off the bucket ladder; "
                f"snapping to B={B_b} S={S_b} T={T_b} (the shape "
                f"_sample_batch will actually dispatch)"
            )
            B, S, T = B_b, S_b, T_b
        F = self.model.feat_dim
        fn = self._sample_fn(num_step, guidance_scale, t_shift)
        pfl = np.full((B,), min(64, T), np.int32)
        x1_wo, wo_lens = fn(
            self.params, jnp.ones((B, S), jnp.int32),
            jnp.full((B,), S, jnp.int32),
            jnp.full((B,), max(S // 4, 1), jnp.int32),
            jnp.zeros((B, T, F)), jnp.asarray(pfl),
            jnp.full((B,), T, jnp.int32), jnp.zeros((B, T, F)),
        )
        n = max(int(np.asarray(wo_lens)[0]), 1)
        # B chunks: a full micro-batch vocodes as one (B, T) program, so
        # warming a single chunk would leave the batched vocoder shape cold
        self._vocode_chunks([np.asarray(x1_wo)[0, :n]] * B)
        if not hasattr(self, "_seen_buckets"):
            self._seen_buckets = set()
        self._seen_buckets.add((B, S, T))
        logging.info(f"warmed bucket B={B} S={S} T={T}")

    def warm_engines(self) -> int:
        """Drive every attached AOT engine once at its exact (B, S, T)
        bucket (plus the vocoder/strip glue at that shape), so a server
        accepts traffic with zero jit compiles on the declared buckets.
        Returns the number of engines warmed."""
        if not self._engines:
            return 0
        F = self.model.feat_dim
        for (B, S, T), eng in sorted(self._engines.items()):
            tok = jnp.ones((B, S), jnp.int32)
            tok_lens = jnp.full((B,), S, jnp.int32)
            ptl = jnp.full((B,), max(S // 4, 1), jnp.int32)
            pfl = np.full((B,), min(64, T), np.int32)
            fl = jnp.full((B,), T, jnp.int32)
            x1, padding_mask = eng(
                self.params, tok, tok_lens, ptl,
                jnp.zeros((B, T, F)), jnp.asarray(pfl), fl,
                jnp.zeros((B, T, F)),
            )
            x1_wo, wo_lens = self._strip_fn()(x1, padding_mask,
                                              jnp.asarray(pfl))
            # vocoder at this bucket's generated length, at the full
            # micro-batch width (B chunks vocode as one (B, T) program)
            n = max(int(np.asarray(wo_lens)[0]), 1)
            self._vocode_chunks([np.asarray(x1_wo)[0, :n]] * B)
            logging.info(f"warmed engine bucket B={B} S={S} T={T}")
        return len(self._engines)

    # --- internals ----------------------------------------------------------

    def _sample_batch(
        self, batch_tokens, prompt_tokens, prompt_features,
        num_step, guidance_scale, speed, t_shift,
    ):
        x1_wo, wo_lens, B_real = self._sample_batch_device(
            batch_tokens, prompt_tokens, prompt_features,
            num_step=num_step, guidance_scale=guidance_scale,
            speed=speed, t_shift=t_shift,
        )
        feats = np.asarray(x1_wo)[:B_real] / self.feat_scale
        lens = np.asarray(wo_lens)[:B_real]
        return feats, lens

    def _sample_batch_device(
        self, batch_tokens, prompt_tokens, prompt_features,
        num_step, guidance_scale, speed, t_shift,
    ):
        """Dispatch one sample micro-batch and return DEVICE arrays
        without blocking on the result.  JAX dispatch is async, so a
        pipelined server can overlap this batch's device time with the
        previous batch's host-side vocode/trim/reply work (the Triton
        decoupled-pipeline analog, reference
        runtime/nvidia_triton/README.md:146-157).

        Heterogeneous prompts: ``prompt_tokens`` may be one token list
        shared by the whole batch, or a per-row list of token lists;
        ``prompt_features`` one (T, F) array or a per-row list of (Ti, F)
        arrays; ``speed`` a scalar or per-row sequence.  The device
        programs are already per-row (the model's ``sample`` takes
        (B,) prompt_tokens_lens / prompt_features_lens,
        models/zipvoice.py:221-257), so concurrent requests from
        DIFFERENT speakers share one micro-batch — the reference Triton
        backend's per-request prompt padding (reference
        runtime/nvidia_triton/model_repo/zipvoice/1/model.py:94-167)."""
        B_real = len(batch_tokens)
        B = bucket_length(B_real, BATCH_BUCKETS)
        # normalize to per-row prompts (broadcast the single-prompt API)
        if prompt_tokens and isinstance(prompt_tokens[0], (list, tuple)):
            prompt_tokens_rows = [list(t) for t in prompt_tokens]
        else:
            prompt_tokens_rows = [list(prompt_tokens)] * B_real
        if isinstance(prompt_features, (list, tuple)):
            prompt_feat_rows = list(prompt_features)
        else:
            prompt_feat_rows = [prompt_features] * B_real
        assert len(prompt_tokens_rows) == B_real, (
            len(prompt_tokens_rows), B_real)
        assert len(prompt_feat_rows) == B_real, (
            len(prompt_feat_rows), B_real)
        speed_rows = (
            np.asarray(speed, np.float32)
            if np.ndim(speed) else np.full((B_real,), speed, np.float32)
        )
        cat_tokens = [
            p + t for p, t in zip(prompt_tokens_rows, batch_tokens)
        ]
        # pad batch dim by repeating the first row (masked out later)
        cat_tokens += [cat_tokens[0]] * (B - B_real)
        S = bucket_length(
            max(len(t) for t in cat_tokens) + 1, TOKEN_BUCKETS
        )
        tok, tok_lens = pad_tokens(
            cat_tokens, pad_id=self.model.pad_id, pad_to=S
        )

        def _pad_row(arr, n):
            if n == len(arr):
                return arr
            return np.concatenate(
                [arr, np.full(n - len(arr), arr[0], arr.dtype)]
            )

        ptl = _pad_row(
            np.array([len(p) for p in prompt_tokens_rows], np.int32), B
        )
        pfl = _pad_row(
            np.array([f.shape[0] for f in prompt_feat_rows], np.int32), B
        )
        text_lens = _pad_row(
            np.array([len(t) for t in batch_tokens], np.int32), B
        )
        speed_b = _pad_row(speed_rows, B)
        # duration prediction (reference zipvoice.py:323-325), float32 math
        fl = pfl + np.ceil(
            pfl.astype(np.float32) / ptl.astype(np.float32)
            * text_lens.astype(np.float32) / speed_b
        ).astype(np.int32)
        if int(fl.max()) > FRAME_BUCKETS[-1]:
            # an over-long request (or a prompt with an extreme
            # frames-per-token ratio) must degrade to a truncated
            # generation, not kill the serving worker — callers wanting
            # full length should chunk the text (frontend/text_chunking)
            logging.warning(
                f"predicted {int(fl.max())} frames exceeds the largest "
                f"bucket {FRAME_BUCKETS[-1]}; truncating"
            )
            fl = np.minimum(fl, FRAME_BUCKETS[-1])
        T = bucket_length(int(fl.max()), FRAME_BUCKETS)
        F = prompt_feat_rows[0].shape[1]
        pfl = np.minimum(pfl, T)
        pf = np.zeros((B, T, F), np.float32)
        for i in range(B):
            # pad rows (i >= B_real) repeat row 0, matching _pad_row above
            row = prompt_feat_rows[i if i < B_real else 0]
            n = min(row.shape[0], T)
            pf[i, :n] = row[:n]
        noise = self.rng.randn(B, T, F).astype(np.float32)

        if not hasattr(self, "_seen_buckets"):
            self._seen_buckets = set()
        if (B, S, T) not in self._seen_buckets:
            self._seen_buckets.add((B, S, T))
            # one line per new shape: feeds engine-export bucket selection
            # (bin/export_model --buckets) and compile-count audits
            logging.info(f"sample bucket B={B} S={S} T={T}")
        eng = None
        if self._engines is not None and self.quantize is None:
            m = self._engine_manifest
            if (m["num_step"] == num_step
                    and m["guidance_scale"] == guidance_scale
                    and m["t_shift"] == t_shift):
                eng = self._engines.get((B, S, T))
                if eng is None:
                    logging.info(
                        f"engine miss: bucket B={B} S={S} T={T} not in "
                        f"{sorted(self._engines)}"
                    )
        if eng is not None:
            x1, padding_mask = eng(
                self.params, jnp.asarray(tok), jnp.asarray(tok_lens),
                jnp.asarray(ptl), jnp.asarray(pf), jnp.asarray(pfl),
                jnp.asarray(fl), jnp.asarray(noise),
            )
            x1_wo, wo_lens = self._strip_fn()(
                x1, padding_mask, jnp.asarray(pfl)
            )
        else:
            fn = self._sample_fn(num_step, guidance_scale, t_shift)
            x1_wo, wo_lens = fn(
                self.params, jnp.asarray(tok), jnp.asarray(tok_lens),
                jnp.asarray(ptl), jnp.asarray(pf), jnp.asarray(pfl),
                jnp.asarray(fl), jnp.asarray(noise),
            )
        return x1_wo, wo_lens, B_real

    def _vocode_chunks(self, feats: List[np.ndarray]) -> List[np.ndarray]:
        """Batch-vocode variable-length mel chunks with frame bucketing."""
        out: List[Optional[np.ndarray]] = [None] * len(feats)
        fn = self._vocode_fn()
        # group by bucketed length
        groups = {}
        for i, f in enumerate(feats):
            T = bucket_length(f.shape[0], FRAME_BUCKETS)
            groups.setdefault(T, []).append(i)
        for T, idxs in groups.items():
            B = bucket_length(len(idxs), BATCH_BUCKETS)
            mel = np.zeros((B, T, feats[0].shape[1]), np.float32)
            for j, i in enumerate(idxs):
                mel[j, : feats[i].shape[0]] = feats[i]
            wav = np.asarray(fn(self.vocoder_params, jnp.asarray(mel)))
            for j, i in enumerate(idxs):
                n = feats[i].shape[0] * 256
                out[i] = wav[j, :n]
        return out
