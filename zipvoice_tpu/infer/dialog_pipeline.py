"""Dialogue inference pipelines (mono and stereo).

Reference: zipvoice/bin/infer_zipvoice_dialog.py (1286 LoC).

Mono: the two speakers' prompts are merged ("[S1] ptext1 [S2] ptext2", wavs
concatenated after silence-stripping), the dialog text is chunked at [S1]
turns, and generation follows the base pipeline with the Dialog model.

Stereo: the prompt must be 2-channel (a stereo wav, two stereo wavs
concatenated, or two mono prompts laid on opposite channels over silence,
reference :676-707); features are (T, 2*100); the generated (T, 200) is
split into per-channel mels and vocoded separately (:749-757).
"""

import datetime as dt
import logging
from typing import List, Optional, Union

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
from zipvoice_tpu.frontend.text_chunking import chunk_tokens_dialog
from zipvoice_tpu.infer.pipeline import (
    BATCH_BUCKETS,
    FRAME_BUCKETS,
    InferencePipeline,
)


class DialogInferencePipeline(InferencePipeline):
    """Mono two-speaker dialogue generation."""

    def merge_prompts(
        self,
        prompt_texts: List[str],
        prompt_wav_paths: List[str],
        target_rms: float = 0.1,
    ):
        """Two per-speaker prompts -> one merged prompt
        (reference :1083: '[S1]text1[S2]text2', wavs concatenated)."""
        sr = self.sampling_rate
        wavs = []
        for p in prompt_wav_paths:
            w = load_wav(p, sr)
            if w.shape[0] == 2:
                w = w.mean(axis=0, keepdims=True)
            w = remove_silence(w, sr, only_edge=False, trail_sil=200)
            wavs.append(w)
        merged_wav = np.concatenate(wavs, axis=-1)
        merged_text = f"[S1]{prompt_texts[0]}[S2]{prompt_texts[1]}"
        return merged_text, merged_wav

    def generate_dialog(
        self,
        prompt_text: Union[str, List[str]],
        prompt_wav_path: Union[str, List[str]],
        text: str,
        num_step: int = 16,
        guidance_scale: float = 1.5,
        speed: float = 1.0,
        t_shift: float = 0.5,
        target_rms: float = 0.1,
        max_duration: float = 100.0,
    ):
        sr = self.sampling_rate
        if isinstance(prompt_wav_path, (list, tuple)):
            prompt_text, prompt_wav = self.merge_prompts(
                list(prompt_text), list(prompt_wav_path), target_rms
            )
        else:
            prompt_wav = load_wav(prompt_wav_path, sr)
            if prompt_wav.shape[0] == 2:
                prompt_wav = prompt_wav.mean(axis=0, keepdims=True)
            prompt_wav = remove_silence(
                prompt_wav, sr, only_edge=False, trail_sil=200
            )
        prompt_wav, prompt_rms = rms_norm(prompt_wav, target_rms)
        prompt_features = (
            self.feature_extractor.extract(prompt_wav, sr) * self.feat_scale
        )

        tokens_str = self.tokenizer.texts_to_tokens([text])[0]
        prompt_tokens_str = self.tokenizer.texts_to_tokens([prompt_text])[0]
        prompt_duration = prompt_wav.shape[-1] / sr
        token_duration = prompt_duration / max(
            len(prompt_tokens_str) * speed, 1
        )
        max_tokens = max(4, int((25 - prompt_duration) / token_duration))
        chunks_str = chunk_tokens_dialog(tokens_str, max_tokens=max_tokens)
        chunked_tokens = self.tokenizer.tokens_to_token_ids(chunks_str)
        prompt_tokens = self.tokenizer.tokens_to_token_ids(
            [prompt_tokens_str]
        )[0]

        start_t = dt.datetime.now()
        feats_list = []
        for tokens in chunked_tokens:
            feats, lens = self._sample_batch(
                [tokens], prompt_tokens, prompt_features,
                num_step=num_step, guidance_scale=guidance_scale,
                speed=speed, t_shift=t_shift,
            )
            feats_list.append(feats[0, : lens[0]])
        start_voc = dt.datetime.now()
        wavs = self._vocode_chunks(feats_list)
        if prompt_rms < target_rms:
            wavs = [w * prompt_rms / target_rms for w in wavs]
        final = cross_fade_concat(
            [w[None] for w in wavs], fade_duration=0.1, sample_rate=sr
        )
        final = remove_silence(final, sr, only_edge=True)
        t = (dt.datetime.now() - start_t).total_seconds()
        wav_seconds = final.shape[-1] / sr
        metrics = {
            "t": t,
            "t_vocoder": (dt.datetime.now() - start_voc).total_seconds(),
            "wav_seconds": wav_seconds,
            "rtf": t / max(wav_seconds, 1e-9),
        }
        return final, metrics


class StereoDialogInferencePipeline(DialogInferencePipeline):
    """Two-channel dialogue generation (ZipVoice-Dialog-Stereo)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.feature_extractor = VocosFbank(num_channels=2)

    def _load_stereo_prompt(
        self, prompt_wav_path: Union[str, List[str]]
    ) -> np.ndarray:
        sr = self.sampling_rate
        if isinstance(prompt_wav_path, str):
            wav = load_wav(prompt_wav_path, sr)
            assert wav.shape[0] == 2, (
                "merged prompt must be stereo for stereo generation"
            )
            return wav
        wavs = [load_wav(p, sr) for p in prompt_wav_path]
        if wavs[0].shape[0] == 2:
            return np.concatenate(wavs, axis=-1)
        # two mono prompts on opposite channels over silence (:699-707)
        n = wavs[0].shape[1] + wavs[1].shape[1]
        out = np.zeros((2, n), np.float32)
        out[0, : wavs[0].shape[1]] = wavs[0][0]
        out[1, wavs[0].shape[1]:] = wavs[1][0]
        return out

    def generate_dialog_stereo(
        self,
        prompt_text: Union[str, List[str]],
        prompt_wav_path: Union[str, List[str]],
        text: str,
        num_step: int = 16,
        guidance_scale: float = 1.5,
        speed: float = 1.0,
        t_shift: float = 0.5,
        target_rms: float = 0.1,
    ):
        sr = self.sampling_rate
        if isinstance(prompt_text, (list, tuple)):
            prompt_text = f"[S1]{prompt_text[0]}[S2]{prompt_text[1]}"
        prompt_wav = self._load_stereo_prompt(prompt_wav_path)
        prompt_wav, prompt_rms = rms_norm(prompt_wav, target_rms)
        prompt_features = (
            self.feature_extractor.extract(prompt_wav, sr) * self.feat_scale
        )  # (T, 2*100)

        tokens = self.tokenizer.texts_to_token_ids([text])[0]
        prompt_tokens = self.tokenizer.texts_to_token_ids([prompt_text])[0]

        start_t = dt.datetime.now()
        feats, lens = self._sample_batch(
            [tokens], prompt_tokens, prompt_features,
            num_step=num_step, guidance_scale=guidance_scale,
            speed=speed, t_shift=t_shift,
        )
        feat = feats[0, : lens[0]]  # (T, 200)
        start_voc = dt.datetime.now()
        F = feat.shape[1] // 2
        wav_l, wav_r = self._vocode_chunks([feat[:, :F], feat[:, F:]])
        n = min(len(wav_l), len(wav_r))
        wav = np.stack([wav_l[:n], wav_r[:n]], axis=0)
        if prompt_rms < target_rms:
            wav = wav * prompt_rms / target_rms
        t = (dt.datetime.now() - start_t).total_seconds()
        wav_seconds = wav.shape[-1] / sr
        metrics = {
            "t": t,
            "t_vocoder": (dt.datetime.now() - start_voc).total_seconds(),
            "wav_seconds": wav_seconds,
            "rtf": t / max(wav_seconds, 1e-9),
        }
        return wav, metrics
