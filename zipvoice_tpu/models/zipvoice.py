"""The ZipVoice flow-matching TTS model family in JAX.

Reference: /root/reference/zipvoice/models/zipvoice.py (534 LoC) and
zipvoice_distill.py.  The model holds:
- ``fm_decoder``: TTSZipformer over [x_t | text_cond | speech_cond]
  (in = 3*feat_dim, out = feat_dim) predicting the flow velocity;
- ``text_encoder``: small TTSZipformer over token embeddings;
- ``embed``: token embedding table.

Everything here is shape-static: token and frame lengths are carried as
arrays + masks; the host-side pipeline (frontend/pipeline.py) picks padded
bucket sizes before dispatching into the jitted programs.
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from zipvoice_tpu.models.conditioning import (
    condition_time_mask,
    make_pad_mask,
    predict_features_lens,
    upsample_text_embed,
)
from zipvoice_tpu.models.solver import euler_sample
from zipvoice_tpu.models.zipformer import TTSZipformer


class ZipVoice(nn.Module):
    """ZipVoice base model (reference zipvoice.py:35-133)."""

    fm_decoder_downsampling_factor: Sequence[int] = (1, 2, 4, 2, 1)
    fm_decoder_num_layers: Sequence[int] = (2, 2, 4, 4, 4)
    fm_decoder_cnn_module_kernel: Sequence[int] = (31, 15, 7, 15, 31)
    fm_decoder_feedforward_dim: int = 1536
    fm_decoder_num_heads: int = 4
    fm_decoder_dim: int = 512
    text_encoder_num_layers: int = 4
    text_encoder_feedforward_dim: int = 512
    text_encoder_cnn_module_kernel: int = 9
    text_encoder_num_heads: int = 4
    text_encoder_dim: int = 192
    time_embed_dim: int = 192
    text_embed_dim: int = 192
    query_head_dim: int = 32
    value_head_dim: int = 12
    pos_head_dim: int = 4
    pos_dim: int = 48
    feat_dim: int = 100
    vocab_size: int = 26
    pad_id: int = 0
    dtype: jnp.dtype = jnp.float32

    # distill models embed the guidance scale as a network input
    use_guidance_scale_embed: bool = False
    guidance_scale_embed_dim: int = 192
    use_pallas_attention: bool = False
    use_pallas_conv: bool = False

    def _fm_decoder_dims(self):
        """(in_dim, out_dim) of the flow-matching decoder; overridden by the
        stereo model (two-stream tuples)."""
        return self.feat_dim * 3, self.feat_dim

    def setup(self):
        fm_in, fm_out = self._fm_decoder_dims()
        self.fm_decoder = TTSZipformer(
            in_dim=fm_in,
            out_dim=fm_out,
            downsampling_factor=tuple(self.fm_decoder_downsampling_factor),
            num_encoder_layers=tuple(self.fm_decoder_num_layers),
            cnn_module_kernel=tuple(self.fm_decoder_cnn_module_kernel),
            encoder_dim=self.fm_decoder_dim,
            feedforward_dim=self.fm_decoder_feedforward_dim,
            num_heads=self.fm_decoder_num_heads,
            query_head_dim=self.query_head_dim,
            pos_head_dim=self.pos_head_dim,
            value_head_dim=self.value_head_dim,
            pos_dim=self.pos_dim,
            use_time_embed=True,
            time_embed_dim=self.time_embed_dim,
            use_guidance_scale_embed=self.use_guidance_scale_embed,
            guidance_scale_embed_dim=self.guidance_scale_embed_dim,
            dtype=self.dtype,
            use_pallas_attention=self.use_pallas_attention,
            use_pallas_conv=self.use_pallas_conv,
        )
        self.text_encoder = TTSZipformer(
            in_dim=self.text_embed_dim,
            out_dim=self.feat_dim,
            downsampling_factor=(1,),
            num_encoder_layers=(self.text_encoder_num_layers,),
            cnn_module_kernel=(self.text_encoder_cnn_module_kernel,),
            encoder_dim=self.text_encoder_dim,
            feedforward_dim=self.text_encoder_feedforward_dim,
            num_heads=self.text_encoder_num_heads,
            query_head_dim=self.query_head_dim,
            pos_head_dim=self.pos_head_dim,
            value_head_dim=self.value_head_dim,
            pos_dim=self.pos_dim,
            use_time_embed=False,
            dtype=self.dtype,
            use_pallas_attention=self.use_pallas_attention,
            use_pallas_conv=self.use_pallas_conv,
        )
        self.embed = nn.Embed(
            self.vocab_size, self.text_embed_dim, param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(stddev=1.0),
        )

    def forward_fm_decoder(
        self,
        t: jax.Array,
        xt: jax.Array,
        text_condition: jax.Array,
        speech_condition: jax.Array,
        padding_mask: Optional[jax.Array] = None,
        guidance_scale: Optional[jax.Array] = None,
        train: bool = False,
        dropout_rate=0.0,
        batch_count=None,
    ) -> jax.Array:
        """Velocity prediction (reference zipvoice.py:135-185).  t: (B,)."""
        xt = jnp.concatenate([xt, text_condition, speech_condition], axis=-1)
        return self.fm_decoder(
            xt, t=t, padding_mask=padding_mask, guidance_scale=guidance_scale,
            train=train, dropout_rate=dropout_rate, batch_count=batch_count,
        )

    def forward_text_embed(
        self,
        tokens: jax.Array,
        tokens_lens: jax.Array,
        train: bool = False,
        dropout_rate=0.0,
        batch_count=None,
    ) -> jax.Array:
        """Token ids (B, S) -> text-encoder embeddings (B, S, feat_dim)
        (reference zipvoice.py:187-212).  ``tokens`` must already include the
        one extra trailing pad appended by the reference's pad_labels
        (common.py:271) — the host-side tokenizer pipeline does this.
        """
        embed = self.embed(tokens)
        mask = make_pad_mask(tokens_lens, tokens.shape[1])
        return self.text_encoder(
            embed, t=None, padding_mask=mask, train=train,
            dropout_rate=dropout_rate, batch_count=batch_count,
        )

    def embed_spk(self, embed, tokens):
        """Hook for dialog models; identity in the base model."""
        return embed

    def __call__(
        self,
        tokens: jax.Array,
        tokens_lens: jax.Array,
        features: jax.Array,
        features_lens: jax.Array,
        noise: jax.Array,
        t: jax.Array,
        condition_drop_mask: Optional[jax.Array] = None,
        speech_condition_mask: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        train: bool = True,
        dropout_rate=0.0,
        batch_count=None,
    ) -> jax.Array:
        """Training loss (reference zipvoice.py:332-386).

        t: (B, 1, 1) flow time; noise: like features.
        condition_drop_mask: (B,) bool, True = drop the text condition (CFG
          training; drawn outside with prob condition_drop_ratio).
        speech_condition_mask: optional precomputed (B, T) bool span mask;
          if None it is drawn from ``rng``.
        Returns the scalar masked-MSE flow-matching loss.
        """
        T = features.shape[1]
        embed = self.forward_text_embed(
            tokens, tokens_lens, train=train, dropout_rate=dropout_rate,
            batch_count=batch_count,
        )
        text_condition, padding_mask = upsample_text_embed(
            embed, tokens_lens, features_lens, T
        )

        if speech_condition_mask is None:
            speech_condition_mask = condition_time_mask(
                rng, features_lens, T, mask_percent=(0.7, 1.0)
            )
        speech_condition = jnp.where(
            speech_condition_mask[:, :, None], 0.0, features
        )

        if condition_drop_mask is not None:
            text_condition = jnp.where(
                condition_drop_mask[:, None, None], 0.0, text_condition
            )

        xt = features * t + noise * (1 - t)
        ut = features - noise

        vt = self.forward_fm_decoder(
            t=t.reshape(-1),
            xt=xt,
            text_condition=text_condition,
            speech_condition=speech_condition,
            padding_mask=padding_mask,
            train=train,
            dropout_rate=dropout_rate,
            batch_count=batch_count,
        )

        loss_mask = speech_condition_mask & (~padding_mask)
        se = jnp.sum(jnp.square(vt - ut) * loss_mask[:, :, None])
        denom = jnp.maximum(jnp.sum(loss_mask) * self.feat_dim, 1)
        return se / denom

    def sample(
        self,
        tokens: jax.Array,
        tokens_lens: jax.Array,
        prompt_tokens_lens: jax.Array,
        prompt_features: jax.Array,
        prompt_features_lens: jax.Array,
        features_lens: jax.Array,
        noise: jax.Array,
        num_step: int = 16,
        guidance_scale: float = 1.0,
        t_shift: float = 0.5,
    ):
        """Generate features (reference zipvoice.py:388-486), fully
        shape-static.

        tokens: (B, S) prompt+text token ids, padded, incl. trailing pad
        tokens_lens: (B,) combined prompt+text token counts
        prompt_features: (B, T, F) prompt features already padded to the SAME
          padded frame length T as the output (zeros beyond the prompt)
        features_lens: (B,) total (prompt + generated) frame lengths — use
          ``predicted_features_lens`` or real lengths
        noise: (B, T, F) the x0 gaussian noise

        Returns (x1, padding_mask): the full trajectory endpoint (prompt
        region included) and its padding mask; the caller slices off the
        prompt region (see ``strip_prompt``).
        """
        T = prompt_features.shape[1]
        embed = self.forward_text_embed(tokens, tokens_lens)
        text_condition, padding_mask = upsample_text_embed(
            embed, tokens_lens, features_lens, T
        )

        prompt_mask = make_pad_mask(prompt_features_lens, T)
        speech_condition = jnp.where(
            prompt_mask[:, :, None], 0.0, prompt_features
        )

        distill = self.use_guidance_scale_embed

        def velocity_fn(t, x, tc, sc, pm, gs):
            return self.forward_fm_decoder(
                t=t, xt=x, text_condition=tc, speech_condition=sc,
                padding_mask=pm, guidance_scale=gs,
            )

        if self.is_initializing():
            # initialize fm_decoder params with one call OUTSIDE the scan
            # (params created inside lax.scan would leak tracers)
            B = noise.shape[0]
            gs = jnp.zeros((B,)) if distill else None
            _ = velocity_fn(
                jnp.zeros((B,)), noise, text_condition, speech_condition,
                padding_mask, gs,
            )
            return noise, padding_mask

        x1 = euler_sample(
            velocity_fn,
            x=noise,
            text_condition=text_condition,
            speech_condition=speech_condition,
            padding_mask=padding_mask,
            num_step=num_step,
            guidance_scale=guidance_scale,
            t_shift=t_shift,
            distill=distill,
        )
        return x1, padding_mask

    def sample_intermediate(
        self,
        tokens: jax.Array,
        tokens_lens: jax.Array,
        features: jax.Array,
        features_lens: jax.Array,
        noise: jax.Array,
        speech_condition_mask: jax.Array,
        t_start: float,
        t_end: float,
        num_step: int = 1,
        guidance_scale: float = 0.0,
        distill: Optional[bool] = None,
        train: bool = False,
        dropout_rate=0.0,
        batch_count=None,
    ):
        """Partial-trajectory sampling used by distillation training
        (reference zipvoice.py:488-534).  ``train=True`` runs the backbone
        with its training regularizers/dropout active, as the reference's
        distill student does (train_zipvoice_distill.py:564,589: model in
        .train() with the schedule clock at adjusted+100000)."""
        T = features.shape[1]
        embed = self.forward_text_embed(
            tokens, tokens_lens, train=train, dropout_rate=dropout_rate,
            batch_count=batch_count,
        )
        text_condition, padding_mask = upsample_text_embed(
            embed, tokens_lens, features_lens, T
        )
        speech_condition = jnp.where(
            speech_condition_mask[:, :, None], 0.0, features
        )

        if distill is None:
            distill = self.use_guidance_scale_embed

        def velocity_fn(t, x, tc, sc, pm, gs):
            return self.forward_fm_decoder(
                t=t, xt=x, text_condition=tc, speech_condition=sc,
                padding_mask=pm, guidance_scale=gs,
                train=train, dropout_rate=dropout_rate,
                batch_count=batch_count,
            )

        if self.is_initializing():
            B = noise.shape[0]
            gs = jnp.zeros((B,)) if distill else None
            _ = velocity_fn(
                jnp.zeros((B,)), noise, text_condition, speech_condition,
                padding_mask, gs,
            )
            return noise, padding_mask

        x_t_end = euler_sample(
            velocity_fn,
            x=noise,
            text_condition=text_condition,
            speech_condition=speech_condition,
            padding_mask=padding_mask,
            num_step=num_step,
            guidance_scale=guidance_scale,
            t_start=t_start,
            t_end=t_end,
            distill=distill,
        )
        return x_t_end, padding_mask


class ZipVoiceDistill(ZipVoice):
    """Distilled variant: same backbone, guidance scale as a network input
    (reference zipvoice_distill.py:27-94)."""

    use_guidance_scale_embed: bool = True


def strip_prompt(
    x1: jax.Array,
    padding_mask: jax.Array,
    prompt_features_lens: jax.Array,
):
    """Split the sampled features into (generated, prompt) parts, batched and
    masked — replaces the reference's per-utterance python loop
    (zipvoice.py:469-486).

    Returns (x1_wo_prompt, x1_wo_prompt_lens): generated region shifted to
    the start of the time axis and zero-padded.
    """
    B, T, F = x1.shape
    total_lens = jnp.sum(~padding_mask, axis=-1)
    wo_prompt_lens = total_lens - prompt_features_lens
    shift = jnp.arange(T, dtype=jnp.int32)[None, :] + prompt_features_lens[:, None].astype(jnp.int32)
    shift = jnp.clip(shift, 0, T - 1)
    x1_wo = jnp.take_along_axis(x1, shift[:, :, None], axis=1)
    valid = jnp.arange(T)[None, :] < wo_prompt_lens[:, None]
    return jnp.where(valid[:, :, None], x1_wo, 0.0), wo_prompt_lens


__all__ = [
    "ZipVoice",
    "ZipVoiceDistill",
    "strip_prompt",
    "predict_features_lens",
]
