"""ZipVoice-Dialog and ZipVoice-Dialog-Stereo models.

Reference: /root/reference/zipvoice/models/zipvoice_dialog.py (358 LoC).

Dialog adds a 2-entry speaker-turn embedding driven by the cumulative parity
of [S1]/[S2] tokens (reference :118-125) and a suffix-anchored speech
condition mask (50-100% from the end, :187).  Stereo swaps the fm_decoder
for the two-stream Zipformer (in = (5F, 3F), out = (2F, F)) so two-channel
and mixed-channel features share one trunk, and adds a speaker-exclusive
energy loss (:314-358).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from zipvoice_tpu.models.conditioning import (
    condition_time_mask,
    make_pad_mask,
    upsample_text_embed,
)
from zipvoice_tpu.models.zipvoice import ZipVoice


class ZipVoiceDialog(ZipVoice):
    """Two-speaker single-channel dialogue TTS (reference :28-215)."""

    spk_a_id: int = 360
    spk_b_id: int = 361

    def setup(self):
        super().setup()
        self.spk_embed = nn.Embed(
            2, self.feat_dim, param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(stddev=0.1),
        )

    def spk_indices(self, tokens: jax.Array) -> jax.Array:
        """Cumulative [S1]/[S2] parity per position: 0/1 = speaker embed
        index, -1 = pad (no embedding) (reference :118-125)."""
        turn_mask = (
            (tokens == self.spk_a_id) | (tokens == self.spk_b_id)
        ).astype(jnp.int32)
        spk_mask = jnp.cumsum(turn_mask, axis=1) % 2
        return jnp.where(tokens == self.pad_id, -1, spk_mask)

    def forward_text_embed(
        self, tokens, tokens_lens, train: bool = False, dropout_rate=0.0,
        batch_count=None,
    ):
        embed = self.embed(tokens)
        mask = make_pad_mask(tokens_lens, tokens.shape[1])
        embed = self.text_encoder(
            embed, t=None, padding_mask=mask, train=train,
            dropout_rate=dropout_rate, batch_count=batch_count,
        )
        spk = self.spk_indices(tokens)
        table = self.spk_embed.embedding.astype(embed.dtype)
        embed = embed + jnp.where((spk == 0)[:, :, None], table[0], 0.0)
        embed = embed + jnp.where((spk == 1)[:, :, None], table[1], 0.0)
        return embed

    def __call__(
        self,
        tokens,
        tokens_lens,
        features,
        features_lens,
        noise,
        t,
        condition_drop_mask: Optional[jax.Array] = None,
        speech_condition_mask: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        train: bool = True,
        dropout_rate=0.0,
        batch_count=None,
    ):
        """Training loss with the dialog suffix mask (reference :161-215)."""
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
                rng, features_lens, T, mask_percent=(0.5, 1.0), suffix=True
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
            t=t.reshape(-1), xt=xt, text_condition=text_condition,
            speech_condition=speech_condition, padding_mask=padding_mask,
            train=train, dropout_rate=dropout_rate, batch_count=batch_count,
        )
        loss_mask = speech_condition_mask & (~padding_mask)
        se = jnp.sum(jnp.square(vt - ut) * loss_mask[:, :, None])
        denom = jnp.maximum(jnp.sum(loss_mask) * vt.shape[-1], 1)
        return se / denom


class ZipVoiceDialogStereo(ZipVoiceDialog):
    """Two-channel dialogue TTS with the two-stream decoder and the
    speaker-exclusive energy loss (reference :218-358)."""

    def _fm_decoder_dims(self):
        # two-stream decoder (reference :241-256)
        F = self.feat_dim
        return (F * 5, F * 3), (F * 2, F)

    @staticmethod
    def _energy(fbank):
        return jnp.mean(fbank, axis=-1)

    def energy_based_loss(self, fbank1, fbank2, gt_fbank):
        """Penalty for simultaneous above-threshold energy in both channels;
        threshold = per-utterance median frame energy of the ground truth
        (reference :327-358)."""
        F = self.feat_dim
        energy1 = self._energy(fbank1)
        energy2 = self._energy(fbank2)
        gt_both = jnp.concatenate(
            [gt_fbank[:, :, :F], gt_fbank[:, :, F:]], axis=1
        )
        thresholds = jnp.quantile(
            self._energy(gt_both), 0.5, axis=1
        )[:, None]
        both = (
            (energy1 > thresholds) & (energy2 > thresholds)
        ).astype(fbank1.dtype)
        return both * (energy1 - thresholds) * (energy2 - thresholds)

    def __call__(
        self,
        tokens,
        tokens_lens,
        features,
        features_lens,
        noise,
        t,
        condition_drop_mask: Optional[jax.Array] = None,
        speech_condition_mask: Optional[jax.Array] = None,
        rng: Optional[jax.Array] = None,
        train: bool = True,
        dropout_rate=0.0,
        batch_count=None,
        se_weight: float = 1.0,
    ):
        """Training loss: flow matching + speaker-exclusive energy loss
        (reference :258-325).  ``features`` is (B, T, 2F) for the stereo
        objective (se_weight>0) or (B, T, F) mixed (se_weight=0)."""
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
                rng, features_lens, T, mask_percent=(0.5, 1.0), suffix=True
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
            t=t.reshape(-1), xt=xt, text_condition=text_condition,
            speech_condition=speech_condition, padding_mask=padding_mask,
            train=train, dropout_rate=dropout_rate, batch_count=batch_count,
        )
        loss_mask = speech_condition_mask & (~padding_mask)
        se = jnp.sum(jnp.square(vt - ut) * loss_mask[:, :, None])
        denom = jnp.maximum(jnp.sum(loss_mask) * vt.shape[-1], 1)
        fm_loss = se / denom

        if se_weight > 0:
            F = self.feat_dim
            target = xt + vt * (1 - t)
            penalty = self.energy_based_loss(
                target[:, :, :F], target[:, :, F:], features
            )
            energy_loss = jnp.sum(penalty * loss_mask) / jnp.maximum(
                jnp.sum(loss_mask), 1
            )
            return fm_loss + energy_loss * se_weight
        return fm_loss
