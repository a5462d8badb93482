"""PromptTTS acoustic model (JETS-style non-autoregressive TTS) in flax.

Parity target: reference `models/prompt_tts_modified/model_open_source.py`.
Structure: phoneme embedding -> transformer encoder -> [speaker, style,
content] conditioning concat+proj -> variance adaptor (duration/pitch/energy)
-> Gaussian-upsampling length regulation -> transformer decoder -> 80-d mel
projection.

TPU-first deviations from the reference:
  - everything is static-shape; the inference branch takes a ``max_frames``
    mel bucket instead of deriving T_feats dynamically
    (reference model_open_source.py:139-146 uses dynamic sum(d))
  - MAS/prior/averaging run on-device (see emotivoice_tpu.ops.align) instead
    of the reference's scipy/numba host round-trips
  - the decoder is masked at inference too (the reference passes h_masks=None
    at batch=1 where padding doesn't exist; with batched bucketed synthesis
    masking is the equivalent semantics)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from emotivoice_tpu.config import AcousticConfig
from emotivoice_tpu.models.transformer import TransformerEncoder
from emotivoice_tpu.models.variance import (
    AlignmentModule,
    DurationPredictor,
    VariancePredictor,
    VarianceEmbedding,
)
from emotivoice_tpu.ops.align import (
    average_by_path,
    beta_binomial_prior,
    viterbi_decode,
)
from emotivoice_tpu.ops.upsample import gaussian_upsample
from emotivoice_tpu.utils.masks import sequence_mask


class PromptTTS(nn.Module):
    cfg: AcousticConfig
    dtype: Optional[Any] = None  # compute dtype (bf16 inference); params f32

    def setup(self):
        c = self.cfg
        self.src_word_emb = nn.Embed(
            c.n_vocab, c.hidden, embedding_init=nn.initializers.normal(1.0),
            dtype=self.dtype,
        )
        self.spk_tokenizer = nn.Embed(
            c.n_speaker, c.hidden, embedding_init=nn.initializers.normal(1.0),
            dtype=self.dtype,
        )
        self.encoder = TransformerEncoder(
            d_model=c.hidden,
            n_heads=c.encoder_n_heads,
            n_layers=c.encoder_n_layers,
            kernel_size=c.encoder_kernel_size,
            dropout_rate=c.encoder_p_dropout,
            max_len=c.max_pe_len,
            dtype=self.dtype,
            name="encoder",
        )
        self.decoder = TransformerEncoder(
            d_model=c.hidden,
            n_heads=c.decoder_n_heads,
            n_layers=c.decoder_n_layers,
            kernel_size=c.decoder_kernel_size,
            dropout_rate=c.decoder_p_dropout,
            max_len=c.max_pe_len,
            dtype=self.dtype,
            name="decoder",
        )
        self.embed_projection1 = nn.Dense(c.hidden, dtype=self.dtype)
        self.duration_predictor = DurationPredictor(
            n_layers=c.duration_n_layers,
            n_chans=c.variance_n_hidden,
            kernel_size=c.duration_kernel_size,
            dropout_rate=c.duration_p_dropout,
            dtype=self.dtype,
        )
        self.pitch_predictor = VariancePredictor(
            n_layers=c.variance_n_layers,
            n_chans=c.variance_n_hidden,
            kernel_size=c.variance_kernel_size,
            dropout_rate=c.variance_p_dropout,
            dtype=self.dtype,
        )
        self.energy_predictor = VariancePredictor(
            n_layers=c.energy_n_layers,
            n_chans=c.variance_n_hidden,
            kernel_size=c.energy_kernel_size,
            dropout_rate=c.variance_p_dropout,
            dtype=self.dtype,
        )
        self.pitch_embed = VarianceEmbedding(
            c.hidden, c.variance_embed_kernel_size, c.variance_embed_p_dropout,
            dtype=self.dtype,
        )
        self.energy_embed = VarianceEmbedding(
            c.hidden, c.variance_embed_kernel_size, c.variance_embed_p_dropout,
            dtype=self.dtype,
        )
        self.alignment_module = AlignmentModule(adim=c.hidden)
        self.to_mel = nn.Dense(c.n_mels, dtype=self.dtype)

    def _condition(
        self,
        tokens,
        text_valid,
        speaker,
        style_embedding,
        content_embedding,
        deterministic,
    ):
        b, t = tokens.shape
        if self.dtype is not None:
            style_embedding = style_embedding.astype(self.dtype)
            content_embedding = content_embedding.astype(self.dtype)
        x = self.src_word_emb(tokens)
        x = self.encoder(x, text_valid, deterministic)
        spk = self.spk_tokenizer(speaker)[:, None, :]
        tile = lambda e: jnp.broadcast_to(e[:, None, :], (b, t, e.shape[-1]))
        x = jnp.concatenate(
            [x, tile(spk[:, 0]), tile(style_embedding), tile(content_embedding)],
            axis=-1,
        )
        return self.embed_projection1(x)

    def __call__(
        self,
        tokens: jnp.ndarray,  # (B, T_text) int32
        text_lengths: jnp.ndarray,  # (B,)
        speaker: jnp.ndarray,  # (B,)
        style_embedding: jnp.ndarray,  # (B, 768)
        content_embedding: jnp.ndarray,  # (B, 768)
        *,
        mel_targets: Optional[jnp.ndarray] = None,  # (B, T_feats, n_mels)
        feats_lengths: Optional[jnp.ndarray] = None,  # (B,)
        pitch_targets: Optional[jnp.ndarray] = None,  # (B, T_feats) frame level
        energy_targets: Optional[jnp.ndarray] = None,  # (B, T_feats)
        max_frames: Optional[int] = None,  # inference mel bucket
        alpha: float = 1.0,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        c = self.cfg
        b, t_text = tokens.shape
        text_valid = sequence_mask(text_lengths, t_text)
        x = self._condition(
            tokens, text_valid, speaker, style_embedding, content_embedding,
            deterministic,
        )

        training = mel_targets is not None
        out: Dict[str, Any] = {"input_lengths": text_lengths}

        p_outs = self.pitch_predictor(x, text_valid, deterministic)
        e_outs = self.energy_predictor(x, text_valid, deterministic)

        if training:
            t_feats = mel_targets.shape[1]
            feat_valid = sequence_mask(feats_lengths, t_feats)
            log_p_attn = self.alignment_module(x, mel_targets, text_valid)
            prior = beta_binomial_prior(text_lengths, feats_lengths, t_text, t_feats)
            log_p_attn = log_p_attn + prior
            ds, bin_loss, path = viterbi_decode(
                log_p_attn, text_lengths, feats_lengths
            )
            ps = average_by_path(path, pitch_targets, text_lengths, feats_lengths, t_text)
            es = average_by_path(path, energy_targets, text_lengths, feats_lengths, t_text)

            d_outs = self.duration_predictor(x, text_valid, deterministic)
            p_embs = self.pitch_embed(ps, deterministic)
            e_embs = self.energy_embed(es, deterministic)
            x = x + p_embs + e_embs

            x, _ = gaussian_upsample(
                x, ds, text_valid, t_feats, feat_valid, delta=c.upsample_delta,
                alpha=alpha,
            )
            mel_lengths = feats_lengths
            out.update(
                log_p_attn=log_p_attn,
                bin_loss=bin_loss,
                duration_targets=ds,
                pitch_targets=ps,
                energy_targets=es,
                alignment_path=path,
            )
        else:
            assert max_frames is not None, "inference needs a static mel bucket"
            feat_valid = None
            d_outs_log = self.duration_predictor(x, text_valid, deterministic)
            ds = DurationPredictor.to_durations(d_outs_log)
            ds = ds * text_valid.astype(ds.dtype)
            d_outs = d_outs_log
            p_embs = self.pitch_embed(p_outs, deterministic)
            e_embs = self.energy_embed(e_outs, deterministic)
            x = x + p_embs + e_embs

            x, mel_lengths = gaussian_upsample(
                x, ds, text_valid, max_frames, None, delta=c.upsample_delta,
                alpha=alpha,
            )
            feat_valid = sequence_mask(mel_lengths, max_frames)
            out["durations"] = ds

        x = self.decoder(x, feat_valid, deterministic)
        mel = self.to_mel(x)
        if feat_valid is not None:
            mel = mel * feat_valid[..., None].astype(mel.dtype)

        out.update(
            dec_outputs=mel,
            pitch_predictions=p_outs,
            energy_predictions=e_outs,
            log_duration_predictions=d_outs,
            output_lengths=mel_lengths,
        )
        return out
