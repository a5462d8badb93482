"""Variance adaptor modules: duration / pitch / energy predictors and the
text-mel alignment scorer.

Parity targets:
  - DurationPredictor / VariancePredictor: reference
    `models/prompt_tts_modified/modules/variance.py:9-123`
  - AlignmentModule (conv projections + -L2 score + log-softmax):
    reference `modules/alignment.py:13-57` (the beta-binomial prior is a pure
    op in `emotivoice_tpu.ops.align`)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from emotivoice_tpu.models.transformer import Conv1dSame, LN_EPS
from emotivoice_tpu.utils.masks import NEG_INF


class _ConvReluLnStack(nn.Module):
    n_layers: int
    n_chans: int
    kernel_size: int
    dropout_rate: float
    dtype: Optional[Any] = None  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.n_layers):
            x = Conv1dSame(self.n_chans, self.kernel_size, dtype=self.dtype,
                           name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class DurationPredictor(nn.Module):
    """Log-domain duration predictor (reference variance.py:9-64)."""

    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.5
    offset: float = 1.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, D)
        valid_mask: Optional[jnp.ndarray] = None,  # (B, T)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if valid_mask is not None:
            x = x * valid_mask[..., None].astype(x.dtype)
        h = _ConvReluLnStack(
            self.n_layers, self.n_chans, self.kernel_size, self.dropout_rate,
            dtype=self.dtype, name="conv",
        )(x, deterministic)
        out = nn.Dense(1, dtype=self.dtype, name="linear")(h)[..., 0]  # log-dur
        if valid_mask is not None:
            out = out * valid_mask.astype(out.dtype)
        return out

    @staticmethod
    def to_durations(log_d: jnp.ndarray, offset: float = 1.0) -> jnp.ndarray:
        """Inference transform: clamp(round(exp(x) - offset), 0)
        (reference variance.py:46-51)."""
        log_d = log_d.astype(jnp.float32)  # exp/round robust under bf16 compute
        return jnp.clip(jnp.round(jnp.exp(log_d) - offset), 0, None)


class VariancePredictor(nn.Module):
    """Pitch / energy predictor (reference variance.py:68-123)."""

    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        valid_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if valid_mask is not None:
            x = x * valid_mask[..., None].astype(x.dtype)
        h = _ConvReluLnStack(
            self.n_layers, self.n_chans, self.kernel_size, self.dropout_rate,
            dtype=self.dtype, name="conv",
        )(x, deterministic)
        out = nn.Dense(1, dtype=self.dtype, name="linear")(h)[..., 0]
        if valid_mask is not None:
            out = out * valid_mask.astype(out.dtype)
        return out


class VarianceEmbedding(nn.Module):
    """Conv1d k9 embedding of a scalar track back into the hidden dim
    (reference model_open_source.py:63-70 pitch_embed / energy_embed)."""

    features: int
    kernel_size: int = 9
    dropout_rate: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, track: jnp.ndarray, deterministic: bool = True):
        # track: (B, T) scalar values -> (B, T, features)
        h = Conv1dSame(self.features, self.kernel_size, dtype=self.dtype,
                       name="conv")(track[..., None])
        return nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)


class AlignmentModule(nn.Module):
    """Text/mel projection + negative-L2 log-attention scores
    (reference alignment.py:13-57, prior added by caller).

    Returns log_p_attn (B, T_feats, T_text): log-softmax over text axis with
    invalid text positions at -inf.
    """

    adim: int

    @nn.compact
    def __call__(
        self,
        text: jnp.ndarray,  # (B, T_text, adim)
        feats: jnp.ndarray,  # (B, T_feats, odim) mel targets
        text_valid: Optional[jnp.ndarray] = None,  # (B, T_text)
    ) -> jnp.ndarray:
        t = Conv1dSame(self.adim, 3, name="t_conv1")(text)
        t = nn.relu(t)
        t = Conv1dSame(self.adim, 1, name="t_conv2")(t)

        f = Conv1dSame(self.adim, 3, name="f_conv1")(feats)
        f = nn.relu(f)
        f = Conv1dSame(self.adim, 3, name="f_conv2")(f)
        f = nn.relu(f)
        f = Conv1dSame(self.adim, 1, name="f_conv3")(f)

        # -||f_t - t_n||_2 via expansion: avoids materializing the (B,T,N,D)
        # difference tensor the reference builds (alignment.py:41-43).
        f2 = jnp.sum(f * f, axis=-1)  # (B, Tf)
        t2 = jnp.sum(t * t, axis=-1)  # (B, Tn)
        cross = jnp.einsum("bfd,bnd->bfn", f, t, preferred_element_type=jnp.float32)
        sq = f2[:, :, None] - 2.0 * cross + t2[:, None, :]
        score = -jnp.sqrt(jnp.clip(sq, 1e-12, None))

        if text_valid is not None:
            score = jnp.where(text_valid[:, None, :], score, NEG_INF)
        return nn.log_softmax(score, axis=-1)
