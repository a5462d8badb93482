"""ESPnet-style pre-LN transformer encoder in flax.linen.

Behavioral parity target: reference
`models/prompt_tts_modified/modules/encoder.py` (Encoder / EncoderLayer /
MultiHeadedAttention / MultiLayeredConv1d / ScaledPositionalEncoding).

TPU-first design notes:
  - all shapes static; masks are boolean *valid* masks (True = real token)
  - attention is a batched einsum that XLA fuses onto the MXU; no KV cache is
    needed (the model is non-autoregressive)
  - LayerNorm eps is 1e-12 to match torch.nn.LayerNorm in the reference
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from emotivoice_tpu.utils.masks import NEG_INF

LN_EPS = 1e-12

# `dtype` on every module below is the *compute* dtype (flax convention):
# params are stored f32 and cast at use, so bf16 inference on the MXU needs no
# checkpoint changes. None keeps full f32. LayerNorm statistics stay f32
# internally regardless (flax promotes stats to at-least-f32).
Dtype = Any


def sinusoid_table(max_len: int, d_model: int, dtype=np.float32) -> np.ndarray:
    """Sinusoidal PE table — reference `encoder.py:216-237` (extend_pe)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(dtype)


class ScaledPositionalEncoding(nn.Module):
    """x + alpha * PE with learned scalar alpha (reference encoder.py:246-261)."""

    d_model: int
    max_len: int = 5000
    dropout_rate: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        alpha = self.param("alpha", nn.initializers.ones, ())
        t = x.shape[1]
        pe = jnp.asarray(sinusoid_table(max(self.max_len, t), self.d_model))[:t]
        x = x + alpha.astype(x.dtype) * pe[None, :, :].astype(x.dtype)
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class MultiHeadedAttention(nn.Module):
    """Reference encoder.py:55-109. Full (non-causal) attention."""

    n_heads: int
    d_model: int
    dropout_rate: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, D)
        valid_mask: Optional[jnp.ndarray],  # (B, T) True=valid, or None
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d_k = self.d_model // self.n_heads
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        q = dense("linear_q")(x)
        k = dense("linear_k")(x)
        v = dense("linear_v")(x)

        def split(h):
            b, t, _ = h.shape
            return h.reshape(b, t, self.n_heads, d_k)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(d_k)
        if valid_mask is not None:
            key_mask = valid_mask[:, None, None, :]  # (B,1,1,Tk)
            scores = jnp.where(key_mask, scores, NEG_INF)
        attn = nn.softmax(scores, axis=-1)
        if valid_mask is not None:
            # Match reference masked_fill-after-softmax exact zeroing.
            attn = jnp.where(valid_mask[:, None, None, :], attn, 0.0)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        b, t = out.shape[:2]
        out = out.reshape(b, t, self.d_model).astype(x.dtype)
        return nn.Dense(self.d_model, dtype=self.dtype, name="linear_out")(out)


class Conv1dSame(nn.Module):
    """1D conv over (B, T, C) with PyTorch-style symmetric padding."""

    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) // 2 * self.dilation
        return nn.Conv(
            self.features,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvFFN(nn.Module):
    """MultiLayeredConv1d: conv k -> gelu -> dropout -> conv k
    (reference encoder.py:31-52)."""

    d_model: int
    d_hidden: int
    kernel_size: int
    dropout_rate: float
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = Conv1dSame(self.d_hidden, self.kernel_size, dtype=self.dtype,
                       name="w_1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return Conv1dSame(self.d_model, self.kernel_size, dtype=self.dtype,
                          name="w_2")(h)


class EncoderLayer(nn.Module):
    """Pre-LN block (reference encoder.py:129-200, normalize_before=True)."""

    d_model: int
    n_heads: int
    d_ffn: int
    kernel_size: int
    dropout_rate: float
    attention_dropout_rate: float
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, valid_mask, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x)
        h = MultiHeadedAttention(
            self.n_heads, self.d_model, self.attention_dropout_rate,
            dtype=self.dtype, name="self_attn"
        )(h, valid_mask, deterministic)
        x = x + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)

        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x)
        h = ConvFFN(
            self.d_model, self.d_ffn, self.kernel_size, self.dropout_rate,
            dtype=self.dtype, name="feed_forward",
        )(h, deterministic)
        x = x + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return x


class TransformerEncoder(nn.Module):
    """Reference `Encoder` (encoder.py:263-324): ScaledPE -> N blocks -> LN."""

    d_model: int
    n_heads: int
    n_layers: int
    kernel_size: int = 3
    dropout_rate: float = 0.1
    max_len: int = 5000
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, D) input embeddings
        valid_mask: Optional[jnp.ndarray] = None,  # (B, T)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = ScaledPositionalEncoding(
            self.d_model, self.max_len, self.dropout_rate, dtype=self.dtype,
            name="pos_enc"
        )(x, deterministic)
        for i in range(self.n_layers):
            x = EncoderLayer(
                self.d_model,
                self.n_heads,
                self.d_model * 4,
                self.kernel_size,
                self.dropout_rate,
                self.dropout_rate,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, valid_mask, deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="after_norm")(x)
