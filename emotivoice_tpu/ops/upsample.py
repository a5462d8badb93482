"""Gaussian-upsampling length regulator as a masked, static-shape matmul.

Parity target: reference `GaussianUpsampling` (`modules/alignment.py:175-211`):
  c_n  = cumsum(d)_n - d_n / 2
  w_tn = softmax_n( -delta * (t - c_n)^2 )
  out  = w @ hs

The reference derives T_feats = max(sum(d)) dynamically at inference; here the
caller supplies a static ``max_frames`` bucket and the op masks beyond each
utterance's sum(d). The (T_feats, T_text) weight matmul maps directly onto the
MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from emotivoice_tpu.utils.masks import NEG_INF, sequence_mask


def gaussian_upsample(
    hs: jnp.ndarray,  # (B, T_text, D)
    ds: jnp.ndarray,  # (B, T_text) durations (float)
    text_valid: jnp.ndarray,  # (B, T_text)
    max_frames: int,
    feat_valid: Optional[jnp.ndarray] = None,  # (B, max_frames) or None
    delta: float = 0.1,
    alpha: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (upsampled (B, max_frames, D), mel_lengths (B,) int32)."""
    ds = ds.astype(jnp.float32) * alpha
    ds = ds * text_valid.astype(jnp.float32)

    totals = jnp.sum(ds, axis=1)
    # Degenerate all-zero utterance: fall back to duration 1 per token
    # (reference alignment.py:188-193).
    degenerate = totals <= 0
    ds = jnp.where(degenerate[:, None], text_valid.astype(jnp.float32), ds)
    totals = jnp.sum(ds, axis=1)

    mel_lengths = jnp.minimum(
        jnp.maximum(totals.astype(jnp.int32), 1), max_frames
    )
    if feat_valid is None:
        feat_valid = sequence_mask(mel_lengths, max_frames)

    t = jnp.arange(max_frames, dtype=jnp.float32)[None, :]
    t = t * feat_valid.astype(jnp.float32)  # reference multiplies t by h_masks
    c = jnp.cumsum(ds, axis=1) - ds / 2.0  # (B, T_text)

    energy = -delta * (t[:, :, None] - c[:, None, :]) ** 2
    energy = jnp.where(text_valid[:, None, :], energy, NEG_INF)
    w = jnp.exp(energy - jnp.max(energy, axis=2, keepdims=True))
    w = w / jnp.sum(w, axis=2, keepdims=True)
    out = jnp.einsum("bft,btd->bfd", w, hs, preferred_element_type=jnp.float32)
    out = out.astype(hs.dtype) * feat_valid[..., None].astype(hs.dtype)
    return out, mel_lengths
