"""Static-shape random segment cropping for GAN training.

Parity target: reference `models/hifigan/get_random_segments.py:8-27`.
The reference's per-item Python loop is replaced by a batched dynamic-slice
(gather) with a threaded PRNG key — fully jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_segments(x: jnp.ndarray, start_idxs: jnp.ndarray, segment_size: int):
    """x: (B, T, C) or (B, T); crop [start, start+segment_size) per item."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    b, t, c = x.shape
    if t < segment_size:
        x = jnp.pad(x, ((0, 0), (0, segment_size - t), (0, 0)))
        t = segment_size
    idx = start_idxs[:, None] + jnp.arange(segment_size)[None, :]
    idx = jnp.clip(idx, 0, t - 1)
    out = jnp.take_along_axis(x, idx[..., None], axis=1)
    return out[..., 0] if squeeze else out


def get_random_segments(
    rng: jax.Array,
    x: jnp.ndarray,  # (B, T, C)
    lengths: jnp.ndarray,  # (B,)
    segment_size: int,
):
    """Returns (segments (B, segment_size, C), start_idxs (B,))."""
    b = x.shape[0]
    max_start = jnp.clip(lengths - segment_size, 0, None).astype(jnp.float32)
    u = jax.random.uniform(rng, (b,))
    start_idxs = (u * max_start).astype(jnp.int32)
    return get_segments(x, start_idxs, segment_size), start_idxs
