"""Length/mask helpers.

Convention across this framework: boolean masks are *valid* masks
(True = real token / frame, False = padding). This is the inverse of the
reference's pad masks (`model_open_source.py:164-174`) — chosen so that
`x * mask` zeroes padding directly.
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) bool valid mask."""
    ids = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return ids < lengths[:, None]


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Mean of x over positions where mask is True (mask broadcast to x)."""
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), eps)


NEG_INF = -1e30
