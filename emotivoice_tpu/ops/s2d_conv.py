"""Space-to-depth 1-D convolution: full-lane matmuls for small-C stages.

A dilated conv over (B, T, C) with C < 128 underfills the MXU's 128 output
lanes. Reshaping the activation to (B, T/s, s*C) (space-to-depth, a pure
relayout — HBM bytes unchanged, unlike im2col) turns it into a conv over
packed rows with a block-structured dense kernel of s*C >= 128 output
lanes. FLOP overhead is K'*s/K (K' = packed taps) against the lane gain;
at the HiFi-GAN C=32/64 stages the stock lowering runs far below the lane
ratio, so the dense-packed form can win despite the overhead — acceptance
is measured per shape (tools/exp_s2d_conv.py), as with the transposed-conv
matmul lowering.

Exact (same-pad, stride 1, no groups): output slot j of packed row r needs
global input r*s + j + (i-c)*d, which lives in packed block
q = floor((j+(i-c)*d)/s), slot m = (j+(i-c)*d) mod s; zero conv padding in
packed space corresponds exactly to zero padding in time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pack_weight(
    w_hio: jnp.ndarray, dilation: int, s: int
) -> tuple[jnp.ndarray, int, int]:
    """(K, Ci, Co) same-pad kernel -> packed (K', s*Ci, s*Co) kernel plus
    the packed-row (pad_left, pad_right)."""
    kk, ci, co = w_hio.shape
    c = (kk - 1) // 2
    d = dilation
    q_min = -((c * d + s - 1) // s)  # floor(-c*d/s)
    q_max = (s - 1 + c * d) // s
    kp = q_max - q_min + 1
    wp = jnp.zeros((kp, s * ci, s * co), w_hio.dtype)
    for i in range(kk):
        for j in range(s):
            g = j + (i - c) * d
            q = g // s
            m = g - q * s
            wp = wp.at[
                q - q_min, m * ci : (m + 1) * ci, j * co : (j + 1) * co
            ].add(w_hio[i])
    return wp, -q_min, q_max


@functools.partial(jax.jit, static_argnames=("dilation", "s"))
def s2d_conv(
    x: jnp.ndarray,       # (B, T, C), T % s == 0
    w_hio: jnp.ndarray,   # (K, Ci, Co), stride 1, same padding
    dilation: int = 1,
    s: int = 4,
) -> jnp.ndarray:
    b, t, ci = x.shape
    co = w_hio.shape[-1]
    assert t % s == 0, (t, s)
    xp = x.reshape(b, t // s, s * ci)
    y = s2d_conv_packed(xp, w_hio, dilation, s)
    return y.reshape(b, t, co)


def s2d_conv_packed(
    xp: jnp.ndarray,      # (B, T/s, s*Ci) packed activation
    w_hio: jnp.ndarray,   # (K, Ci, Co) original kernel, stride 1, same pad
    dilation: int = 1,
    s: int = 4,
) -> jnp.ndarray:
    """Packed-in/packed-out variant: callers that keep a whole stage in the
    space-to-depth layout (one relayout per stage instead of two per conv —
    the (B,T,C<128)<->(B,T/s,s*C) reshape is NOT free on TPU, it's a tiled-
    layout copy) chain these directly. Returns (B, T/s, s*Co)."""
    wp, pl, pr = pack_weight(w_hio, dilation, s)
    return jax.lax.conv_general_dilated(
        xp, wp.astype(xp.dtype), (1,), [(pl, pr)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    ).astype(xp.dtype)
