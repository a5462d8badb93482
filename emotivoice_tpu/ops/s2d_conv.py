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


def _accum_dtype(dt):
    """Conv accumulation dtype: explicit f32 for f32 inputs; None for
    narrow dtypes. The TPU MXU accumulates bf16 convs in f32 internally and
    rounds once at the end either way, so the results are identical — but
    preferred_element_type=f32 on a bf16 conv breaks the conv's
    transpose-rhs VJP (f32 cotangent vs bf16 lhs, jax 0.9 conv dtype rule),
    which bf16 TRAINING hits. Non-TPU caveat: CPU/GPU backends may
    genuinely accumulate bf16 convs in bf16 under None, i.e. bf16
    inference OFF-TPU is lower precision than the pre-r4
    preferred_element_type=f32 behavior. Not gated on backend because the
    VJP dtype rule bites on every backend (the CPU-mesh bf16 train test
    would break), and the repo's bf16 numeric-tolerance tests already
    bound the error; TPU — the target — is exact either way."""
    return jnp.float32 if dt == jnp.float32 else None


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
        preferred_element_type=_accum_dtype(xp.dtype),
    ).astype(xp.dtype)


def pack_tconv_weight(
    w_iok: jnp.ndarray, stride: int, padding: int, s_in: int, s_out: int
) -> tuple[jnp.ndarray, int, int, int]:
    """Torch-layout transposed-conv kernel (Ci, Co, K) -> packed
    (K', s_in*Ci, s_out*Co) stride-rho dense kernel.

    A ConvTranspose1d writes out[n] += x[t] @ w[:, :, i] for every
    n = stride*t + i - padding. With the input in space-to-depth layout
    (B, T/s_in, s_in*Ci) and the output wanted in (B, T*stride/s_out,
    s_out*Co), output slot j of packed row r is global n = r*s_out + j and
    draws from input global t = (n + padding - i)/stride (when divisible),
    i.e. packed input row rho*r + q, slot m, with
    e = (j + padding - i)/stride, q = floor(e/s_in), m = e mod s_in and
    rho = s_out/(stride*s_in). For integer rho this is a plain stride-rho
    conv over packed rows — the transposed conv lands DIRECTLY in the next
    stage's packed layout, eliminating the unpack->tconv->repack relayout
    pair entirely (the (B,T,C<128)<->(B,T/s,s*C) reshapes are tiled-layout
    copies of ~100 MB-class activations at production shapes).

    Returns (packed kernel, pad_left, pad_right, rho); requires
    s_out % (stride * s_in) == 0.
    """
    ci, co, kk = w_iok.shape
    assert s_out % (stride * s_in) == 0, (s_out, stride, s_in)
    rho = s_out // (stride * s_in)
    taps = []  # (q, m, j, i)
    for j in range(s_out):
        for i in range(kk):
            num = j + padding - i
            if num % stride != 0:
                continue
            e = num // stride
            q = e // s_in
            m = e - q * s_in
            taps.append((q, m, j, i))
    q_min = min(t[0] for t in taps)
    q_max = max(t[0] for t in taps)
    kp = q_max - q_min + 1
    wp = jnp.zeros((kp, s_in * ci, s_out * co), w_iok.dtype)
    for q, m, j, i in taps:
        wp = wp.at[
            q - q_min, m * ci : (m + 1) * ci, j * co : (j + 1) * co
        ].add(w_iok[:, :, i])
    return wp, -q_min, q_max, rho


def tconv_packed(
    xp: jnp.ndarray,      # (B, T/s_in, s_in*Ci) packed activation
    w_iok: jnp.ndarray,   # (Ci, Co, K) torch-layout tconv kernel
    stride: int,
    padding: int,
    s_in: int,
    s_out: int,
) -> jnp.ndarray:
    """Packed-in/packed-out transposed conv; returns (B, T*stride/s_out,
    s_out*Co). Exact vs the stock lowering (zero rows in packed space are
    zero samples, so edge handling matches ConvTranspose1d's output crop
    for out_len == T*stride, i.e. padding == (K - stride)//2)."""
    wp, pl, pr, rho = pack_tconv_weight(w_iok, stride, padding, s_in, s_out)
    return jax.lax.conv_general_dilated(
        xp, wp.astype(xp.dtype), (rho,), [(pl, pr)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=_accum_dtype(xp.dtype),
    ).astype(xp.dtype)
