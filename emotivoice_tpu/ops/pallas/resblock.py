"""Pallas TPU kernel: fused HiFi-GAN MRF residual unit.

One residual unit of ResBlock1 (reference models/hifigan/models.py:52-58) is
    xt = conv_k_d( lrelu(x) )      # dilated conv, kernel k, dilation d
    xt = conv_k_1( lrelu(xt) )     # plain conv, kernel k
    x  = x + xt

XLA lowers this as two conv ops with elementwise producers/consumers — the
intermediate xt round-trips HBM at the late vocoder stages where C is small
(32-128) and T is huge (up to ~0.5M samples/batch row), so the op is
HBM-bandwidth-bound. This kernel keeps the whole unit in VMEM: the input
tile is loaded once (with halo), both convs run as k unrolled (C_in x C_out)
matmuls on the MXU, and only the residual output is written back.

Weights are passed in torch layout (Co, Ci, K) folded (weight-norm already
baked) — use `emotivoice_tpu.models.hifigan.fold_params` first.

Constraints: C multiple of 8 preferred (lane padding handled by caller),
T tile = `block_t` (default 4096), halo = (k-1)//2 * d per side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _lrelu(x, slope=LRELU_SLOPE):
    # max-form leaky ReLU (valid for 0<slope<1): avoids a float comparison,
    # which Mosaic does not support on bf16 vectors
    return jnp.maximum(x, x * slope)


def _residual_unit_kernel(
    x_ref,  # (block_t + 2*hp, C) input tile incl. 8-aligned halo
    w1_ref,  # (K, C, C) dilated conv weights (HIO layout)
    b1_ref,  # (1, C)
    w2_ref,  # (K, C, C) plain conv weights
    b2_ref,  # (1, C)
    o_ref,  # (block_t, C) output tile
    *,
    k: int,
    d: int,
    block_t: int,
    t_real: int,
    hp: int,  # per-side tile padding, halo rounded up to a multiple of 8
):
    halo1 = (k - 1) // 2 * d  # dilated conv reach
    halo2 = (k - 1) // 2  # plain conv reach
    off = hp - halo1 - halo2  # alignment slack at the tile start
    # Stage 1: dilated conv over lrelu(x); compute block_t + 2*halo2 rows so
    # stage 2 has its own halo without re-reading HBM.
    t1 = block_t + 2 * halo2
    a = _lrelu(x_ref[:])  # (t_in, C)

    acc1 = jnp.zeros((t1, a.shape[1]), jnp.float32)
    for kk in range(k):
        sl = a[off + kk * d : off + kk * d + t1, :]
        acc1 += jnp.dot(sl, w1_ref[kk], preferred_element_type=jnp.float32)
    xt = acc1 + b1_ref[0][None, :]

    # Stage 2: plain conv over lrelu(xt). Rows of xt outside the real array
    # must enter the conv as ZERO (the XLA reference zero-pads lrelu(xt),
    # whereas a haloed xt row at the array edge would be lrelu(b1)).
    ti = pl.program_id(1)
    global_row = (
        ti * block_t
        + jax.lax.broadcasted_iota(jnp.int32, (t1, 1), 0)
        - halo2
    )
    row_valid = (global_row >= 0) & (global_row < t_real)
    a2 = jnp.where(row_valid, _lrelu(xt), 0.0)
    acc2 = jnp.zeros((block_t, a.shape[1]), jnp.float32)
    for kk in range(k):
        sl = a2[kk : kk + block_t, :]
        acc2 += jnp.dot(sl, w2_ref[kk], preferred_element_type=jnp.float32)
    xt2 = acc2 + b2_ref[0][None, :]

    # Residual add against the un-activated center of the input tile.
    center = x_ref[hp : hp + block_t, :]
    o_ref[:] = (center + xt2).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "d", "block_t"))
def fused_residual_unit(
    x: jnp.ndarray,  # (B, T, C)
    w1: jnp.ndarray,  # (K, C, C) HIO
    b1: jnp.ndarray,  # (C,)
    w2: jnp.ndarray,  # (K, C, C)
    b2: jnp.ndarray,  # (C,)
    k: int,
    d: int,
    block_t: int = 4096,
) -> jnp.ndarray:
    b, t, c = x.shape
    halo1 = (k - 1) // 2 * d
    halo2 = (k - 1) // 2
    # Per-side tile padding: halo rounded up to a multiple of 8 so the
    # Element block's sublane dimension satisfies TPU tiling (block second-
    # to-last dim must be 8-divisible).
    hp = -(-(halo1 + halo2) // 8) * 8

    n_blocks = -(-t // block_t)
    t_pad = n_blocks * block_t
    tile = block_t + 2 * hp
    # Zero-pad (aligned halo both sides + tail), then materialize the
    # overlapping tiles with a gather: TPU Pallas requires uniform Blocked
    # specs, so halos are staged as an explicit (B, n_blocks, tile, C)
    # array. The duplicated halo rows are <=2*hp/block_t (a few %) of x.
    xp = jnp.pad(x, ((0, 0), (hp, hp + (t_pad - t)), (0, 0)))
    idx = (
        jnp.arange(n_blocks)[:, None] * block_t + jnp.arange(tile)[None, :]
    )
    xtiles = xp[:, idx, :]  # (B, n_blocks, tile, C)

    grid = (b, n_blocks)
    out = pl.pallas_call(
        functools.partial(
            _residual_unit_kernel, k=k, d=d, block_t=block_t, t_real=t, hp=hp
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (None, None, tile, c),
                lambda bi, ti: (bi, ti, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((k, c, c), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, c), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, block_t, c), lambda bi, ti: (bi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * k * b * t_pad * c * c,
            bytes_accessed=4 * (2 * b * t_pad * c + 2 * k * c * c),
            transcendentals=0,
        ),
    )(xtiles, w1, b1[None, :], w2, b2[None, :])
    return out[:, :t, :]


def fused_residual_unit_reference(x, w1, b1, w2, b2, k, d):
    """Plain-XLA reference implementation (for correctness/benchmarks)."""
    def conv(a, w, bias, dil):
        pad = (k - 1) // 2 * dil
        y = jax.lax.conv_general_dilated(
            a, w, (1,), [(pad, pad)], rhs_dilation=(dil,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        )
        return y.astype(a.dtype) + bias

    xt = conv(_lrelu(x), w1, b1, d)
    xt = conv(_lrelu(xt), w2, b2, 1)
    return x + xt


def torch_weights_to_hio(w_torch: np.ndarray) -> np.ndarray:
    """(Co, Ci, K) folded torch conv weight -> (K, Ci, Co) HIO."""
    return np.ascontiguousarray(np.transpose(w_torch, (2, 1, 0)))
