"""Lane-packed dilated 1-D convolution for small channel counts.

TPU MXU lanes are 128 wide; a conv with C=32 output channels leaves 3/4 of
every lane row idle under the stock lowering. This op computes ``pack``
consecutive output timesteps per contraction row so the matmul's output dim
is ``pack * C`` (=128 when pack = 128//C), at the cost of a dense
block-Toeplitz weight with ``span = (K-1)*dilation + pack`` input taps —
a FLOP overhead of span/(pack*K) against a pack-fold lane-utilization gain.

Used by the HiFi-GAN MRF resblocks of the late (C=32/64) upsample stages
(reference models/hifigan/models.py:26-64 topology); numerically exact vs
lax.conv (same-pad, stride 1, no groups). Acceptance is per-shape and
measured (tools/exp_packed_conv.py), like the transposed-conv matmul
lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("dilation", "pack"))
def packed_dilated_conv(
    x: jnp.ndarray,          # (B, T, C_in)
    w_hio: jnp.ndarray,      # (K, C_in, C_out), 'same' padding, stride 1
    dilation: int = 1,
    pack: int = 4,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    b, t, ci = x.shape
    kk, _, co = w_hio.shape
    rf = (kk - 1) // 2 * dilation
    span = (kk - 1) * dilation + pack

    # Output rows: ceil(t / pack); pad the time axis so rows tile exactly.
    r = -(-t // pack)
    t_rows = r * pack
    # Window of row j starts at j*pack - rf (global); with a left pad of rf
    # that is j*pack in padded coordinates. Right-pad to cover the last
    # window and to a multiple of pack for the block reshape.
    right = (t_rows - t) + rf
    nb = -(-span // pack)  # blocks touched per row
    total = rf + t + right
    total_aligned = (r + nb) * pack  # enough blocks for j + nb - 1
    x_pad = jnp.pad(x, ((0, 0), (rf, right + (total_aligned - total)), (0, 0)))
    x_blk = x_pad.reshape(b, r + nb, pack, ci)

    # windows[b, j, s, c] = x_pad[b, j*pack + s, c], s in [0, span)
    windows = jnp.concatenate(
        [x_blk[:, j : j + r] for j in range(nb)], axis=2
    )[:, :, :span]  # (B, R, span, C_in)

    # Dense block-Toeplitz weight: output offset j within the row uses input
    # tap position j + i*dilation for original kernel tap i.
    wp = jnp.zeros((span, ci, pack, co), w_hio.dtype)
    for i in range(kk):
        for j in range(pack):
            wp = wp.at[j + i * dilation, :, j, :].set(w_hio[i])
    wp = wp.reshape(span * ci, pack * co)

    y = jnp.einsum(
        "brk,kf->brf",
        windows.reshape(b, r, span * ci),
        wp,
        preferred_element_type=jnp.float32,
    )
    y = y.astype(x.dtype).reshape(b, t_rows, co)[:, :t]
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
