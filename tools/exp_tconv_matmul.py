#!/usr/bin/env python
"""Experiment: ConvTranspose1d as dense matmul + overlap-add vs lhs-dilated
conv, at HiFi-GAN upsample shapes.

A transposed conv (stride u, kernel k) lowered as lhs-dilation makes XLA
convolve over a u-times zero-dilated input. The subpixel formulation
computes Y = X @ W' with W' (Ci, k*Co), reshapes to (T, k/u groups, u, Co)
and overlap-adds the ceil(k/u) contributing groups — pure matmul work on
the MXU, no zeros. This script checks numerics vs lax and benches both on
the real device at the four generator stages.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def tconv_lax(x, w, stride, padding):
    # w: torch layout (Ci, Co, K)
    k = w.shape[-1]
    kernel = jnp.flip(jnp.transpose(w, (2, 0, 1)), axis=0)
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x, kernel, (1,), [(pad, pad)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def tconv_matmul(x, w, stride, padding):
    """x (B,T,Ci), w (Ci,Co,K) -> (B, T*stride - 2*padding + K - stride, Co)
    via matmul + overlap-add. Requires K % stride == 0 (true for HiFi-GAN:
    16/8, 4/2)."""
    b, t, ci = x.shape
    _, co, k = w.shape
    assert k % stride == 0
    g = k // stride  # overlapping groups
    # W' maps Ci -> (K, Co); tap j of input position t lands at output
    # t*stride + j - padding.
    wm = jnp.transpose(w, (0, 2, 1)).reshape(ci, k * co)  # (Ci, K*Co)
    y = jnp.einsum("btc,cf->btf", x, wm,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(b, t, g, stride, co)
    # overlap-add: group j of input t contributes to output block t + j.
    out_t = (t + g - 1) * stride
    acc = jnp.zeros((b, out_t, co), x.dtype)
    for j in range(g):
        acc = acc.at[:, j * stride : j * stride + t * stride].add(
            y[:, :, j].reshape(b, t * stride, co)
        )
    return acc[:, padding : out_t - padding]


def fence(v):
    return float(jnp.sum(v[..., ::997]))


def bench(fn, args, n=10):
    @jax.jit
    def chain(*a):
        def body(c, _):
            out = fn(a[0] + (1e-12 * c).astype(a[0].dtype), *a[1:])
            s = jnp.sum(out[..., ::997])
            return s, s

        _, ss = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return jnp.sum(ss)

    float(chain(*args))
    t0 = time.perf_counter()
    float(chain(*args))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.RandomState(0)
    # generator stages: (Ci, Co, k, u, T_in) at batch 16 x 384 mel frames
    stages = [
        (512, 256, 16, 8, 384),
        (256, 128, 16, 8, 3072),
        (128, 64, 4, 2, 24576),
        (64, 32, 4, 2, 49152),
    ]
    b = 16
    for ci, co, k, u, t in stages:
        x = jnp.asarray(rng.randn(b, t, ci), jnp.float32)
        w = jnp.asarray(0.01 * rng.randn(ci, co, k), jnp.float32)
        pad = (k - u) // 2
        ref = tconv_lax(x[:1, :64], w, u, pad)
        got = tconv_matmul(x[:1, :64], w, u, pad)
        err = float(jnp.max(jnp.abs(ref - got)))
        t_lax = bench(lambda xx, ww: tconv_lax(xx, ww, u, pad), (x, w))
        t_mm = bench(lambda xx, ww: tconv_matmul(xx, ww, u, pad), (x, w))
        print(json.dumps({
            "stage": f"{ci}->{co} k{k} u{u} T{t}",
            "max_err": err,
            "lax_ms": round(t_lax * 1e3, 3),
            "matmul_ms": round(t_mm * 1e3, 3),
            "speedup": round(t_lax / t_mm, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
