#!/usr/bin/env python
"""Experiment: lane-packed dilated conv for the small-channel vocoder stages.

The late HiFi-GAN stages (C=32/64) fill only 25-50 % of the 128 MXU lanes
under XLA's conv lowering (docs/PERFORMANCE.md). Reformulation: compute k
consecutive output timesteps per matmul row so the output dim becomes
k*C = 128 full lanes. The weight becomes a dense block-Toeplitz matrix
(span*C, k*C) with span = (K-1)*dilation + k input taps per row — a FLOP
overhead of span/(k*K) per output against a k-fold lane-utilization gain.

This script checks numerics vs lax.conv and benches both per resblock
shape on the real device; winners get wired into WNConv1d per shape, like
the transposed-conv matmul lowering was.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from emotivoice_tpu.ops.packed_conv import packed_dilated_conv


def conv_lax(x, w_hio, dilation):
    k = w_hio.shape[0]
    pad = (k - 1) // 2 * dilation
    return jax.lax.conv_general_dilated(
        x, w_hio, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def bench(fn, args, n=10):
    @jax.jit
    def chain(*a):
        def body(c, _):
            out = fn(a[0] + (1e-12 * c).astype(a[0].dtype), *a[1:])
            s = jnp.sum(out[..., ::997].astype(jnp.float32))
            return s, s

        _, ss = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return jnp.sum(ss)

    float(chain(*args))
    t0 = time.perf_counter()
    float(chain(*args))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.RandomState(0)
    b = 16
    # (T, C) per generator stage at batch 16 x 384 mel frames; kernel x
    # dilation pairs from the MRF (K 3/7/11, d 1/3/5 + the d=1 second convs).
    cases = []
    for t, c in ((24576, 128), (49152, 64), (98304, 32)):
        for kk in (3, 7, 11):
            for d in (1, 3, 5):
                cases.append((t, c, kk, d))
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    for t, c, kk, d in cases:
        pack = max(128 // c, 1)
        x = jnp.asarray(rng.randn(b, t, c), dtype)
        w = jnp.asarray(0.05 * rng.randn(kk, c, c), dtype)
        ref = conv_lax(x[:1, : 4 * 128], w, d)
        got = packed_dilated_conv(x[:1, : 4 * 128], w, d, pack)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        t_lax = bench(lambda xx, ww: conv_lax(xx, ww, d), (x, w))
        t_pk = bench(
            lambda xx, ww: packed_dilated_conv(xx, ww, d, pack), (x, w)
        )
        print(json.dumps({
            "shape": f"T{t} C{c} K{kk} d{d} pack{pack}",
            "max_err": round(err, 6),
            "lax_ms": round(t_lax * 1e3, 3),
            "packed_ms": round(t_pk * 1e3, 3),
            "speedup": round(t_lax / t_pk, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
