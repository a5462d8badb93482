#!/usr/bin/env python
"""Measure space-to-depth conv vs stock lax conv at HiFi-GAN late-stage
shapes (see ops/s2d_conv.py). Winners gate wiring into the generator."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from emotivoice_tpu.ops.s2d_conv import s2d_conv
from emotivoice_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


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
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    # (T, C, pack factors to try)
    layers = [(49152, 64, (2, 4)), (98304, 32, (4, 8))]
    for t, c, packs in layers:
        for kk, d in ((3, 1), (7, 1), (11, 1), (3, 3), (7, 3), (11, 3),
                      (3, 5), (7, 5), (11, 5)):
            x = jnp.asarray(rng.randn(b, t, c), dtype)
            w = jnp.asarray(0.05 * rng.randn(kk, c, c), dtype)
            row = {"shape": f"T{t} C{c} K{kk} d{d}"}
            t_lax = bench(lambda xx, ww: conv_lax(xx, ww, d), (x, w))
            row["lax_ms"] = round(t_lax * 1e3, 3)
            for s in packs:
                ts = bench(
                    lambda xx, ww, s=s: s2d_conv(xx, ww, d, s), (x, w)
                )
                row[f"s2d{s}_ms"] = round(ts * 1e3, 3)
                row[f"s2d{s}_speedup"] = round(t_lax / ts, 2)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
