#!/usr/bin/env python
"""Measure the fused Pallas MRF-stage kernel vs the XLA lowerings on device.

Production stage shapes (batch 16 x 384 mel frames):
  stage3: T=49152, C=64  (s=2 packed)
  stage4: T=98304, C=32  (s=4 packed)
  stage2: T=24576, C=128 (s=1)

Compares, per stage, ms/call under the honest scan-fenced harness:
  stock    — lax.conv MRF on unpacked (B, T, C)
  s2d      — dense-packed conv MRF (current default, ops/s2d_conv.py)
  fused    — Pallas fused whole-stage kernel (ops/pallas/packed_stage.py)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

KERNELS = (3, 7, 11)
DILS = ((1, 3, 5),) * 3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=384)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    p.add_argument("--blocks", type=int, nargs="*", default=[256, 512, 1024])
    p.add_argument("--stages", nargs="*", default=["stage3", "stage4"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from emotivoice_tpu.ops.pallas.packed_stage import (
        fused_mrf_stage, mrf_stage_reference,
    )
    from emotivoice_tpu.ops.s2d_conv import s2d_conv_packed
    from emotivoice_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    shapes = {
        "stage2": (args.frames * 64, 128, 1),
        "stage3": (args.frames * 128, 64, 2),
        "stage4": (args.frames * 256, 32, 4),
    }

    def mk_weights(rng, c):
        weights = []
        for k, dils in zip(KERNELS, DILS):
            units = []
            for _ in dils:
                units.append(tuple(
                    jnp.asarray(a.astype(np.float32)) for a in (
                        rng.randn(k, c, c) * 0.04, rng.randn(c) * 0.02,
                        rng.randn(k, c, c) * 0.04, rng.randn(c) * 0.02,
                    )
                ))
            weights.append(tuple(units))
        return tuple(weights)

    def lrelu(v):
        return jnp.maximum(v, v * 0.1)

    def s2d_mrf(xp, weights, s):
        acc = None
        for (k, dils), units in zip(zip(KERNELS, DILS), weights):
            xk = xp
            for d, (w1, b1, w2, b2) in zip(dils, units):
                xt = s2d_conv_packed(lrelu(xk), w1.astype(xk.dtype), d, s)
                xt = xt + jnp.tile(b1.astype(xk.dtype), s)
                xt = s2d_conv_packed(lrelu(xt), w2.astype(xk.dtype), 1, s)
                xt = xt + jnp.tile(b2.astype(xk.dtype), s)
                xk = xk + xt
            acc = xk if acc is None else acc + xk
        return acc / len(KERNELS)

    def timed(fn, *fargs, n=args.iters):
        @jax.jit
        def chain(*a):
            def body(carry, _):
                out = fn(a[0] + (1e-6 * carry).astype(a[0].dtype), *a[1:])
                ssum = jnp.sum(out[:, ::499].astype(jnp.float32))
                return ssum, ssum
            _, ss = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return jnp.sum(ss)

        float(chain(*fargs))
        t0 = time.perf_counter()
        float(chain(*fargs))
        return (time.perf_counter() - t0) / n * 1e3

    rng = np.random.RandomState(0)
    for name in args.stages:
        t, c, s = shapes[name]
        weights = mk_weights(rng, c)
        x = jnp.asarray(
            rng.randn(args.batch, t, c).astype(np.float32), dtype
        )
        xp = x.reshape(args.batch, t // s, s * c)

        row = {"stage": name, "T": t, "C": c, "s": s}
        print(f"# {name}: timing stock...", file=sys.stderr, flush=True)
        row["stock_ms"] = round(timed(
            lambda v: mrf_stage_reference(v, weights, KERNELS, DILS), x), 2)
        print(f"# {name}: stock={row['stock_ms']}ms; timing s2d...",
              file=sys.stderr, flush=True)
        if s > 1:
            row["s2d_ms"] = round(timed(
                lambda v: s2d_mrf(v, weights, s), xp), 2)
            print(f"# {name}: s2d={row['s2d_ms']}ms", file=sys.stderr,
                  flush=True)
        for br in args.blocks:
            for al in (False, True):
                tag = f"fused{br}" + ("a" if al else "")
                print(f"# {name}: timing {tag}...", file=sys.stderr,
                      flush=True)
                row[f"{tag}_ms"] = round(timed(
                    lambda v, _br=br, _al=al: fused_mrf_stage(
                        v, weights, s, KERNELS, DILS, block_rows=_br,
                        aligned=_al), xp), 2)
                print(f"# {name}: {tag}={row[f'{tag}_ms']}ms",
                      file=sys.stderr, flush=True)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
