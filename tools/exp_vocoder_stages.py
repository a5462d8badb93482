#!/usr/bin/env python
"""Per-upsample-level timing of the HiFi-GAN generator.

Times prefixes of the generator (conv_pre; +stage1; ...; full incl.
conv_post) under one identical scan-fenced harness; consecutive
differences attribute time to each level. This pins down where the ~80 ms
vocoder call actually goes before any optimization is attempted
(docs/PERFORMANCE.md roadmap).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=384)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    p.add_argument("--s2d", choices=["on", "off"], default="on")
    p.add_argument("--fused", choices=["on", "off"], default="off",
                   help="whole-stage fused Pallas MRF kernel (TPU only)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.models.hifigan import HiFiGANGenerator
    from emotivoice_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = EmotiVoiceConfig()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    gen = HiFiGANGenerator(
        cfg.vocoder, dtype=dtype, use_s2d=args.s2d == "on",
        use_fused_stage=args.fused == "on",
    )
    rng = np.random.RandomState(0)
    mel = jnp.asarray(
        rng.randn(args.batch, args.frames, cfg.vocoder.initial_channel),
        jnp.float32,
    )
    params = gen.init(jax.random.PRNGKey(0), mel)

    def timed(stages, n=args.iters):
        @jax.jit
        def chain(params, mel):
            def body(c, _):
                m = mel + (1e-12 * c).astype(mel.dtype)
                out = gen.apply(params, m, stages=stages)
                s = jnp.sum(out[..., ::997].astype(jnp.float32))
                return s, s

            _, ss = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return jnp.sum(ss)

        float(chain(params, mel))  # compile
        t0 = time.perf_counter()
        float(chain(params, mel))
        return (time.perf_counter() - t0) / n

    names = ["conv_pre", "stage1 512->256", "stage2 256->128",
             "stage3 128->64", "stage4 64->32", "full (+conv_post+tanh)"]
    times = [timed(s) for s in (0, 1, 2, 3, 4, None)]
    prev = 0.0
    for name, t in zip(names, times):
        print(json.dumps({
            "prefix": name,
            "cum_ms": round(t * 1e3, 2),
            "delta_ms": round((t - prev) * 1e3, 2),
        }), flush=True)
        prev = t


if __name__ == "__main__":
    main()
