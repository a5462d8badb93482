#!/usr/bin/env python
"""Vocoder kernel benchmark: XLA vs fused-Pallas, f32 vs bf16, on the
current device. Prints per-config audio-seconds/sec and per-stage timings.

Run on TPU:  python tools/bench_vocoder.py [--frames 384] [--batch 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=384)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.models.hifigan import HiFiGANGenerator

    cfg = EmotiVoiceConfig()
    platform = jax.devices()[0].platform
    print(f"device: {jax.devices()[0]} ({platform})")

    mel = jnp.asarray(
        np.random.RandomState(0).randn(args.batch, args.frames, 80), jnp.float32
    )
    gen_ref = HiFiGANGenerator(cfg.vocoder, use_pallas=False)
    params = gen_ref.init(jax.random.PRNGKey(0), mel)
    sr = cfg.audio.sampling_rate
    audio_s = args.batch * args.frames * cfg.vocoder.upsample_factor / sr

    results = {}
    configs = [("xla_f32", False, jnp.float32), ("xla_bf16", False, jnp.bfloat16)]
    if platform == "tpu":
        configs += [("pallas_f32", True, jnp.float32),
                    ("pallas_bf16", True, jnp.bfloat16)]

    ref_out = None
    for name, use_pallas, dtype in configs:
        gen = HiFiGANGenerator(cfg.vocoder, use_pallas=use_pallas)
        p_cast = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
        m_cast = mel.astype(dtype)

        @jax.jit
        def run(p, m):
            return gen.apply(p, m)

        try:
            out = run(p_cast, m_cast)
            jax.block_until_ready(out)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(p_cast, m_cast)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        xrt = audio_s / dt
        out_f32 = np.asarray(out, np.float32)
        if name == "xla_f32":
            ref_out = out_f32
            err = 0.0
        else:
            err = float(np.abs(out_f32 - ref_out).max()) if ref_out is not None else -1
        results[name] = xrt
        print(f"{name:12s}: {dt*1e3:8.2f} ms/call  {xrt:9.1f} xRT  "
              f"max|err|={err:.2e}")

    if results:
        best = max(results, key=results.get)
        print(f"best: {best} at {results[best]:.1f} xRT")


if __name__ == "__main__":
    main()
