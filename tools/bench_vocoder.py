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

    # distinct input per iteration: rules out any caching/memoization in the
    # device-tunnel path and keeps the queue honest
    mels = [
        jnp.asarray(
            np.random.RandomState(i).randn(args.batch, args.frames, 80),
            jnp.float32,
        )
        for i in range(args.iters)
    ]
    mel = mels[0]
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
            y = gen.apply(p, m)
            # tiny reduction: fencing on this scalar forces the whole
            # computation without paying a full-waveform D2H transfer
            return y, jnp.sum(y[..., ::997])

        @jax.jit
        def run_chain(p, m0):
            # iters sequential vocoder passes in ONE dispatch: lax.scan
            # serializes them (the carry couples consecutive iterations),
            # amortizing the device-tunnel round trip out of the timing
            def body(carry, _):
                y = gen.apply(p, carry)
                s = jnp.sum(y[..., ::997])
                m_next = m0 + (1e-12 * s).astype(m0.dtype)
                return m_next, s

            _, ss = jax.lax.scan(body, m0, None, length=args.iters)
            return jnp.sum(ss)

        m_iter = [m.astype(dtype) for m in mels]
        try:
            out, fence = run(p_cast, m_cast)
            float(fence)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        # Fence via a scalar D2H transfer: through a remote-device tunnel,
        # block_until_ready does NOT guarantee remote execution finished
        # (observed >peak-FLOP "throughput"). The chained variant runs all
        # iterations inside one dispatch so the tunnel round trip is
        # amortized; one fenced warmup call measures that overhead.
        t0 = time.perf_counter()
        float(run(p_cast, m_iter[0])[1])
        rtt = time.perf_counter() - t0  # single-call incl. round trip
        float(run_chain(p_cast, m_iter[0]))  # compile the chain
        t0 = time.perf_counter()
        float(run_chain(p_cast, m_iter[0]))
        dt = (time.perf_counter() - t0) / args.iters
        xrt = audio_s / dt
        out, _ = run(p_cast, m_iter[0])
        out_f32 = np.asarray(out, np.float32)
        if name == "xla_f32":
            ref_out = out_f32
            err = 0.0
        else:
            err = float(np.abs(out_f32 - ref_out).max()) if ref_out is not None else -1
        results[name] = xrt
        print(f"{name:12s}: {dt*1e3:8.2f} ms/call  {xrt:9.1f} xRT  "
              f"(single-call incl. RTT {rtt*1e3:.1f} ms)  max|err|={err:.2e}")

    if results:
        best = max(results, key=results.get)
        print(f"best: {best} at {results[best]:.1f} xRT")


if __name__ == "__main__":
    main()
