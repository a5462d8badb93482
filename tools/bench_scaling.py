#!/usr/bin/env python
"""Data-parallel scaling-efficiency benchmark.

Measures synthesis throughput (audio-seconds/sec) on 1..N devices with the
batch sharded over the ('data',) mesh axis, and reports efficiency
throughput(N) / (N * throughput(1)). Target: >= 0.9 (BASELINE.md).

On a real TPU slice this measures ICI-scaled throughput; on CPU
(--force-cpu with XLA_FLAGS=--xla_force_host_platform_device_count=8) it
validates the sharded program end-to-end.
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
    p.add_argument("--frames", type=int, default=384)
    p.add_argument("--per-device-batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--force-cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.models.jets import JETSGenerator
    from emotivoice_tpu.parallel.mesh import make_mesh

    cfg = EmotiVoiceConfig()
    devices = jax.devices()
    print(f"{len(devices)} devices: {devices[0].platform}")
    model = JETSGenerator(cfg)

    t_text, max_frames = 96, args.frames
    sr = cfg.audio.sampling_rate
    up = cfg.vocoder.upsample_factor

    def make_batch(b):
        rng = np.random.RandomState(0)
        return (
            jnp.asarray(rng.randint(0, cfg.am.n_vocab, (b, t_text)), jnp.int32),
            jnp.full((b,), t_text, jnp.int32),
            jnp.asarray(rng.randint(0, cfg.am.n_speaker, (b,)), jnp.int32),
            jnp.asarray(rng.randn(b, cfg.am.bert_embedding), jnp.float32),
            jnp.asarray(rng.randn(b, cfg.am.bert_embedding), jnp.float32),
        )

    params = model.init(jax.random.PRNGKey(0), *make_batch(2), max_frames=64)

    results = {}
    n = 1
    sizes = []
    while n <= len(devices):
        sizes.append(n)
        n *= 2
    for n in sizes:
        mesh = make_mesh(devices[:n], model_parallel_size=1)
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(cfg.mesh.data_axis))

        @jax.jit
        def synth(p, *a):
            out = model.apply(p, *a, max_frames=max_frames)
            return out["wav_predictions"]

        b = args.per_device_batch * n
        batch = make_batch(b)
        with mesh:
            p_sh = jax.device_put(params, repl)
            batch_sh = tuple(jax.device_put(a, data) for a in batch)
            out = synth(p_sh, *batch_sh)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = synth(p_sh, *batch_sh)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters
        audio_s = b * max_frames * up / sr
        results[n] = audio_s / dt
        eff = results[n] / (n * results[1])
        print(f"n={n}: {results[n]:9.1f} audio-s/s  efficiency {eff:.3f}")

    print(json.dumps({
        "metric": "dp_scaling_efficiency",
        "value": round(results[sizes[-1]] / (sizes[-1] * results[1]), 4),
        "unit": "fraction",
        "throughputs": {str(k): round(v, 1) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
