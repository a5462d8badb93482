#!/usr/bin/env python
"""Measured reference baseline: the ORIGINAL torch HiFi-GAN vocoder
(imported read-only from /root/reference) timed on this host's CPU, next to
this repo's JAX implementation on the same CPU, at the bench.py production
shape (batch 16 x 384 mel frames -> 98.3 s of 16 kHz audio per pass).

BASELINE.md requires a measured PyTorch comparison row because the
reference publishes no numbers. The vocoder is the dominant inference cost
(~28.7 GMAC per audio-second, SURVEY.md §6), so this is the honest
same-host head-to-head; the TPU number comes from bench.py.

Prints one JSON line per row.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)


def bench_torch_reference(b, frames, n_iters):
    import types

    import numpy as np
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.hifigan.models import Generator  # reference module

    h = types.SimpleNamespace(
        resblock="1",
        upsample_rates=[8, 8, 2, 2],
        upsample_kernel_sizes=[16, 16, 4, 4],
        initial_channel=80,
        upsample_initial_channel=512,
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    )
    torch.manual_seed(0)
    gen = Generator(h).eval()
    # reference folds weight norm at inference (remove_weight_norm); this
    # torch version registers parametrizations, so fold via the new API
    from torch.nn.utils import parametrize

    for m in gen.modules():
        if parametrize.is_parametrized(m, "weight"):
            parametrize.remove_parametrizations(m, "weight")
    mel = torch.randn(b, 80, frames)
    with torch.no_grad():
        gen(mel)  # warmup
        start = time.perf_counter()
        for _ in range(n_iters):
            gen(mel)
        elapsed = time.perf_counter() - start
    return elapsed


def bench_jax_cpu(b, frames, n_iters):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.models.hifigan import HiFiGANGenerator

    cfg = EmotiVoiceConfig()
    model = HiFiGANGenerator(cfg.vocoder)
    mel = jnp.asarray(np.random.RandomState(0).randn(b, frames, 80), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel)

    @jax.jit
    def f(params, mel):
        return model.apply(params, mel)

    f(params, mel).block_until_ready()  # local CPU: block fences fine
    start = time.perf_counter()
    for _ in range(n_iters):
        f(params, mel).block_until_ready()
    return time.perf_counter() - start


def main():
    b, frames, n_iters = 4, 256, 3
    audio_seconds = b * frames * 256 / 16000 * n_iters

    t_ref = bench_torch_reference(b, frames, n_iters)
    print(json.dumps({
        "row": "reference_hifigan_torch_cpu",
        "xrt": round(audio_seconds / t_ref, 2),
        "elapsed_s": round(t_ref, 2),
    }), flush=True)

    t_jax = bench_jax_cpu(b, frames, n_iters)
    print(json.dumps({
        "row": "ours_hifigan_jax_cpu",
        "xrt": round(audio_seconds / t_jax, 2),
        "elapsed_s": round(t_jax, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
