#!/usr/bin/env python
"""Variant matrix for the headline synthesis benchmark.

Times the flagship inference path (bench.py shapes) across
{f32, bf16} x {XLA, Pallas-MRF} and prints one JSON line per variant.
Used to pick bench.py's default configuration on real hardware.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def run_variant(cfg, params, model, batch, max_frames, n_iters=20):
    tokens_stack, text_lengths, speaker, style, content = batch

    @jax.jit
    def run_chain(params, tokens_stack, text_lengths, speaker, style, content):
        def body(carry, tok):
            out = model.apply(
                params, tok, text_lengths, speaker,
                style + (1e-12 * carry).astype(style.dtype), content,
                max_frames=max_frames,
            )
            s = jnp.sum(out["wav_predictions"][..., ::997])
            return s, s

        _, ss = jax.lax.scan(body, jnp.float32(0), tokens_stack)
        return jnp.sum(ss)

    args = (params, tokens_stack, text_lengths, speaker, style, content)
    t0 = time.perf_counter()
    float(run_chain(*args))  # compile + warmup
    compile_s = time.perf_counter() - t0
    start = time.perf_counter()
    float(run_chain(*args))
    elapsed = time.perf_counter() - start
    return elapsed, compile_s


def main():
    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.models.jets import JETSGenerator

    cfg = EmotiVoiceConfig()
    b, t_text, max_frames, n_iters = 8, 96, 384, 20
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.am.n_vocab, (b, t_text)), jnp.int32)
    text_lengths = jnp.full((b,), t_text, jnp.int32)
    speaker = jnp.asarray(rng.randint(0, cfg.am.n_speaker, (b,)), jnp.int32)
    style = jnp.asarray(rng.randn(b, cfg.am.bert_embedding), jnp.float32)
    content = jnp.asarray(rng.randn(b, cfg.am.bert_embedding), jnp.float32)
    tokens_stack = jnp.asarray(
        np.random.RandomState(1).randint(0, cfg.am.n_vocab, (n_iters, b, t_text)),
        jnp.int32,
    )
    batch = (tokens_stack, text_lengths, speaker, style, content)

    base = JETSGenerator(cfg)
    params = base.init(
        jax.random.PRNGKey(0), tokens, text_lengths, speaker, style, content,
        max_frames=max_frames,
    )

    sr = cfg.audio.sampling_rate
    audio_seconds = b * max_frames * cfg.vocoder.upsample_factor / sr * n_iters

    variants = [
        ("f32_xla", None, False),
        ("bf16_xla", jnp.bfloat16, False),
        ("f32_pallas", None, True),
        ("bf16_pallas", jnp.bfloat16, True),
    ]
    for name, dtype, use_pallas in variants:
        model = JETSGenerator(cfg, compute_dtype=dtype, use_pallas=use_pallas)
        try:
            elapsed, compile_s = run_variant(
                cfg, params, model, batch, max_frames, n_iters
            )
            print(json.dumps({
                "variant": name,
                "xrt": round(audio_seconds / elapsed, 2),
                "elapsed_s": round(elapsed, 3),
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
