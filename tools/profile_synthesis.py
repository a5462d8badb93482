#!/usr/bin/env python
"""Profiling harness: jax.profiler trace + per-stage timing of the
synthesis path.

The reference has no profiling support at all (SURVEY §5 — only wall-clock
per-batch prints, train_am_vocoder_joint.py:317). This tool captures an XLA
trace viewable in TensorBoard/Perfetto and reports per-stage wall times
with block_until_ready fencing.

Usage:
  python tools/profile_synthesis.py --trace-dir /tmp/jax-trace \
      [--frames 384] [--batch 8] [--iters 5]
Then: tensorboard --logdir /tmp/jax-trace  (or load in ui.perfetto.dev)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default="/tmp/jax-trace")
    p.add_argument("--frames", type=int, default=384)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--text-len", type=int, default=96)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                   help="compute dtype (bf16 = the TPU serving default)")
    p.add_argument("--fused", choices=["on", "off"], default="off",
                   help="fused Pallas MRF stages (the TPU serving default)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.models.acoustic import PromptTTS
    from emotivoice_tpu.models.hifigan import HiFiGANGenerator
    from emotivoice_tpu.models.jets import JETSGenerator

    cfg = EmotiVoiceConfig()
    dev = jax.devices()[0]
    compute = jnp.bfloat16 if args.dtype == "bf16" else None
    fused = args.fused == "on"
    print(f"device: {dev} dtype={args.dtype} fused={args.fused}")

    b, t_text, max_frames = args.batch, args.text_len, args.frames
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.am.n_vocab, (b, t_text)), jnp.int32)
    text_lengths = jnp.full((b,), t_text, jnp.int32)
    speaker = jnp.asarray(rng.randint(0, cfg.am.n_speaker, (b,)), jnp.int32)
    style = jnp.asarray(rng.randn(b, cfg.am.bert_embedding), jnp.float32)
    content = jnp.asarray(rng.randn(b, cfg.am.bert_embedding), jnp.float32)
    mel = jnp.asarray(rng.randn(b, max_frames, cfg.am.n_mels), jnp.float32)

    model = JETSGenerator(
        cfg, compute_dtype=compute, use_fused_stage=fused
    )
    params = model.init(
        jax.random.PRNGKey(0), tokens, text_lengths, speaker, style, content,
        max_frames=max_frames,
    )

    # stage jits: AM alone, vocoder alone, full path
    am = PromptTTS(cfg.am, dtype=compute)
    am_params = {"params": params["params"]["am"]}
    voc = HiFiGANGenerator(cfg.vocoder, dtype=compute, use_fused_stage=fused)
    voc_params = {"params": params["params"]["generator"]}

    @jax.jit
    def run_am(p, *a):
        return am.apply(p, *a, max_frames=max_frames)["dec_outputs"]

    @jax.jit
    def run_voc(p, m):
        return voc.apply(p, m)

    @jax.jit
    def run_full(p, *a):
        return model.apply(p, *a, max_frames=max_frames)["wav_predictions"]

    am_args = (tokens, text_lengths, speaker, style, content)

    stages = {
        "acoustic_model": lambda: run_am(am_params, *am_args),
        "vocoder": lambda: run_voc(voc_params, mel),
        "full_path": lambda: run_full(params, *am_args),
    }

    # warmup/compile
    for name, fn in stages.items():
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        print(f"{name:16s} compile+first: {time.perf_counter()-t0:7.2f} s")

    # Honest timing: block_until_ready does NOT fence remote-tunnel
    # execution (see .claude/skills/verify/SKILL.md), so each stage runs as
    # one lax.scan chain fenced by a scalar device-to-host transfer.
    def chain(stage_fn, n):
        @jax.jit
        def run():
            def body(carry, _):
                out = stage_fn(carry)
                s = jnp.sum(out[..., ::997]) if out.ndim > 1 else jnp.sum(out)
                return carry + 1e-12 * s.astype(carry.dtype), s

            _, ss = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return jnp.sum(ss)

        float(run())  # compile
        t0 = time.perf_counter()
        float(run())
        return (time.perf_counter() - t0) / n

    chains = {
        "acoustic_model": lambda c: am.apply(
            am_params, tokens, text_lengths, speaker,
            style + c.astype(style.dtype)[None, None] * 1e-12, content,
            max_frames=max_frames)["dec_outputs"],
        "vocoder": lambda c: voc.apply(
            voc_params, mel + c.astype(mel.dtype) * 1e-12),
        "full_path": lambda c: model.apply(
            params, tokens, text_lengths, speaker,
            style + c.astype(style.dtype)[None, None] * 1e-12, content,
            max_frames=max_frames)["wav_predictions"],
    }
    audio_s = b * max_frames * cfg.vocoder.upsample_factor / cfg.audio.sampling_rate
    times = {}
    for name, fn in chains.items():
        dt = chain(fn, args.iters)
        times[name] = dt
        print(f"{name:16s} {dt*1e3:8.2f} ms/call  ({audio_s/dt:8.1f} xRT)")
    total = times.get("full_path")
    if total:
        for name in ("acoustic_model", "vocoder"):
            print(f"{name:16s} share of full path: "
                  f"{100.0 * times[name] / total:5.1f} %")

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(3):
            out = run_full(params, *am_args)
        jax.block_until_ready(out)
    print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
