"""End-to-end synthesis benchmark: audio-seconds generated per second per chip.

Runs the flagship inference path (PromptTTS AM -> HiFi-GAN vocoder) at
production shapes on the available device and reports one JSON line:
  {"metric": "audio_seconds_per_second_per_chip", "value": N,
   "unit": "xRT", "vs_baseline": N/10}
vs_baseline is relative to the 10x-real-time-per-chip target from
BASELINE.md (the reference publishes no numbers of its own).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.models.jets import JETSGenerator

    cfg = EmotiVoiceConfig()
    # bfloat16 compute (params f32, f32 accumulation, f32 waveform out):
    # +22% over f32 on v5e. Lowering history: the whole-stage fused Pallas
    # kernel was the r4 default (2051 -> 2274 xRT over plain s2d then), but
    # with the r4 relayout-free packed flow the pure-s2d lowering overtook
    # it end-to-end (r5 A/B: s2d 2444/2440 xRT vs fused 2320/2324, two
    # runs each) — s2d is now the default, matching SynthesisEngine.
    # BENCH_FUSED=on re-enables the fused kernel for A/B.
    import os

    use_fused = (
        jax.default_backend() == "tpu"
        and os.environ.get("BENCH_FUSED", "auto") == "on"
    )
    model = JETSGenerator(
        cfg, compute_dtype=jnp.bfloat16, use_fused_stage=use_fused
    )

    # Production-ish bucket: batch 16 utterances, 384 mel frames each
    # (~6.1 s of audio per utterance at 16 kHz / hop 256); throughput
    # saturates at b>=16 (b=32 is within noise of b=16).
    b, t_text, max_frames = 16, 96, 384
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.am.n_vocab, (b, t_text)), jnp.int32)
    text_lengths = jnp.full((b,), t_text, jnp.int32)
    speaker = jnp.asarray(rng.randint(0, cfg.am.n_speaker, (b,)), jnp.int32)
    style = jnp.asarray(rng.randn(b, cfg.am.bert_embedding), jnp.float32)
    content = jnp.asarray(rng.randn(b, cfg.am.bert_embedding), jnp.float32)

    params = JETSGenerator(cfg).init(
        jax.random.PRNGKey(0), tokens, text_lengths, speaker, style, content,
        max_frames=max_frames,
    )

    @jax.jit
    def synthesize(params, tokens, text_lengths, speaker, style, content):
        out = model.apply(
            params, tokens, text_lengths, speaker, style, content,
            max_frames=max_frames,
        )
        wav = out["wav_predictions"]
        # tiny reduction used as an execution fence (scalar D2H transfer):
        # block_until_ready through a remote-device tunnel does not
        # guarantee remote execution completed
        return wav, out["output_lengths"], jnp.sum(wav[..., ::997])

    args = (params, tokens, text_lengths, speaker, style, content)
    wav, lens, fence = synthesize(*args)
    float(fence)  # compile + warmup

    # All iterations run inside ONE dispatch (lax.scan with a coupling
    # carry serializes them), then a single scalar transfer fences; this
    # amortizes the device-tunnel round trip out of the per-call time while
    # still guaranteeing every pass actually executed.
    n_iters = 20
    tokens_stack = jnp.asarray(
        np.random.RandomState(1).randint(
            0, cfg.am.n_vocab, (n_iters, b, t_text)
        ),
        jnp.int32,
    )

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

    chain_args = (params, tokens_stack, text_lengths, speaker, style, content)
    float(run_chain(*chain_args))  # compile the chain
    start = time.perf_counter()
    float(run_chain(*chain_args))
    elapsed = time.perf_counter() - start

    sr = cfg.audio.sampling_rate
    # Count the full padded waveform actually generated per call.
    audio_seconds = b * max_frames * cfg.vocoder.upsample_factor / sr * n_iters
    xrt = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_second_per_chip",
                "value": round(xrt, 2),
                "unit": "xRT",
                "vs_baseline": round(xrt / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
