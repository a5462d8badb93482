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
    model = JETSGenerator(cfg)

    # Production-ish bucket: batch 8 utterances, 384 mel frames each
    # (~6.1 s of audio per utterance at 16 kHz / hop 256).
    b, t_text, max_frames = 8, 96, 384
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.am.n_vocab, (b, t_text)), jnp.int32)
    text_lengths = jnp.full((b,), t_text, jnp.int32)
    speaker = jnp.asarray(rng.randint(0, cfg.am.n_speaker, (b,)), jnp.int32)
    style = jnp.asarray(rng.randn(b, cfg.am.bert_embedding), jnp.float32)
    content = jnp.asarray(rng.randn(b, cfg.am.bert_embedding), jnp.float32)

    params = model.init(
        jax.random.PRNGKey(0), tokens, text_lengths, speaker, style, content,
        max_frames=max_frames,
    )

    @jax.jit
    def synthesize(params, tokens, text_lengths, speaker, style, content):
        out = model.apply(
            params, tokens, text_lengths, speaker, style, content,
            max_frames=max_frames,
        )
        return out["wav_predictions"], out["output_lengths"]

    args = (params, tokens, text_lengths, speaker, style, content)
    wav, lens = synthesize(*args)
    jax.block_until_ready(wav)  # compile + warmup

    n_iters = 20
    start = time.perf_counter()
    for _ in range(n_iters):
        wav, lens = synthesize(*args)
    jax.block_until_ready(wav)
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
