#!/usr/bin/env python
"""Joint GAN training-step throughput benchmark (single chip).

Times the full jitted D-then-G train step (PromptTTS + HiFi-GAN + 8
discriminator towers + on-device alignment) at production shapes and prints
one JSON line: steps/s, utterances/s, and mel-frames/s. All iterations run
inside one `lax.scan` dispatch and are fenced by a scalar transfer derived
from the final state (block_until_ready does not fence the remote tunnel —
see .claude/skills/verify/SKILL.md).

Reference counterpart: the per-batch wall-clock `s/b=` print in
`train_am_vocoder_joint.py:317` (torch DDP); there is no published number to
compare against (BASELINE.md), so this records ours.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--text-len", type=int, default=96)
    p.add_argument("--mel-frames", type=int, default=384)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--jax-cache", default="",
                   help="persistent XLA compile-cache dir (default "
                        "~/.cache/emotivoice_tpu/jax; 'off' disables)")
    args = p.parse_args()

    if args.jax_cache != "off":
        from emotivoice_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache(args.jax_cache or None)

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.training.step import init_train_state, make_train_step

    cfg = EmotiVoiceConfig()
    b, t_text, t_feats = args.batch_size, args.text_len, args.mel_frames
    up = cfg.vocoder.upsample_factor
    rng = np.random.RandomState(0)
    batch = {
        "tokens": jnp.asarray(
            rng.randint(0, cfg.am.n_vocab, (b, t_text)), jnp.int32
        ),
        "text_lengths": jnp.full((b,), t_text, jnp.int32),
        "speaker": jnp.asarray(rng.randint(0, cfg.am.n_speaker, (b,)), jnp.int32),
        "style_embedding": jnp.asarray(
            rng.randn(b, cfg.am.bert_embedding), jnp.float32
        ),
        "content_embedding": jnp.asarray(
            rng.randn(b, cfg.am.bert_embedding), jnp.float32
        ),
        "mel": jnp.asarray(rng.randn(b, t_feats, cfg.am.n_mels), jnp.float32),
        "mel_lengths": jnp.full((b,), t_feats, jnp.int32),
        "pitch": jnp.asarray(rng.randn(b, t_feats), jnp.float32),
        "energy": jnp.asarray(rng.randn(b, t_feats), jnp.float32),
        "wav": jnp.asarray(0.1 * rng.randn(b, t_feats * up), jnp.float32),
    }

    state, model, disc = init_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, model, disc)

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chain(state, batch, n):
        def body(s, _):
            s, metrics = step(s, batch)
            return s, metrics["g_loss"]

        state, losses = jax.lax.scan(body, state, None, length=n)
        return state, jnp.sum(losses)

    # compile + warmup (one step, then the chain)
    st, fence = run_chain(state, batch, args.iters)
    float(fence)
    start = time.perf_counter()
    st, fence = run_chain(state, batch, args.iters)
    float(fence)
    elapsed = time.perf_counter() - start

    steps_per_s = args.iters / elapsed
    frames_per_s = steps_per_s * b * t_feats
    print(
        json.dumps(
            {
                "metric": "train_steps_per_second",
                "value": round(steps_per_s, 3),
                "unit": "steps/s",
                "batch_size": b,
                "utterances_per_s": round(steps_per_s * b, 1),
                "mel_frames_per_s": round(frames_per_s, 0),
                "audio_seconds_per_s": round(
                    frames_per_s * cfg.audio.hop_length / cfg.audio.sampling_rate,
                    1,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
