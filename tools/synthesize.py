#!/usr/bin/env python
"""Batch synthesis CLI.

Counterpart of reference `inference_am_vocoder_joint.py`: reads lines of
`speaker|prompt|phonemes|content`, synthesizes each with the JETS model, and
writes int16 wavs. Unlike the reference's batch=1 Python loop, lines are
grouped into bucketed batches and synthesized data-parallel on the device.

Usage:
  python tools/synthesize.py --checkpoint <g_ckpt.pt|orbax_dir> \
      --style-encoder <checkpoint_163431> --tokenlist <tokenlist> \
      --test-file <text file> --output-dir outputs/
Without --checkpoint the model runs randomly initialized (smoke mode).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                   help="compute dtype (bf16 = faster TPU inference)")
    p.add_argument("--use-pallas", action="store_true",
                   help="fused Pallas MRF vocoder kernels (TPU only)")
    p.add_argument("--style-encoder", default=None)
    p.add_argument("--tokenlist", default=None)
    p.add_argument("--test-file", required=True)
    p.add_argument("--output-dir", default="outputs/test_audio")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--jax-cache", default="",
                   help="persistent XLA compile-cache dir (default "
                        "~/.cache/emotivoice_tpu/jax; 'off' disables)")
    args = p.parse_args()

    import jax

    if args.jax_cache != "off":
        from emotivoice_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache(args.jax_cache or None)

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.frontend.tokens import TokenVocab
    from emotivoice_tpu.models.jets import JETSGenerator
    from emotivoice_tpu.serving.engine import SynthesisEngine, SynthesisRequest
    from emotivoice_tpu.utils.audio_io import write_wav

    cfg = EmotiVoiceConfig()
    vocab = (
        TokenVocab.from_file(args.tokenlist) if args.tokenlist else TokenVocab.default()
    )
    cfg = cfg.replace(am=cfg.am.__class__(**{**cfg.am.__dict__, "n_vocab": len(vocab)}))

    if args.checkpoint:
        from emotivoice_tpu.convert.from_torch import (
            convert_jets_generator,
            load_torch_checkpoint,
        )

        params = {"params": convert_jets_generator(
            load_torch_checkpoint(args.checkpoint), cfg
        )}
    else:
        print("WARNING: no checkpoint given; using random init (smoke mode)")
        model = JETSGenerator(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 8), np.int32),
            np.asarray([8], np.int32),
            np.zeros((1,), np.int32),
            np.zeros((1, cfg.am.bert_embedding), np.float32),
            np.zeros((1, cfg.am.bert_embedding), np.float32),
            max_frames=64,
        )

    if args.style_encoder:
        from emotivoice_tpu.serving.style import StyleEmbedder

        embed = StyleEmbedder.from_checkpoint(args.style_encoder, cfg.bert)
        embed_fn = embed.embed
    else:
        print("WARNING: no style encoder; using zero embeddings")
        embed_fn = lambda text: np.zeros(cfg.am.bert_embedding, np.float32)

    import jax.numpy as jnp

    engine = SynthesisEngine(
        cfg, params, vocab,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        use_pallas=args.use_pallas,
    )
    os.makedirs(args.output_dir, exist_ok=True)

    requests, names = [], []
    with open(args.test_file, encoding="utf-8") as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            speaker, prompt, phonemes, content = line.split("|")
            requests.append(
                SynthesisRequest(
                    phonemes=phonemes.split(),
                    speaker_id=int(speaker) if speaker.isdigit() else 0,
                    style_embedding=embed_fn(prompt),
                    content_embedding=embed_fn(content),
                    alpha=args.alpha,
                )
            )
            names.append(f"{i:04d}_{speaker}")

    for start in range(0, len(requests), args.batch_size):
        chunk = requests[start : start + args.batch_size]
        results = engine.synthesize_batch(chunk)
        for name, res in zip(names[start : start + args.batch_size], results):
            out = os.path.join(args.output_dir, f"{name}.wav")
            write_wav(out, res.wav, cfg.audio.sampling_rate)
            print(f"wrote {out} ({len(res.wav) / cfg.audio.sampling_rate:.2f}s)")


if __name__ == "__main__":
    main()
