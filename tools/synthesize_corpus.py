#!/usr/bin/env python
"""Bulk corpus synthesis CLI.

Counterpart of reference `inference_tts.py`: takes a plain text file, runs
the frontend inline, round-robins style prompts and speaker IDs across
lines (reference lines 98-101), skips already-rendered outputs (reference
lines 107-109), and writes wav + transcript pairs.

The reference shards the file across GPUs x threads with one full model
copy each (`inference_tts.py:178-220`, "4GB GPU memory per thread"); here a
single engine batches lines onto the device data-parallel, so throughput
scales with batch size instead of model copies.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_PROMPTS = ["Happy", "Excited", "Sad", "Angry"]  # reference line 99


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text-file", required=True, help="one sentence per line")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                   help="compute dtype (bf16 = faster TPU inference)")
    p.add_argument("--use-pallas", action="store_true",
                   help="fused Pallas MRF vocoder kernels (TPU only)")
    p.add_argument("--style-encoder", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--tokenlist", default=None)
    p.add_argument("--lexicon", default=None)
    p.add_argument("--speakers", default=None)
    p.add_argument("--prompts", nargs="*", default=DEFAULT_PROMPTS)
    p.add_argument("--batch-size", type=int, default=16)
    args = p.parse_args()

    import jax

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.frontend.en import read_lexicon
    from emotivoice_tpu.frontend.mixed import g2p_cn_en
    from emotivoice_tpu.frontend.tokens import TokenVocab, load_label_list
    from emotivoice_tpu.models.jets import JETSGenerator
    from emotivoice_tpu.serving.engine import SynthesisEngine, SynthesisRequest
    from emotivoice_tpu.utils.audio_io import write_wav

    cfg = EmotiVoiceConfig()
    vocab = (
        TokenVocab.from_file(args.tokenlist) if args.tokenlist else TokenVocab.default()
    )
    cfg = cfg.replace(am=cfg.am.__class__(**{**cfg.am.__dict__, "n_vocab": len(vocab)}))
    lexicon = read_lexicon(args.lexicon) if args.lexicon else None
    speakers = (
        load_label_list(args.speakers)
        if args.speakers
        else [str(i) for i in range(cfg.am.n_speaker)]
    )

    if args.checkpoint:
        from emotivoice_tpu.convert.from_torch import (
            convert_jets_generator,
            load_torch_checkpoint,
        )

        params = {"params": convert_jets_generator(
            load_torch_checkpoint(args.checkpoint), cfg
        )}
    else:
        print("WARNING: random init (smoke mode)")
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

        embedder = StyleEmbedder.from_checkpoint(
            args.style_encoder, cfg.bert, args.tokenizer
        )
        embed_fn = embedder.embed
    else:
        embed_fn = lambda text: np.zeros(cfg.am.bert_embedding, np.float32)

    import jax.numpy as jnp

    engine = SynthesisEngine(
        cfg, params, vocab,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        use_pallas=args.use_pallas,
    )
    os.makedirs(args.output_dir, exist_ok=True)

    pending, names = [], []

    def flush():
        if not pending:
            return
        for name, res in zip(names, engine.synthesize_batch(pending)):
            write_wav(
                os.path.join(args.output_dir, f"{name}.wav"),
                res.wav,
                cfg.audio.sampling_rate,
            )
        pending.clear()
        names.clear()

    with open(args.text_file, encoding="utf-8") as f:
        for i, line in enumerate(f):
            text = line.strip()
            if not text:
                continue
            name = f"{i:06d}"
            wav_path = os.path.join(args.output_dir, f"{name}.wav")
            if os.path.exists(wav_path):  # skip finished (reference :107)
                continue
            prompt = args.prompts[i % len(args.prompts)]
            speaker = i % len(speakers)
            with open(
                os.path.join(args.output_dir, f"{name}.txt"), "w",
                encoding="utf-8",
            ) as t:
                t.write(f"{speakers[speaker]}|{prompt}|{text}\n")
            try:
                phonemes = g2p_cn_en(text, lexicon).split()
            except Exception as e:  # per-line fault tolerance (reference :151)
                print(f"skip line {i}: {e}")
                continue
            pending.append(
                SynthesisRequest(
                    phonemes=phonemes,
                    speaker_id=speaker,
                    style_embedding=embed_fn(prompt),
                    content_embedding=embed_fn(text),
                )
            )
            names.append(name)
            if len(pending) >= args.batch_size:
                flush()
    flush()


if __name__ == "__main__":
    main()
