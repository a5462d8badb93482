#!/usr/bin/env python
"""Released-checkpoint parity gate: convert the real EmotiVoice weights and
measure cross-framework agreement against the reference torch model.

The converter is parity-tested on random-init weights in CI
(tests/test_parity.py); the released `g_00140000` / `do_00140000` /
`checkpoint_163431` blobs (reference predict.py:30-55) are git-LFS
artifacts absent from this snapshot, so THIS script is the one gate that
must run on a machine that has them:

    python tools/verify_released_weights.py \
        --generator /path/g_00140000 \
        --style-encoder /path/checkpoint_163431 \
        [--discriminator /path/do_00140000] \
        [--reference /root/reference] \
        [--out-dir outputs/released_parity]

It (1) converts each checkpoint through `emotivoice_tpu.convert.from_torch`
(structure errors -> hard failure), (2) if the reference repo + torch are
importable, runs the reference JETSGenerator and ours on the reference's own
smoke file (`data/inference/text`, speaker|prompt|phonemes|content) and
reports per-utterance duration equality, mel MAE and waveform MAE — the
"mel allclose vs reference checkpoints" row of BASELINE.md — and (3) writes
our synthesized wavs for an audible check. Exit code 0 only if every gate
passes (mel MAE < 1e-3, durations exactly equal).
"""

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEL_MAE_GATE = 1e-3
WAV_MAE_GATE = 2e-3


def _stub_numba():
    """The reference model imports numba for the *training*-branch viterbi
    only (modules/alignment.py:92-142); inference never calls it."""
    if "numba" in sys.modules:
        return
    numba = types.ModuleType("numba")
    numba.jit = lambda *a, **k: (lambda f: f)
    sys.modules["numba"] = numba


def _ref_model_config():
    """Full-size model namespace mirroring reference config/joint/config.yaml
    (the yacs file the training/inference CLIs load)."""
    model = types.SimpleNamespace(
        encoder_n_hidden=384, encoder_n_heads=8, encoder_n_layers=4,
        encoder_p_dropout=0.2, encoder_kernel_size_conv_mod=3,
        decoder_n_hidden=384, decoder_n_heads=8, decoder_n_layers=4,
        decoder_p_dropout=0.2, decoder_kernel_size_conv_mod=3,
        duration_n_layers=2, duration_kernel_size=3, duration_p_dropout=0.5,
        variance_n_hidden=384, variance_n_layers=3, variance_kernel_size=3,
        variance_p_dropout=0.1, variance_embed_kernel_size=9,
        variance_embde_p_dropout=0.0,
        bert_embedding=768,
        resblock="1",
        upsample_rates=[8, 8, 2, 2],
        upsample_kernel_sizes=[16, 16, 4, 4],
        initial_channel=80,
        upsample_initial_channel=512,
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    )
    return types.SimpleNamespace(
        model=model, n_mels=80, n_vocab=502, n_speaker=2013, segment_size=32
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--generator", required=True, help="g_XXXXXXXX ckpt")
    ap.add_argument("--style-encoder", required=True,
                    help="checkpoint_163431 (SimBERT style encoder)")
    ap.add_argument("--discriminator", default=None, help="do_XXXXXXXX ckpt")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--texts", default=None,
                    help="speaker|prompt|phonemes|content file (default: "
                         "<reference>/data/inference/text)")
    ap.add_argument("--tokenlist", default=None)
    ap.add_argument("--speakers", default=None)
    ap.add_argument("--out-dir", default="outputs/released_parity")
    ap.add_argument("--max-utts", type=int, default=4)
    args = ap.parse_args()

    import numpy as np

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.convert.from_torch import (
        convert_discriminator,
        convert_jets_generator,
        convert_style_encoder,
        load_torch_checkpoint,
    )
    from emotivoice_tpu.frontend.tokens import TokenVocab, load_label_list

    cfg = EmotiVoiceConfig()  # defaults == released-model dims
    os.makedirs(args.out_dir, exist_ok=True)
    report = {"gates": {}, "utterances": []}

    # ---- gate 1: structural conversion of every checkpoint ----------------
    g_ckpt = load_torch_checkpoint(args.generator)
    params = convert_jets_generator(g_ckpt, cfg)
    report["gates"]["convert_generator"] = "ok"
    style_params = convert_style_encoder(load_torch_checkpoint(args.style_encoder))
    report["gates"]["convert_style_encoder"] = "ok"
    del style_params
    if args.discriminator:
        convert_discriminator(load_torch_checkpoint(args.discriminator))
        report["gates"]["convert_discriminator"] = "ok"

    vocab = (TokenVocab.from_file(args.tokenlist) if args.tokenlist
             else TokenVocab.default())
    ref_root = os.path.abspath(args.reference)
    texts = args.texts or os.path.join(ref_root, "data", "inference", "text")
    with open(texts, encoding="utf-8") as f:
        lines = [l.strip() for l in f if l.strip()][: args.max_utts]

    speakers = (load_label_list(args.speakers) if args.speakers else None)

    def speaker_id(s):
        if speakers is not None:
            return speakers.index(s)
        return int(s) % cfg.am.n_speaker

    # ---- reference torch model (optional — needs torch + reference repo) --
    ref = None
    try:
        import torch

        if ref_root not in sys.path:
            sys.path.insert(0, ref_root)
        _stub_numba()
        from models.prompt_tts_modified.jets import JETSGenerator as RefJETS

        ref = RefJETS(_ref_model_config()).eval()
        sd = g_ckpt.get("generator", g_ckpt)
        ref.load_state_dict(sd)
        report["gates"]["reference_model"] = "loaded"
    except Exception as e:  # noqa: BLE001 — record and continue one-sided
        report["gates"]["reference_model"] = f"unavailable: {e!r}"

    # Style embeddings need the HF tokenizer + SimBERT; for the parity gate
    # random-but-shared embeddings are equivalent (both frameworks consume
    # the same vectors), so the gate isolates the generator stack.
    import jax.numpy as jnp

    from emotivoice_tpu.models.jets import JETSGenerator

    model = JETSGenerator(cfg)
    rng = np.random.RandomState(0)
    ok = True
    for li, line in enumerate(lines):
        spk, _prompt, phonemes, _content = line.split("|")
        ids = vocab.encode(phonemes.split())
        tokens = np.asarray([ids], np.int64)
        lengths = np.asarray([len(ids)], np.int64)
        speaker = np.asarray([speaker_id(spk)], np.int64)
        style = rng.randn(1, cfg.am.bert_embedding).astype(np.float32)
        content = rng.randn(1, cfg.am.bert_embedding).astype(np.float32)

        row = {"utt": li, "speaker": spk, "n_tokens": len(ids)}
        if ref is not None:
            with __import__("torch").no_grad():
                out_ref = ref(
                    *map(__import__("torch").from_numpy,
                         (tokens, lengths, speaker, style, content))
                )
            dur_ref = out_ref["log_duration_predictions"][0].numpy().astype(np.int64)
            t_frames = int(dur_ref.sum())
            out = model.apply(
                {"params": params},
                jnp.asarray(tokens, jnp.int32), jnp.asarray(lengths, jnp.int32),
                jnp.asarray(speaker, jnp.int32), jnp.asarray(style),
                jnp.asarray(content), max_frames=t_frames,
            )
            mel_mae = float(np.mean(np.abs(
                np.asarray(out["dec_outputs"][0])
                - out_ref["dec_outputs"][0].numpy()
            )))
            wav_mae = float(np.mean(np.abs(
                np.asarray(out["wav_predictions"][0])
                - out_ref["wav_predictions"][0, 0].numpy()
            )))
            dur_eq = bool(
                (np.asarray(out["durations"][0]) == dur_ref).all()
            )
            row.update(mel_mae=mel_mae, wav_mae=wav_mae, durations_equal=dur_eq)
            ok &= dur_eq and mel_mae < MEL_MAE_GATE and wav_mae < WAV_MAE_GATE
            wav = np.asarray(out["wav_predictions"][0])
        else:
            out = model.apply(
                {"params": params},
                jnp.asarray(tokens, jnp.int32), jnp.asarray(lengths, jnp.int32),
                jnp.asarray(speaker, jnp.int32), jnp.asarray(style),
                jnp.asarray(content), max_frames=1024,
            )
            n = int(out["output_lengths"][0]) * cfg.vocoder.upsample_factor
            wav = np.asarray(out["wav_predictions"][0])[:n]

        from emotivoice_tpu.utils.audio_io import write_wav

        write_wav(
            os.path.join(args.out_dir, f"utt{li}.wav"),
            wav, cfg.audio.sampling_rate,
        )
        report["utterances"].append(row)
        print(json.dumps(row), flush=True)

    report["pass"] = bool(ok and ref is not None)
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"pass": report["pass"], "gates": report["gates"]}))
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
