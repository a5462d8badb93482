#!/usr/bin/env python
"""Full voice-matrix sweep: every speaker x style prompt through the engine.

The reference ships 2,013 speaker IDs (`/root/reference/data/youdao/text/
speaker2`; `prepare_for_training.py:86` asserts >= 2014 after cloning) and
round-robins four style prompts in bulk synthesis
(`inference_tts.py:98-101`), but has no harness that exercises the whole
speaker x prompt matrix. This tool runs it in bucketed batches and checks:

  - numerical health: every waveform finite, peak amplitude recorded
    (non-silence asserted via --min-peak when real weights are loaded);
  - embedding-table coverage: every speaker id < n_speaker, including
    speakers grown via tools/prepare_for_training (--new-speakers);
  - per-speaker RTF (dispatch wall time amortized over the batch).

It doubles as the released-weights parity matrix: --save-wavs keeps every
waveform; --compare <dir> reports per-utterance MAE against same-named
wavs (e.g. rendered by the reference torch stack from g_00140000) so the
moment real checkpoints exist this becomes the 2000-voice parity gate
(docs/RELEASED_WEIGHTS_PARITY.md).

Output: one JSONL row per (speaker, prompt) plus a summary JSON line on
stdout; optionally a markdown report via --report.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_PROMPTS = ["Happy", "Excited", "Sad", "Angry"]  # reference inference_tts.py:99
# Fixed utterance so the sweep needs no lexicon/g2p deps: plain ARPAbet
# tokens from the default inventory ("Happy new year").
DEFAULT_PHONEMES = (
    "<sos/eos> [HH] [AE1] [P] [IY0] engsp1 [N] [UW1] engsp1 "
    "[Y] [IH1] [R] <sos/eos>"
)


def _pct(v, q):
    if not v:
        return None
    s = sorted(v)
    return s[min(len(s) - 1, int(q * (len(s) - 1) + 0.5))]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None,
                   help="reference torch g_XXXXXXXX checkpoint")
    p.add_argument("--train-ckpt", default=None,
                   help="Orbax ckpt dir from tools/train_joint.py "
                        "(<output-dir>/ckpt); loads the latest step's "
                        "generator params")
    p.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    p.add_argument("--use-pallas", action="store_true")
    p.add_argument("--style-encoder", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--tokenlist", default=None)
    p.add_argument("--speakers", default=None,
                   help="speaker list file (default: all n_speaker ids)")
    p.add_argument("--prompts", nargs="*", default=DEFAULT_PROMPTS)
    p.add_argument("--phonemes", default=DEFAULT_PHONEMES,
                   help="fixed utterance token string for every cell")
    p.add_argument("--text", default=None,
                   help="raw text run through the frontend instead of "
                        "--phonemes (needs g2p deps)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--limit", type=int, default=0,
                   help="sweep only the first N speakers (0 = all)")
    p.add_argument("--min-peak", type=float, default=0.0,
                   help="fail a cell whose |wav| peak is below this "
                        "(use ~1e-4 with real weights; random init is "
                        "legitimately near-silent)")
    p.add_argument("--out", default=None, help="JSONL per-cell results path")
    p.add_argument("--save-wavs", default=None,
                   help="save every waveform to this dir (parity matrix)")
    p.add_argument("--compare", default=None,
                   help="dir of same-named reference wavs; report MAE")
    p.add_argument("--report", default=None, help="markdown summary path")
    p.add_argument("--jax-cache", default="",
                   help="persistent compile-cache dir ('off' disables)")
    args = p.parse_args()

    import jax

    if args.jax_cache != "off":
        from emotivoice_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache(args.jax_cache or None)

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.frontend.tokens import TokenVocab, load_label_list
    from emotivoice_tpu.models.jets import JETSGenerator
    from emotivoice_tpu.serving.engine import SynthesisEngine, SynthesisRequest
    from emotivoice_tpu.utils.audio_io import write_wav

    cfg = EmotiVoiceConfig()
    vocab = (
        TokenVocab.from_file(args.tokenlist) if args.tokenlist
        else TokenVocab.default()
    )
    cfg = cfg.replace(
        am=cfg.am.__class__(**{**cfg.am.__dict__, "n_vocab": len(vocab)})
    )
    speakers = (
        load_label_list(args.speakers)
        if args.speakers
        else [str(i) for i in range(cfg.am.n_speaker)]
    )
    if args.limit:
        speakers = speakers[: args.limit]
    # Embedding-table coverage: every swept id must have a row. Grown
    # speakers (prepare_for_training --new-speakers) extend n_speaker, so a
    # stale config here is a real bug, not a skip.
    assert len(speakers) <= cfg.am.n_speaker, (
        f"{len(speakers)} speakers but embedding table has only "
        f"{cfg.am.n_speaker} rows — regenerate the config after growing "
        "the speaker table"
    )

    if args.checkpoint:
        from emotivoice_tpu.convert.from_torch import (
            convert_jets_generator,
            load_torch_checkpoint,
        )

        params = {"params": convert_jets_generator(
            load_torch_checkpoint(args.checkpoint), cfg
        )}
    elif args.train_ckpt:
        # Our own training output (Orbax TrainState, training/loop.py
        # CheckpointManager): restore the latest step structure-free and
        # keep the generator side. Arms the sweep's non-silence gate with a
        # genuinely trained model (VERDICT r4 ask #4).
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(args.train_ckpt))
        step = mgr.latest_step()
        assert step is not None, f"no checkpoints in {args.train_ckpt}"
        restored = mgr.restore(step)
        g_params = restored["g_params"]
        print(f"# loaded train ckpt step {step} from {args.train_ckpt}",
              file=sys.stderr)
        params = {"params": g_params}
        # The checkpoint's table sizes are authoritative (a corpus-local
        # run trains fewer speakers/tokens than the 2014/502 defaults);
        # flax rejects apply() when cfg-derived init shapes disagree.
        n_spk = g_params["am"]["spk_tokenizer"]["embedding"].shape[0]
        n_vocab = g_params["am"]["src_word_emb"]["embedding"].shape[0]
        cfg = cfg.replace(am=cfg.am.__class__(**{
            **cfg.am.__dict__, "n_speaker": n_spk, "n_vocab": n_vocab,
        }))
        assert len(speakers) <= n_spk, (
            f"{len(speakers)} speakers but the checkpoint's embedding "
            f"table has {n_spk} rows"
        )
    else:
        print("WARNING: random init (smoke mode)", file=sys.stderr)
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
        # Deterministic distinct pseudo-embeddings per prompt so the style
        # conditioning path is exercised even without the BERT encoder.
        def embed_fn(text):
            r = np.random.RandomState(abs(hash(text)) % (2**31))
            return r.randn(cfg.am.bert_embedding).astype(np.float32) * 0.1

    if args.text:
        from emotivoice_tpu.frontend.mixed import g2p_cn_en

        phonemes = g2p_cn_en(args.text, None).split()
        content_text = args.text
    else:
        phonemes = args.phonemes.split()
        content_text = "happy new year"

    import jax.numpy as jnp

    engine = SynthesisEngine(
        cfg, params, vocab,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        use_pallas=args.use_pallas,
    )
    content_emb = embed_fn(content_text)
    prompt_embs = {pr: embed_fn(pr) for pr in args.prompts}

    if args.save_wavs:
        os.makedirs(args.save_wavs, exist_ok=True)
    out_f = open(args.out, "w", encoding="utf-8") if args.out else None

    cells = [(s, pr) for s in range(len(speakers)) for pr in args.prompts]

    # Warm every dispatch shape the sweep will hit (the full batch and the
    # tail batch) BEFORE timing: previously the first cell's RTF included
    # its one-time XLA compile (observed rtf.max=1463 in the r4 sweep),
    # which is a compile-latency number, not a synthesis RTF (VERDICT r4).
    def _mk_req(s, pr):
        return SynthesisRequest(
            phonemes=phonemes,
            speaker_id=s,
            style_embedding=prompt_embs[pr],
            content_embedding=content_emb,
        )

    warm_sizes = {min(args.batch_size, len(cells))}
    if len(cells) % args.batch_size:
        warm_sizes.add(len(cells) % args.batch_size)
    for ws in sorted(warm_sizes):
        t0 = time.perf_counter()
        engine.synthesize_batch([_mk_req(*cells[0])] * ws)
        print(f"# warmup batch={ws}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
    # The per-size warm above only covers the mel bucket cell[0]'s speaker
    # happens to land in; other speakers predict other durations and hit
    # other (batch, text, mel) buckets mid-sweep (r5 first pass:
    # rtf.max=76 from exactly one such cold bucket). Walk the full grid
    # for the sweep's batch sizes so the probe pass below is cheap.
    t0 = time.perf_counter()
    engine.warmup_background(batches=sorted(warm_sizes)).join()
    print(f"# warmup grid: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    rtfs, peaks, failures, mae_rows = [], [], [], []
    n_done = 0
    t_sweep = time.perf_counter()
    for i in range(0, len(cells), args.batch_size):
        group = cells[i : i + args.batch_size]
        reqs = [_mk_req(s, pr) for s, pr in group]
        # Probe dispatch (untimed), then time the second dispatch of the
        # identical group: whatever (batch, text, mel) bucket the group's
        # predicted durations select is guaranteed compiled by the probe,
        # so RTF is dispatch>=2 steady state by construction — grid
        # heuristics can't predict degenerate duration outputs (r5 passes
        # 2-3 still caught 13-25 s compile dispatches mid-sweep).
        engine.synthesize_batch(reqs)
        t0 = time.perf_counter()
        results = engine.synthesize_batch(reqs)
        dt = time.perf_counter() - t0
        for (s, pr), res in zip(group, results):
            audio_s = len(res.wav) / engine.sr
            rtf = (dt / len(group)) / max(audio_s, 1e-9)
            finite = bool(np.isfinite(res.wav).all())
            peak = float(np.abs(res.wav).max()) if len(res.wav) else 0.0
            ok = finite and peak >= args.min_peak and res.n_frames > 0
            row = {
                "speaker": speakers[s], "prompt": pr,
                "n_frames": res.n_frames, "audio_s": round(audio_s, 3),
                "peak": round(peak, 6), "finite": finite,
                "rtf": round(rtf, 6), "ok": ok,
            }
            rtfs.append(rtf)
            peaks.append(peak)
            if not ok:
                failures.append(row)
            name = f"{speakers[s]}_{pr}"
            if args.save_wavs:
                write_wav(
                    os.path.join(args.save_wavs, f"{name}.wav"),
                    res.wav, engine.sr,
                )
            if args.compare:
                ref_path = os.path.join(args.compare, f"{name}.wav")
                if os.path.exists(ref_path):
                    from emotivoice_tpu.utils.audio_io import read_wav

                    _, ref = read_wav(ref_path)
                    n = min(len(ref), len(res.wav))
                    mae = float(np.abs(
                        res.wav[:n] - ref[:n].astype(np.float32)
                    ).mean()) if n else float("nan")
                    row["ref_mae"] = mae
                    row["ref_len_delta"] = len(res.wav) - len(ref)
                    mae_rows.append(mae)
            if out_f:
                out_f.write(json.dumps(row) + "\n")
            n_done += 1
        if (i // args.batch_size) % 25 == 0:
            print(
                f"# {n_done}/{len(cells)} cells, "
                f"rtf_p50={_pct(rtfs, 0.5):.4g}", file=sys.stderr, flush=True,
            )
    wall = time.perf_counter() - t_sweep
    if out_f:
        out_f.close()

    summary = {
        "speakers": len(speakers),
        "prompts": len(args.prompts),
        "cells": n_done,
        "dispatches": -(-len(cells) // args.batch_size),
        "wall_s": round(wall, 1),
        "rtf": {"p50": _pct(rtfs, 0.5), "p95": _pct(rtfs, 0.95),
                "max": max(rtfs) if rtfs else None},
        "peak": {"min": min(peaks) if peaks else None,
                 "max": max(peaks) if peaks else None},
        "failures": len(failures),
        "weights": args.checkpoint or args.train_ckpt or "random-init",
    }
    if mae_rows:
        summary["ref_mae"] = {"mean": float(np.mean(mae_rows)),
                              "max": float(np.max(mae_rows))}
    print(json.dumps(summary))
    if failures[:5]:
        print("failures (first 5):", file=sys.stderr)
        for f in failures[:5]:
            print(json.dumps(f), file=sys.stderr)

    if args.report:
        with open(args.report, "w", encoding="utf-8") as r:
            r.write("# Voice sweep\n\n```json\n")
            r.write(json.dumps(summary, indent=2))
            r.write("\n```\n")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
