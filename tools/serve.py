#!/usr/bin/env python
"""OpenAI-compatible TTS server.

Counterpart of reference `openaiapi.py` (uvicorn FastAPI); runs on FastAPI
when available, else the stdlib HTTP server. POST /v1/audio/speech with
{"input", "voice", "prompt", "response_format", "speed"}.
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
    p.add_argument("--tokenizer", default=None, help="simbert tokenizer path")
    p.add_argument("--tokenlist", default=None)
    p.add_argument("--speakers", default=None, help="speaker list file")
    p.add_argument("--lexicon", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--no-warmup", action="store_true",
                   help="skip bucket pre-compilation at startup")
    p.add_argument("--no-background-warmup", action="store_true",
                   help="skip warming the remaining bucket grid in a "
                        "background thread after startup")
    p.add_argument("--blocking-warmup", action="store_true",
                   help="finish the full bucket-grid warmup BEFORE "
                        "listening (slower start; guarantees the first "
                        "request never sees a compile/replay)")
    p.add_argument("--no-batching", action="store_true",
                   help="disable cross-request micro-batching")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard request batches over N devices (0 = single)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="tensor-parallel width: vocoder channels / attention "
                        "heads shard over a 'model' mesh axis of this size")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed; run one server per host "
                        "behind a load balancer (docs/MULTIHOST.md)")
    p.add_argument("--jax-cache", default="",
                   help="persistent XLA compile-cache dir (default "
                        "~/.cache/emotivoice_tpu/jax; 'off' disables)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu'); needed because "
                        "JAX_PLATFORMS is not honored when a TPU plugin is "
                        "present (see tests/conftest.py)")
    p.add_argument("--smoke-tiny", action="store_true",
                   help="tiny_test_config model (random init) — for the "
                        "multi-process serving smoke test / CI only")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.jax_cache != "off":
        from emotivoice_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache(args.jax_cache or None)

    if args.multihost:
        from emotivoice_tpu.parallel.multihost import initialize_multihost

        pi, pc = initialize_multihost()
        print(f"multihost: process {pi}/{pc}")

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.frontend.en import read_lexicon
    from emotivoice_tpu.frontend.mixed import g2p_cn_en
    from emotivoice_tpu.frontend.tokens import TokenVocab, load_label_list
    from emotivoice_tpu.models.jets import JETSGenerator
    from emotivoice_tpu.serving.api import TTSService, serve_stdlib
    from emotivoice_tpu.serving.engine import SynthesisEngine

    if args.smoke_tiny:
        from emotivoice_tpu.config import tiny_test_config

        cfg = tiny_test_config()
    else:
        cfg = EmotiVoiceConfig()
    vocab = (
        TokenVocab.from_file(args.tokenlist) if args.tokenlist else TokenVocab.default()
    )
    cfg = cfg.replace(am=cfg.am.__class__(**{**cfg.am.__dict__, "n_vocab": len(vocab)}))
    speakers = (
        load_label_list(args.speakers)
        if args.speakers
        else [str(i) for i in range(cfg.am.n_speaker)]
    )
    lexicon = read_lexicon(args.lexicon) if args.lexicon else None

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
        print("WARNING: zero style embeddings (smoke mode)")
        embed_fn = lambda text: np.zeros(cfg.am.bert_embedding, np.float32)

    import jax.numpy as jnp

    mesh = None
    if args.data_parallel > 1 or args.model_parallel > 1:
        from emotivoice_tpu.parallel.mesh import make_mesh

        dp = max(args.data_parallel, 1)
        mesh = make_mesh(
            jax.devices()[: dp * args.model_parallel],
            model_parallel_size=args.model_parallel,
        )
    engine = SynthesisEngine(
        cfg, params, vocab,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        use_pallas=args.use_pallas,
        mesh=mesh,
    )
    if not args.no_warmup:
        print("pre-compiling common bucket shapes (first compile in a "
              "fresh process can take minutes)...")
        engine.warmup()
        print("warmup done")
    if not args.no_background_warmup:
        # Warm the rest of the production bucket grid; with the persistent
        # compile cache (on by default) this is a one-time cost across
        # server restarts. Default: on a daemon thread that yields to live
        # traffic (engine._wait_for_traffic_idle). --blocking-warmup joins
        # it BEFORE listening instead — startup takes the full grid replay
        # (~minutes through a remote transport) but the first request is
        # then guaranteed warm (cold-after-cache ~= warm steady state).
        th = engine.warmup_background(
            progress_cb=lambda i, n: print(f"background warmup {i}/{n}",
                                           flush=True)
            if i == n or i % 10 == 0 else None
        )
        if args.blocking_warmup:
            print("blocking on full grid warmup...", flush=True)
            th.join()
            print("grid warmup done", flush=True)
    service = TTSService(
        engine,
        g2p_fn=lambda text: g2p_cn_en(text, lexicon),
        embed_fn=embed_fn,
        speaker2id={s: i for i, s in enumerate(speakers)},
        batching=not args.no_batching,
    )

    try:
        import uvicorn

        from emotivoice_tpu.serving.api import create_fastapi_app

        app = create_fastapi_app(service)
        uvicorn.run(app, host=args.host, port=args.port)
    except ImportError:
        print(f"fastapi/uvicorn unavailable; stdlib server on {args.host}:{args.port}")
        serve_stdlib(service, args.host, args.port)


if __name__ == "__main__":
    main()
