#!/usr/bin/env python
"""Joint AM + HiFi-GAN vocoder training CLI.

Counterpart of reference `train_am_vocoder_joint.py` (torchrun DDP); here one
process drives the whole device mesh and XLA handles the gradient
all-reduce. Supports warm-start from converted reference checkpoints and
voice-cloning fine-tuning (speaker-embedding growth).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datalist", required=True)
    p.add_argument("--valid-datalist", default=None,
                   help="held-out datalist; enables validation every "
                        "--iters-per-validation steps (reference "
                        "train_am_vocoder_joint.py:432-434)")
    p.add_argument("--iters-per-validation", type=int, default=1000)
    p.add_argument("--iters-per-checkpoint", type=int, default=None,
                   help="checkpoint period (default from TrainConfig; "
                        "reference saves every 10k/5k, "
                        "train_am_vocoder_joint.py:444-452)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--tokenlist", default=None)
    p.add_argument("--speakers", default=None)
    p.add_argument("--style-encoder", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--pretrained-generator", default=None,
                   help="reference g_XXXXXXXX torch ckpt to warm-start from")
    p.add_argument("--pretrained-discriminator", default=None,
                   help="reference do_XXXXXXXX torch ckpt to warm-start from")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--total-steps", type=int, default=140000)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--new-speakers", type=int, default=0,
                   help="grow the speaker table by N rows (voice cloning)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (one process per host "
                        "on a pod slice); shards the datalist per process "
                        "and treats --batch-size as the GLOBAL batch")
    p.add_argument("--jax-cache", default="",
                   help="persistent XLA compile-cache dir (default "
                        "~/.cache/emotivoice_tpu/jax; 'off' disables)")
    args = p.parse_args()

    import numpy as np

    if args.jax_cache != "off":
        from emotivoice_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache(args.jax_cache or None)

    process_index, process_count = 0, 1
    if args.multihost:
        from emotivoice_tpu.parallel.multihost import initialize_multihost

        process_index, process_count = initialize_multihost()
        print(f"multihost: process {process_index}/{process_count}")

    from emotivoice_tpu.config import EmotiVoiceConfig, TrainConfig
    from emotivoice_tpu.data.dataset import (
        BucketedLoader,
        PrefetchLoader,
        PromptTTSDataset,
    )
    from emotivoice_tpu.frontend.tokens import TokenVocab, load_label_list
    from emotivoice_tpu.training.loop import train

    cfg = EmotiVoiceConfig()
    vocab = (
        TokenVocab.from_file(args.tokenlist) if args.tokenlist else TokenVocab.default()
    )
    speakers = (
        load_label_list(args.speakers)
        if args.speakers
        else [str(i) for i in range(cfg.am.n_speaker)]
    )
    n_speaker = len(speakers) + args.new_speakers
    cfg = cfg.replace(
        am=cfg.am.__class__(
            **{**cfg.am.__dict__, "n_vocab": len(vocab), "n_speaker": n_speaker}
        ),
        train=TrainConfig(
            batch_size=args.batch_size,
            iters_per_validation=args.iters_per_validation,
            **({"iters_per_checkpoint": args.iters_per_checkpoint}
               if args.iters_per_checkpoint else {}),
        ),
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

    dataset = PromptTTSDataset(
        args.datalist, cfg, vocab, speakers, embed_fn, cache_dir=args.cache_dir
    )
    local_bs = args.batch_size
    if process_count > 1:
        # global batch semantics (docs/MULTIHOST.md): each host loads a
        # disjoint datalist shard and 1/P of the global batch rows.
        from emotivoice_tpu.parallel.multihost import shard_datalist

        dataset.utts = shard_datalist(dataset.utts)
        local_bs = max(args.batch_size // process_count, 1)
    # background prefetch keeps the device fed while features extract
    loader = lambda: PrefetchLoader(BucketedLoader(dataset, local_bs))

    valid_loader = None
    if args.valid_datalist:
        valid_dataset = PromptTTSDataset(
            args.valid_datalist, cfg, vocab, speakers, embed_fn,
            cache_dir=args.cache_dir,
        )
        # pad_to_batch: validation reuses the training (batch, text, mel)
        # shape grid, so after the loop's warm step-0 validation no eval
        # shape ever compiles mid-run (fixes the post-validation
        # steps_per_sec collapse seen in the round-2 training log).
        valid_loader = lambda: BucketedLoader(
            valid_dataset, local_bs, shuffle=False, drop_last=False,
            pad_to_batch=True,
        )

    warm_start_fn = None
    if args.pretrained_generator:
        from emotivoice_tpu.convert.from_torch import (
            convert_discriminator,
            convert_jets_generator,
            grow_speaker_embedding,
            load_torch_checkpoint,
        )

        g_ckpt = load_torch_checkpoint(args.pretrained_generator)
        # reference prepare_for_training.py:91-97 — grow the speaker table
        # for cloning BEFORE training, then warm-start
        # (train_am_vocoder_joint.py:269-276).
        base_cfg = cfg.replace(
            am=cfg.am.__class__(
                **{**cfg.am.__dict__, "n_speaker": len(speakers)}
            )
        )
        g_params = convert_jets_generator(g_ckpt, base_cfg)
        if args.new_speakers:
            g_params = grow_speaker_embedding(g_params, args.new_speakers)
        d_vars = None
        if args.pretrained_discriminator:
            d_vars = convert_discriminator(
                load_torch_checkpoint(args.pretrained_discriminator)
            )

        def warm_start_fn(state):
            if d_vars is None:
                return state.replace(g_params=g_params)
            return state.replace(
                g_params=g_params,
                d_params=d_vars["params"],
                # spectral-norm u/v re-estimate in a few power iterations;
                # keep fresh state for any keys the torch ckpt lacks
                d_spectral=(d_vars["spectral"] or state.d_spectral),
            )

    train(
        cfg,
        loader,
        args.output_dir,
        total_steps=args.total_steps,
        steps_per_epoch=max(len(dataset) // args.batch_size, 1),
        valid_batch_iter_fn=valid_loader,
        warm_start_fn=warm_start_fn,
        log_every=args.log_every,
    )


if __name__ == "__main__":
    main()
