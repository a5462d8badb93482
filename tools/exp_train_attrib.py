#!/usr/bin/env python
"""Per-component attribution of the jitted GAN training step.

The headline (tools/bench_train.py) is one number; this breaks the step
into its cost centers so optimization lands where the time is (VERDICT r3
weak #4). Each component runs under the same scan-fenced harness as every
other benchmark in the repo (see docs/PERFORMANCE.md methodology):

  g_fwd     generator forward, train mode (AM + alignment/MAS + CTC
            inputs + segment crop + 32-frame vocoder) — no grad
  g_grad    value_and_grad of the generator-side losses (mel L1 +
            prosody + alignment), NO discriminator — G fwd+bwd
  d_fwd     all 8 discriminator towers on fixed (y, y_hat) — no grad
  d_grad    value_and_grad of the LSGAN D loss — D fwd+bwd
  mpd_fwd   the 5 MPD towers only
  msd_fwd   the 3 MSD towers only
  full      the complete train step (D grad+update, G grad+update)

--dtype bf16 runs generator+discriminator compute in bfloat16 (f32 master
params / accumulation / losses; see training/step.py:init_train_state).

Reference hot loop: train_am_vocoder_joint.py:375-418 (torch, no
published attribution).
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--text-len", type=int, default=96)
    p.add_argument("--mel-frames", type=int, default=384)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    p.add_argument("--only", nargs="*", default=None,
                   help="subset of component names to time")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.models.hifigan import (
        DiscriminatorP, DiscriminatorS, _avg_pool1d, discriminator_loss,
    )
    from emotivoice_tpu.ops.segments import get_segments
    from emotivoice_tpu.training.losses import (
        alignment_losses, prosody_losses,
    )
    from emotivoice_tpu.training.step import init_train_state, make_train_step
    from emotivoice_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = EmotiVoiceConfig()
    dt = jnp.bfloat16 if args.dtype == "bf16" else None
    b, t_text, t_feats = args.batch_size, args.text_len, args.mel_frames
    up = cfg.vocoder.upsample_factor
    rng = np.random.RandomState(0)
    batch = {
        "tokens": jnp.asarray(
            rng.randint(0, cfg.am.n_vocab, (b, t_text)), jnp.int32
        ),
        "text_lengths": jnp.full((b,), t_text, jnp.int32),
        "speaker": jnp.asarray(
            rng.randint(0, cfg.am.n_speaker, (b,)), jnp.int32
        ),
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

    state, model, disc = init_train_state(
        cfg, jax.random.PRNGKey(0), batch, compute_dtype=dt
    )
    step = make_train_step(cfg, model, disc)
    seg_rng = jax.random.PRNGKey(7)
    seg_wav = jnp.asarray(
        0.1 * rng.randn(b, cfg.train.segment_size * up), jnp.float32
    )
    seg_fake = jnp.asarray(
        0.1 * rng.randn(b, cfg.train.segment_size * up), jnp.float32
    )

    def timed(fn, *fargs, n=args.iters):
        @jax.jit
        def chain(*a):
            def body(carry, _):
                out = fn(carry, *a)
                return out, out
            _, ss = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return jnp.sum(ss)

        float(chain(*fargs))
        t0 = time.perf_counter()
        float(chain(*fargs))
        return (time.perf_counter() - t0) / n * 1e3

    def perturb(bt, carry):
        # couple each iteration to the carry so XLA cannot hoist the body
        e = bt["style_embedding"]
        return {**bt, "style_embedding": e + (1e-12 * carry).astype(e.dtype)}

    def comp_full(carry, st):
        new_st, metrics = step(st, perturb(batch, carry))
        # touch every updated param so the optimizer applies aren't DCE'd
        # (returning only the loss drops ~40% of the real step)
        psum = sum(
            jnp.sum(l) for l in
            jax.tree.leaves((new_st.g_params, new_st.d_params))
        )
        return (metrics["g_loss"] + 1e-12 * psum).astype(jnp.float32)

    def g_apply_p(g_params, drop, carry):
        bt = perturb(batch, carry)
        return model.apply(
            {"params": g_params},
            bt["tokens"], bt["text_lengths"], bt["speaker"],
            bt["style_embedding"], bt["content_embedding"],
            mel_targets=bt["mel"], feats_lengths=bt["mel_lengths"],
            pitch_targets=bt["pitch"], energy_targets=bt["energy"],
            segment_rng=seg_rng, deterministic=False,
            rngs={"dropout": drop},
        )

    def comp_g_fwd(carry, g_params):
        drop = jax.random.PRNGKey(1)
        out = g_apply_p(g_params, drop, carry)
        return jnp.sum(out["wav_predictions"][..., ::499]).astype(jnp.float32)

    def comp_g_grad(carry, g_params):
        drop = jax.random.PRNGKey(1)

        def loss_fn(p):
            out = g_apply_p(p, drop, carry)
            y = get_segments(
                batch["wav"], out["z_start_idxs"] * up,
                cfg.train.segment_size * up,
            )
            pros = prosody_losses(out)
            align = alignment_losses(out)
            return (
                jnp.mean(jnp.abs(out["wav_predictions"] - y))
                + pros["dur_loss"] + pros["pitch_loss"]
                + pros["energy_loss"] + align["forwardsum_loss"]
                + align["bin_loss"]
            )

        l, grads = jax.value_and_grad(loss_fn)(g_params)
        gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
        return (l + 1e-12 * gsum).astype(jnp.float32)

    def comp_d_fwd(carry, d_params, spectral):
        (ro, fo, rf, ff), _ = disc.apply(
            {"params": d_params, "spectral": spectral},
            seg_wav + carry.astype(seg_wav.dtype) * 1e-9, seg_fake,
            update_stats=False, mutable=["spectral"],
        )
        return discriminator_loss(ro, fo)

    def comp_d_grad(carry, d_params, spectral):
        def loss_fn(p):
            (ro, fo, _, _), _ = disc.apply(
                {"params": p, "spectral": spectral},
                seg_wav + carry.astype(seg_wav.dtype) * 1e-9, seg_fake,
                update_stats=False, mutable=["spectral"],
            )
            return discriminator_loss(ro, fo)

        l, grads = jax.value_and_grad(loss_fn)(d_params)
        gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
        return (l + 1e-12 * gsum).astype(jnp.float32)

    dc = cfg.disc

    def comp_mpd_fwd(carry, d_params):
        yp = seg_wav + carry.astype(seg_wav.dtype) * 1e-9
        if dt is not None:
            yp, yf = yp.astype(dt), seg_fake.astype(dt)
        else:
            yf = seg_fake
        tot = jnp.float32(0)
        for per in dc.periods:
            d = DiscriminatorP(
                per, kernel_size=dc.period_kernel_size,
                stride=dc.period_stride, channels=dc.period_channels,
            )
            sub = {"params": d_params[f"mpd_{per}"]}
            for wav_in in (yp, yf):
                o, _ = d.apply(sub, wav_in)
                tot = tot + jnp.sum(o.astype(jnp.float32))
        return tot

    def comp_msd_fwd(carry, d_params, spectral):
        yp = seg_wav + carry.astype(seg_wav.dtype) * 1e-9
        if dt is not None:
            yp, yf = yp.astype(dt), seg_fake.astype(dt)
        else:
            yf = seg_fake
        tot = jnp.float32(0)
        for i in range(dc.n_scales):
            if i != 0:
                yp, yf = _avg_pool1d(yp), _avg_pool1d(yf)
            d = DiscriminatorS(
                use_spectral_norm=(i == 0), layers=dc.scale_layers,
            )
            sub = {"params": d_params[f"msd_{i}"]}
            if i == 0:
                sub["spectral"] = spectral[f"msd_{i}"]
            for wav_in in (yp, yf):
                if i == 0:
                    (o, _), _ = d.apply(
                        sub, wav_in, False, mutable=["spectral"]
                    )
                else:
                    o, _ = d.apply(sub, wav_in, False)
                tot = tot + jnp.sum(o.astype(jnp.float32))
        return tot

    results = {}
    names = args.only

    jobs = [
        ("g_fwd", lambda: timed(comp_g_fwd, state.g_params)),
        ("g_grad", lambda: timed(comp_g_grad, state.g_params)),
        ("d_fwd", lambda: timed(comp_d_fwd, state.d_params, state.d_spectral)),
        ("d_grad", lambda: timed(comp_d_grad, state.d_params, state.d_spectral)),
        ("mpd_fwd", lambda: timed(comp_mpd_fwd, state.d_params)),
        ("msd_fwd", lambda: timed(
            comp_msd_fwd, state.d_params, state.d_spectral)),
        ("full", lambda: timed(comp_full, state)),
    ]
    for name, job in jobs:
        if names and name not in names:
            continue
        print(f"# timing {name}...", file=sys.stderr, flush=True)
        results[name] = round(job(), 2)
        print(f"# {name}={results[name]}ms", file=sys.stderr, flush=True)

    results["dtype"] = args.dtype
    results["batch"] = b
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
