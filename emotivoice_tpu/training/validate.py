"""Validation: held-out losses + mel comparison figures + sample audio.

Parity target: reference `validate()` (`train_am_vocoder_joint.py:57-195`)
which every `iters_per_validation` steps computes losses on the validation
set and logs a GT-vs-predicted mel figure (`plot_image.py:6-26`) and one
synthesized utterance to tensorboard.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable

import numpy as np


def plot_mel_comparison(gt_mel: np.ndarray, pred_mel: np.ndarray):
    """(T, n_mels) pair -> matplotlib figure (reference plot_image.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 1, figsize=(10, 6))
    for ax, mel, title in (
        (axes[0], gt_mel, "ground truth"),
        (axes[1], pred_mel, "predicted"),
    ):
        im = ax.imshow(mel.T, origin="lower", aspect="auto", interpolation="none")
        ax.set_title(title)
        fig.colorbar(im, ax=ax)
    fig.tight_layout()
    return fig


def make_validate_fn(
    cfg,
    model,
    valid_batches: Callable[[], Iterable[Dict[str, np.ndarray]]],
    logger,
    max_batches: int = 8,
):
    """Build a validate_fn(state, step) for the training loop."""
    import jax
    import jax.numpy as jnp

    from emotivoice_tpu.training.losses import prosody_losses

    @jax.jit
    def eval_step(g_params, batch):
        out = model.apply(
            {"params": g_params},
            batch["tokens"],
            batch["text_lengths"],
            batch["speaker"],
            batch["style_embedding"],
            batch["content_embedding"],
            mel_targets=batch["mel"],
            feats_lengths=batch["mel_lengths"],
            pitch_targets=batch["pitch"],
            energy_targets=batch["energy"],
            cut=False,
            deterministic=True,
            segment_rng=jax.random.PRNGKey(0),
        )
        from emotivoice_tpu.utils.masks import sequence_mask

        valid = sequence_mask(batch["mel_lengths"], batch["mel"].shape[1])
        mel_l1 = jnp.sum(
            jnp.abs(out["dec_outputs"] - batch["mel"])
            * valid[..., None]
        ) / jnp.maximum(jnp.sum(valid) * batch["mel"].shape[-1], 1.0)
        pros = prosody_losses(out)
        metrics = {"mel_l1": mel_l1, **pros, "bin_loss": out["bin_loss"]}
        return metrics, out["dec_outputs"], out["wav_predictions"]

    def validate(state, step):
        agg: Dict[str, float] = {}
        n = 0
        sample = None
        for batch in valid_batches():
            metrics, pred_mel, wav = eval_step(state.g_params, batch)
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            if sample is None:
                ml = int(batch["mel_lengths"][0])
                sample = (
                    np.asarray(batch["mel"][0][:ml]),
                    np.asarray(pred_mel[0][:ml]),
                    np.asarray(wav[0]),
                )
            n += 1
            if n >= max_batches:
                break
        if n == 0:
            return
        logger.log(step, {k: v / n for k, v in agg.items()}, prefix="valid")
        if sample is not None:
            gt, pred, wav = sample
            # on-disk audio artifact (reference writes audio only to
            # tensorboard, train_am_vocoder_joint.py:183; a plain wav file
            # makes run evidence audible without tensorboard)
            import os

            from emotivoice_tpu.utils.audio_io import write_wav

            write_wav(
                os.path.join(
                    os.path.dirname(logger.text_path),
                    f"valid_audio_{step:08d}.wav",
                ),
                np.clip(np.asarray(wav, np.float32), -1.0, 1.0),
                cfg.audio.sampling_rate,
            )
            if logger.tb is not None:
                logger.tb.add_figure(
                    "valid/mel_comparison", plot_mel_comparison(gt, pred), step
                )
                logger.tb.add_audio(
                    "valid/audio_predicted", wav[None, :], step,
                    sample_rate=cfg.audio.sampling_rate,
                )

    return validate
