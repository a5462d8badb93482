"""TTS + GAN loss functions.

Parity target: reference `models/prompt_tts_modified/loss.py` (masked L1 mel /
duration / pitch / energy + CTC forward-sum) and
`models/hifigan/models.py:279-310` (LSGAN + feature-matching, in
emotivoice_tpu.models.hifigan).

Note on the mel loss: the reference training loop substitutes the vocoded
segment's mel and the GT segment's mel into the "dec_outputs"/"mel_targets"
slots before calling TTSLoss (`train_am_vocoder_joint.py:344-372`), so the
x45 mel term is a HiFi-GAN-style segment mel L1; we implement it directly as
`segment_mel_l1`.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from emotivoice_tpu.ops.align import forward_sum_loss
from emotivoice_tpu.utils.masks import sequence_mask


def masked_l1(pred, target, valid, axis_size_norm=1.0):
    valid = valid.astype(pred.dtype)
    return jnp.sum(jnp.abs(pred - target) * valid) / (
        jnp.maximum(jnp.sum(valid), 1.0) * axis_size_norm
    )


def segment_mel_l1(pred_mel: jnp.ndarray, gt_mel: jnp.ndarray) -> jnp.ndarray:
    """Plain mean L1 between vocoded-segment mel and GT-segment mel."""
    return jnp.mean(jnp.abs(pred_mel - gt_mel))


def prosody_losses(
    outputs: Dict[str, jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """Duration(log)/pitch/energy masked L1 (reference loss.py:147-185)."""
    input_lengths = outputs["input_lengths"]
    t_text = outputs["duration_targets"].shape[1]
    valid = sequence_mask(input_lengths, t_text)

    log_d_target = jnp.log(outputs["duration_targets"].astype(jnp.float32) + 1.0)
    dur_loss = masked_l1(outputs["log_duration_predictions"], log_d_target, valid)
    pitch_loss = masked_l1(outputs["pitch_predictions"], outputs["pitch_targets"], valid)
    energy_loss = masked_l1(
        outputs["energy_predictions"], outputs["energy_targets"], valid
    )
    return {
        "dur_loss": dur_loss,
        "pitch_loss": pitch_loss,
        "energy_loss": energy_loss,
    }


def alignment_losses(outputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    fs = forward_sum_loss(
        outputs["log_p_attn"], outputs["input_lengths"], outputs["output_lengths"]
    )
    return {"forwardsum_loss": fs, "bin_loss": outputs["bin_loss"]}
