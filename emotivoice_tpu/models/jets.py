"""JETS joint model: PromptTTS acoustic model + HiFi-GAN generator.

Parity target: reference `models/prompt_tts_modified/jets.py:26-71`.
Training vocodes a random ``segment_size``-frame crop of the decoder output;
inference vocodes the full bucketed mel.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from emotivoice_tpu.config import EmotiVoiceConfig
from emotivoice_tpu.models.acoustic import PromptTTS
from emotivoice_tpu.models.hifigan import HiFiGANGenerator
from emotivoice_tpu.ops.segments import get_random_segments


class JETSGenerator(nn.Module):
    cfg: EmotiVoiceConfig
    use_pallas: bool = False  # fused vocoder MRF kernels (TPU only)
    use_s2d: bool = True  # measured space-to-depth MRF conv lowering (exact)
    # Whole-stage fused Pallas MRF kernel (inference-only, no VJP; see
    # HiFiGANGenerator.use_fused_stage). Off by default everywhere since
    # the r5 A/B (relayout-free s2d wins end-to-end; docs/PERFORMANCE.md).
    use_fused_stage: bool = False
    fused_interpret: bool = False  # CPU tests only
    # Compute dtype (e.g. jnp.bfloat16 for MXU inference). Params stay f32;
    # the waveform always leaves in f32. None = full f32 (training/parity).
    compute_dtype: Optional[Any] = None

    def setup(self):
        self.am = PromptTTS(self.cfg.am, dtype=self.compute_dtype)
        self.generator = HiFiGANGenerator(
            self.cfg.vocoder, use_pallas=self.use_pallas,
            use_s2d=self.use_s2d, use_fused_stage=self.use_fused_stage,
            fused_interpret=self.fused_interpret, dtype=self.compute_dtype,
        )

    @property
    def upsample_factor(self) -> int:
        return self.cfg.vocoder.upsample_factor

    def __call__(
        self,
        tokens: jnp.ndarray,
        text_lengths: jnp.ndarray,
        speaker: jnp.ndarray,
        style_embedding: jnp.ndarray,
        content_embedding: jnp.ndarray,
        *,
        mel_targets: Optional[jnp.ndarray] = None,
        feats_lengths: Optional[jnp.ndarray] = None,
        pitch_targets: Optional[jnp.ndarray] = None,
        energy_targets: Optional[jnp.ndarray] = None,
        max_frames: Optional[int] = None,
        alpha: float = 1.0,
        cut: bool = True,
        segment_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        outputs = self.am(
            tokens,
            text_lengths,
            speaker,
            style_embedding,
            content_embedding,
            mel_targets=mel_targets,
            feats_lengths=feats_lengths,
            pitch_targets=pitch_targets,
            energy_targets=energy_targets,
            max_frames=max_frames,
            alpha=alpha,
            deterministic=deterministic,
        )

        segment_size = self.cfg.train.segment_size
        if mel_targets is not None and cut:
            assert segment_rng is not None
            z, start_idxs = get_random_segments(
                segment_rng,
                outputs["dec_outputs"],
                outputs["output_lengths"],
                segment_size,
            )
            outputs["z_start_idxs"] = start_idxs
            outputs["segment_size"] = segment_size
        else:
            z = outputs["dec_outputs"]
            outputs["z_start_idxs"] = None
            outputs["segment_size"] = segment_size

        outputs["wav_predictions"] = self.generator(z)
        return outputs
