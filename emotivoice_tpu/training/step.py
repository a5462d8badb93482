"""Jitted joint AM+vocoder GAN training step.

Parity target: the hot loop of reference `train_am_vocoder_joint.py:315-420`:
alternating D-step / G-step with two Adam optimizers (lr 1.25e-5, betas
(0.5, 0.9)), per-epoch ExponentialLR gamma=0.999875, loss weights mel x45 /
dur x1 / pitch x1 / energy x1 / forward-sum x2 / bin x2 / adv x1 / fm x1,
and the D update applied *before* the G adversarial pass (reference lines
375-418).

The whole step — including alignment (MAS), beta-binomial prior, CTC
forward-sum, random segment cropping and both mel extractions — is one XLA
computation with zero host syncs, unlike the reference's per-step
scipy/numba CPU round-trips.

Sharding: `make_parallel_train_step` wraps the step in jax.jit with
NamedSharding constraints — batch over the 'data' mesh axis, params
replicated; gradient all-reduce is inserted by XLA (the DDP/NCCL equivalent,
reference train_am_vocoder_joint.py:281-282).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from emotivoice_tpu.config import EmotiVoiceConfig
from emotivoice_tpu.models.hifigan import (
    Discriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from emotivoice_tpu.models.jets import JETSGenerator
from emotivoice_tpu.ops.mel import mel_spectrogram
from emotivoice_tpu.ops.segments import get_segments
from emotivoice_tpu.training.losses import (
    alignment_losses,
    prosody_losses,
    segment_mel_l1,
)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    d_spectral: Any  # spectral-norm power-iteration state
    opt_g: Any
    opt_d: Any
    rng: jax.Array


def make_optimizers(cfg: EmotiVoiceConfig, steps_per_epoch: int = 1000):
    """Two Adam optimizers with per-epoch exponential LR decay
    (reference train_am_vocoder_joint.py:284-294)."""
    t = cfg.train

    def schedule(step):
        epoch = step // steps_per_epoch
        return t.lr * (t.lr_gamma_per_epoch ** epoch)

    def adam():
        return optax.adam(
            learning_rate=schedule, b1=t.betas[0], b2=t.betas[1], eps=t.eps
        )

    return adam(), adam()


def init_train_state(
    cfg: EmotiVoiceConfig,
    rng: jax.Array,
    example_batch: Dict[str, jnp.ndarray],
    steps_per_epoch: int = 1000,
    compute_dtype: Optional[Any] = None,
) -> Tuple[TrainState, JETSGenerator, Discriminator]:
    """compute_dtype=jnp.bfloat16 runs generator + discriminator compute in
    bf16 with f32 master params, f32 conv/matmul accumulation and f32
    losses (LSGAN needs no loss scaling: activations/outputs are O(1) and
    grads flow to f32 leaves). Measured on v5e: tools/exp_train_attrib.py."""
    model = JETSGenerator(cfg, compute_dtype=compute_dtype)
    disc = Discriminator(cfg.disc, dtype=compute_dtype)
    rng, g_rng, d_rng, seg_rng = jax.random.split(rng, 4)

    g_vars = model.init(
        g_rng,
        example_batch["tokens"],
        example_batch["text_lengths"],
        example_batch["speaker"],
        example_batch["style_embedding"],
        example_batch["content_embedding"],
        mel_targets=example_batch["mel"],
        feats_lengths=example_batch["mel_lengths"],
        pitch_targets=example_batch["pitch"],
        energy_targets=example_batch["energy"],
        segment_rng=seg_rng,
    )
    seg_len = cfg.train.segment_size * cfg.vocoder.upsample_factor
    dummy_wav = jnp.zeros((example_batch["tokens"].shape[0], seg_len))
    d_vars = disc.init(d_rng, dummy_wav, dummy_wav)

    opt_g, opt_d = make_optimizers(cfg, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        d_params=d_vars["params"],
        d_spectral=d_vars["spectral"],
        opt_g=opt_g.init(g_vars["params"]),
        opt_d=opt_d.init(d_vars["params"]),
        rng=rng,
    )
    return state, model, disc


def make_train_step(
    cfg: EmotiVoiceConfig,
    model: JETSGenerator,
    disc: Discriminator,
    steps_per_epoch: int = 1000,
):
    t = cfg.train
    a = cfg.audio
    up = cfg.vocoder.upsample_factor
    opt_g, opt_d = make_optimizers(cfg, steps_per_epoch)

    def seg_mel(wav):
        m = mel_spectrogram(
            wav, a.sampling_rate, a.n_fft, a.hop_length, a.win_length, a.n_mels,
            a.fmin, a.fmax, loss_mode=True,
        )
        return jnp.swapaxes(m, -1, -2)  # (B, frames, n_mels)

    def generator_forward(g_params, batch, seg_rng, dropout_rng):
        return model.apply(
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
            segment_rng=seg_rng,
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng, seg_rng, drop_rng = jax.random.split(state.rng, 3)

        # ---- Generator forward (no grad) for the D step -------------------
        # Same (seg_rng, drop_rng) as the G-loss forward below: the reference
        # runs ONE generator forward and reuses it for both the D and G passes
        # (train_am_vocoder_joint.py:332-343,377-393). Making the two apply()
        # calls structurally identical both restores those semantics (D is
        # updated against the same dropout sample of the fake waveform that
        # G's adversarial loss uses) and lets XLA CSE merge the duplicate
        # forward (verified: see docs/PERFORMANCE.md training section).
        out_nograd = generator_forward(state.g_params, batch, seg_rng, drop_rng)
        y_hat = jax.lax.stop_gradient(out_nograd["wav_predictions"])
        y = get_segments(
            batch["wav"], out_nograd["z_start_idxs"] * up, t.segment_size * up
        )

        # ---- D step -------------------------------------------------------
        def d_loss_fn(d_params, spectral):
            (ro, fo, _, _), new_vars = disc.apply(
                {"params": d_params, "spectral": spectral},
                y,
                y_hat,
                update_stats=True,
                mutable=["spectral"],
            )
            return discriminator_loss(ro, fo), new_vars["spectral"]

        (d_loss, new_spectral), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params, state.d_spectral)
        d_updates, new_opt_d = opt_d.update(d_grads, state.opt_d, state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G step (uses the *updated* D, reference lines 392-418) -------
        def g_loss_fn(g_params):
            out = generator_forward(g_params, batch, seg_rng, drop_rng)
            y_hat_g = out["wav_predictions"]
            y_hat_mel = seg_mel(y_hat_g)
            y_mel = seg_mel(y)

            (ro, fo, rf, ff), _ = disc.apply(
                {"params": new_d_params, "spectral": new_spectral},
                y,
                y_hat_g,
                update_stats=False,
                mutable=["spectral"],
            )
            mel_loss = segment_mel_l1(y_hat_mel, y_mel)
            pros = prosody_losses(out)
            align = alignment_losses(out)
            adv = generator_loss(fo)
            fm = feature_loss(rf, ff)
            total = (
                t.w_mel * mel_loss
                + t.w_dur * pros["dur_loss"]
                + t.w_pitch * pros["pitch_loss"]
                + t.w_energy * pros["energy_loss"]
                + t.w_forwardsum * align["forwardsum_loss"]
                + t.w_bin * align["bin_loss"]
                + t.w_adv * adv
                + t.w_fm * fm
            )
            metrics = {
                "mel_loss": mel_loss,
                "adv_loss": adv,
                "fm_loss": fm,
                **pros,
                **align,
            }
            return total, metrics

        (g_loss, metrics), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params
        )
        g_updates, new_opt_g = opt_g.update(g_grads, state.opt_g, state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)

        metrics.update(g_loss=g_loss, d_loss=d_loss)
        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params,
            d_params=new_d_params,
            d_spectral=new_spectral,
            opt_g=new_opt_g,
            opt_d=new_opt_d,
            rng=rng,
        )
        return new_state, metrics

    return train_step


def train_state_shardings(state: TrainState, mesh: Mesh, cfg: EmotiVoiceConfig):
    """NamedSharding tree for the full TrainState.

    Params (and their optax moments, which mirror the param paths) get the
    Megatron-style 'model'-axis specs from parallel.sharding; scalars, rng,
    spectral-norm state and everything unmatched stay replicated. With a
    model axis of size 1 this degenerates to pure replication (pure DP).
    """
    from emotivoice_tpu.parallel.sharding import tree_shardings

    return tree_shardings(state, mesh, cfg.mesh.model_axis)


def shard_train_state(
    state: TrainState, mesh: Mesh, cfg: EmotiVoiceConfig
) -> TrainState:
    """Place a (host / single-device) TrainState onto the mesh layout."""
    return jax.device_put(state, train_state_shardings(state, mesh, cfg))


def make_parallel_train_step(
    cfg: EmotiVoiceConfig,
    model: JETSGenerator,
    disc: Discriminator,
    mesh: Mesh,
    steps_per_epoch: int = 1000,
    state: Optional[TrainState] = None,
):
    """jit the train step over a mesh.

    Batch shards over the 'data' axis (gradient all-reduce inserted by XLA —
    the DDP/NCCL equivalent). When ``state`` is passed and the mesh has a
    'model' axis of size > 1, parameters + optimizer moments are genuinely
    partitioned over it (tensor parallelism — vocoder channels, attention
    heads; see parallel/sharding.py); otherwise the state replicates.
    """
    step_fn = make_train_step(cfg, model, disc, steps_per_epoch)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(cfg.mesh.data_axis))
    state_sh = (
        train_state_shardings(state, mesh, cfg) if state is not None else repl
    )

    return jax.jit(
        step_fn,
        in_shardings=(state_sh, data),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
