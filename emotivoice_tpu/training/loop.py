"""Training loop: checkpointing, resume, validation, logging.

Parity target: reference `train_am_vocoder_joint.py:198-460` — checkpoint
scan/resume of `g_{step:08d}` / `do_{step:08d}` pairs, optional warm-start
from pretrained generator/discriminator, rank-0 tensorboard + text logging,
validation every `iters_per_validation`, checkpoints every
`iters_per_checkpoint`.

TPU-first: one process drives the whole mesh (no per-rank processes); state
is an Orbax-checkpointed pytree that restores models + both optimizers +
step + PRNG (the reference restores model/optim/step/epoch but not RNG,
train_am_vocoder_joint.py:255-267).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from emotivoice_tpu.config import EmotiVoiceConfig
from emotivoice_tpu.parallel.mesh import make_mesh
from emotivoice_tpu.parallel.multihost import global_batch
from emotivoice_tpu.training.step import (
    TrainState,
    init_train_state,
    make_parallel_train_step,
    shard_train_state,
)


class CheckpointManager:
    """Orbax-backed save/restore of the full TrainState."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: TrainState):
        import orbax.checkpoint as ocp

        self.mgr.save(step, args=ocp.args.StandardSave(state))
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state_template: TrainState) -> Optional[TrainState]:
        import orbax.checkpoint as ocp

        step = self.mgr.latest_step()
        if step is None:
            return None
        return self.mgr.restore(step, args=ocp.args.StandardRestore(state_template))


class MetricLogger:
    """Tensorboard + append-only text log (reference rank-0 logging,
    train_am_vocoder_joint.py:27-32,423-430)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.text_path = os.path.join(log_dir, "train_log.txt")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir)
        except Exception:
            self.tb = None

    def log(self, step: int, metrics: dict, prefix: str = "train"):
        # .6g keeps small values significant (lr=1.25e-5 must show its
        # per-epoch 0.999875 decay, which .5f would round to 0.00001)
        line = f"step={step} " + " ".join(
            f"{k}={float(v):.6g}" for k, v in sorted(metrics.items())
        )
        with open(self.text_path, "a") as f:
            f.write(line + "\n")
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f"{prefix}/{k}", float(v), step)


def train(
    cfg: EmotiVoiceConfig,
    batch_iter_fn: Callable[[], Iterable[dict]],
    output_dir: str,
    total_steps: int,
    steps_per_epoch: int = 1000,
    validate_fn: Optional[Callable[[TrainState, int], None]] = None,
    valid_batch_iter_fn: Optional[Callable[[], Iterable[dict]]] = None,
    mesh=None,
    example_batch: Optional[dict] = None,
    warm_start_fn: Optional[Callable[[TrainState], TrainState]] = None,
    log_every: int = 50,
):
    """Run joint AM+vocoder GAN training.

    batch_iter_fn: returns a fresh epoch iterator of collated numpy batches.
    valid_batch_iter_fn: like batch_iter_fn but over the held-out set; when
      given (and no explicit validate_fn), a default validation pass — losses
      + mel-comparison figure + sample audio to tensorboard, the reference's
      `validate()` every `iters_per_validation` steps
      (train_am_vocoder_joint.py:432-434) — is wired automatically.
    warm_start_fn: applied to the fresh state when no checkpoint exists —
      the reference's `--load_pretrained_model` warm start
      (train_am_vocoder_joint.py:269-276).
    """
    mesh = mesh or make_mesh()
    logger = MetricLogger(os.path.join(output_dir, "log"))
    ckpts = CheckpointManager(os.path.join(output_dir, "ckpt"))

    if example_batch is None:
        example_batch = next(iter(batch_iter_fn()))

    rng = jax.random.PRNGKey(cfg.train.seed)
    state, model, disc = init_train_state(
        cfg, rng, example_batch, steps_per_epoch
    )
    restored = ckpts.restore(state)
    if restored is not None:
        state = restored
        print(f"resumed from step {int(state.step)}")
    elif warm_start_fn is not None:
        state = warm_start_fn(state)
        print("warm-started from pretrained checkpoint")

    if validate_fn is None and valid_batch_iter_fn is not None:
        from emotivoice_tpu.training.validate import make_validate_fn

        validate_fn = make_validate_fn(cfg, model, valid_batch_iter_fn, logger)

    step_fn = make_parallel_train_step(
        cfg, model, disc, mesh, steps_per_epoch, state=state
    )
    state = shard_train_state(state, mesh, cfg)

    with mesh:
        if validate_fn is not None:
            # Warm validation pass before the hot loop: every eval-step
            # bucket shape compiles here, once, instead of stalling the
            # train loop at the first mid-run validation (observed 50x
            # steps_per_sec collapse at the post-validation window).
            validate_fn(state, int(state.step))
        t_start = time.time()
        t_paused = 0.0  # validation/checkpoint time, excluded from s/s
        while int(state.step) < total_steps:
            for batch in batch_iter_fn():
                # single-process: device_put with batch sharding; multi-host:
                # global array assembled from each host's local rows
                # (docs/MULTIHOST.md, parallel/multihost.py)
                sharded = global_batch(batch, mesh)
                state, metrics = step_fn(state, sharded)
                step = int(state.step)

                if step % log_every == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    # current LR (per-epoch exponential decay, reference
                    # ExponentialLR gamma=0.999875) so epoch-boundary decay
                    # is visible in the run evidence
                    metrics["lr"] = cfg.train.lr * (
                        cfg.train.lr_gamma_per_epoch
                        ** (step // steps_per_epoch)
                    )
                    metrics["epoch"] = step // steps_per_epoch
                    metrics["steps_per_sec"] = log_every / max(
                        time.time() - t_start - t_paused, 1e-6
                    )
                    t_start, t_paused = time.time(), 0.0
                    logger.log(step, metrics)
                if validate_fn and step % cfg.train.iters_per_validation == 0:
                    t0 = time.time()
                    validate_fn(state, step)
                    t_paused += time.time() - t0
                if step % cfg.train.iters_per_checkpoint == 0:
                    t0 = time.time()
                    ckpts.save(step, jax.device_get(state))
                    t_paused += time.time() - t0
                if step >= total_steps:
                    break
    ckpts.save(int(state.step), jax.device_get(state))
    return state
