"""Style-encoder (SimBERT) pretraining: attribute classification.

Parity target: reference `simbert.py:76-115` (`StylePretrainLoss`,
`StylePretrainLoss2`, `flat_accuracy`). The reference ships only the
pretrained `checkpoint_163431` — the pretraining *script* is absent — but
the heads and losses define the task: per-prompt cross-entropy on the
pitch / speed / energy / emotion label vocabularies
(`data/youdao/text/{pitch,speed,energy,emotion}`).

TPU-first: one jitted step over the ('data',) mesh axis; the dropout PRNG
is threaded explicitly.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import optax


def style_pretrain_loss(
    outputs: Dict[str, jnp.ndarray], labels: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    """Cross-entropy per attribute head (reference StylePretrainLoss)."""
    losses = {}
    for attr in ("pitch", "speed", "energy", "emotion"):
        logits = outputs[f"{attr}_outputs"]
        losses[f"{attr}_loss"] = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels[attr]
        ).mean()
    return losses


def flat_accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """reference simbert.py:109-115."""
    return jnp.mean(jnp.argmax(logits, axis=-1) == labels)


def make_pretrain_step(model, learning_rate: float = 2e-5):
    opt = optax.adamw(learning_rate)

    @jax.jit
    def step(params, opt_state, rng, batch):
        rng, drop_rng = jax.random.split(rng)

        def loss_fn(p):
            out = model.apply(
                {"params": p},
                batch["input_ids"],
                batch.get("token_type_ids"),
                batch["attention_mask"],
                deterministic=False,
                rngs={"dropout": drop_rng},
            )
            losses = style_pretrain_loss(out, batch)
            total = sum(losses.values())
            accs = {
                f"{a}_acc": flat_accuracy(out[f"{a}_outputs"], batch[a])
                for a in ("pitch", "speed", "energy", "emotion")
            }
            return total, {**losses, **accs, "loss": total}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, metrics

    return step, opt


def pretrain(
    model,
    params,
    batches: Iterable[Dict[str, jnp.ndarray]],
    total_steps: int,
    learning_rate: float = 2e-5,
    log_every: int = 50,
    logger=None,
    seed: int = 0,
):
    """Run attribute-classification pretraining; returns final params."""
    step_fn, opt = make_pretrain_step(model, learning_rate)
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(seed)
    n = 0
    for batch in batches:
        params, opt_state, rng, metrics = step_fn(params, opt_state, rng, batch)
        n += 1
        if n % log_every == 0:
            line = {k: float(v) for k, v in metrics.items()}
            if logger is not None:
                logger.log(n, line, prefix="style_pretrain")
            else:
                print(f"step {n}: " + " ".join(
                    f"{k}={v:.4f}" for k, v in sorted(line.items())
                ))
        if n >= total_steps:
            break
    return params
