#!/usr/bin/env python
"""Measure the optimizer-apply cost: per-leaf Adam vs optax.flatten.

r4 finding (tools/exp_train_attrib.py): the full train step costs ~44 ms
MORE once the optimizer applies are not DCE'd (93.9 -> 137.8 ms f32), i.e.
the two Adam updates over ~350 small param leaves run at ~7% of HBM
speed-of-light — per-leaf fusions with per-shape layouts, not one streamed
elementwise pass. optax.flatten wraps the optimizer to operate on ONE
raveled vector (moments stored flat), turning the apply into a single
fused elementwise kernel over ~37 M elements.

Prints ms/update for both forms on a synthetic tree matching the
generator's leaf-size distribution, then the real improvement is measured
end-to-end by tools/bench_train.py --flat-opt.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=40)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.models.jets import JETSGenerator
    from emotivoice_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = EmotiVoiceConfig()
    rng = np.random.RandomState(0)
    b, t_text = 2, 8
    tokens = jnp.zeros((b, t_text), jnp.int32)
    model = JETSGenerator(cfg)
    params = model.init(
        jax.random.PRNGKey(0), tokens, jnp.full((b,), t_text, jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, cfg.am.bert_embedding)),
        jnp.zeros((b, cfg.am.bert_embedding)),
        max_frames=64,
    )["params"]
    n_leaves = len(jax.tree.leaves(params))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"# {n_leaves} leaves, {n_params/1e6:.1f}M params",
          file=sys.stderr, flush=True)
    grads = jax.tree.map(lambda x: 0.01 * jnp.ones_like(x), params)

    def timed(opt, tag):
        state = opt.init(params)

        @jax.jit
        def chain(params, state, grads):
            def body(carry, _):
                p, s = carry
                g = jax.tree.map(
                    lambda x: x * (1.0 + 1e-12 * p_sum(p)), grads
                )
                u, s = opt.update(g, s, p)
                p = optax.apply_updates(p, u)
                return (p, s), 0.0

            def p_sum(p):
                return jnp.sum(jax.tree.leaves(p)[0])

            (p, s), _ = jax.lax.scan(body, (params, state), None,
                                     length=args.iters)
            return jnp.sum(jax.tree.leaves(p)[0])

        float(chain(params, state, grads))
        t0 = time.perf_counter()
        float(chain(params, state, grads))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"# {tag}={ms:.2f}ms", file=sys.stderr, flush=True)
        return round(ms, 2)

    adam = lambda: optax.adam(1.25e-5, b1=0.5, b2=0.9)
    out = {
        "leaves": n_leaves,
        "params_m": round(n_params / 1e6, 1),
        "tree_ms": timed(adam(), "tree"),
        "flat_ms": timed(optax.flatten(adam()), "flat"),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
