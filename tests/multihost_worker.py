"""Subprocess worker for test_multihost.py: one jitted GAN train step on a
global mesh, launched once per process.

Mirrors the reference's actually-executed distributed path (torchrun spawns
N processes, `train_am_vocoder_joint.py:203,281-282`): here each process
contributes its local CPU devices to one `jax.distributed` runtime, takes a
disjoint datalist shard, assembles the global batch with
`jax.make_array_from_process_local_data` (parallel/multihost.py:85-90), and
runs one data-parallel train step. Process 0 prints the metrics as JSON;
the parent test asserts the 2-process run matches the 1-process run.

Not a pytest file — invoked by tests/test_multihost.py.
"""

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--local-devices", type=int, default=2)
    args = ap.parse_args()

    # Env must be set before jax initializes any backend.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    flags += f" --xla_force_host_platform_device_count={args.local_devices}"
    for f in (
        "--xla_cpu_collective_call_warn_stuck_timeout_seconds=300",
        "--xla_cpu_collective_call_terminate_timeout_seconds=1800",
    ):
        if f.split("=")[0] not in flags:
            flags += " " + f
    os.environ["XLA_FLAGS"] = flags.strip()
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from emotivoice_tpu.config import tiny_test_config
    from emotivoice_tpu.parallel.mesh import make_mesh
    from emotivoice_tpu.parallel.multihost import (
        global_batch,
        initialize_multihost,
        shard_datalist,
    )
    from emotivoice_tpu.training.step import (
        init_train_state,
        make_parallel_train_step,
    )

    pi, pc = initialize_multihost(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert pc == args.num_processes, (pc, args.num_processes)
    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, (len(jax.devices()), n_global)
    assert len(jax.local_devices()) == args.local_devices

    cfg = tiny_test_config()
    up = cfg.vocoder.upsample_factor
    b_global, t_text, t_feats = n_global, 12, 32

    # Deterministic global dataset: every process derives the same rows from
    # the seed, then keeps only its shard_datalist slice (row i lives on
    # process i % pc — the same disjoint split the training loop uses).
    rng = np.random.RandomState(0)
    rows = []
    for i in range(b_global):
        rows.append({
            "tokens": rng.randint(0, cfg.am.n_vocab, (t_text,)).astype(np.int32),
            "text_lengths": np.int32(t_text),
            "speaker": np.int32(0),
            "style_embedding": rng.randn(cfg.am.bert_embedding).astype(np.float32),
            "content_embedding": rng.randn(cfg.am.bert_embedding).astype(np.float32),
            "mel": rng.randn(t_feats, cfg.am.n_mels).astype(np.float32),
            "mel_lengths": np.int32(t_feats),
            "pitch": rng.randn(t_feats).astype(np.float32),
            "energy": rng.randn(t_feats).astype(np.float32),
            "wav": (0.1 * rng.randn(t_feats * up)).astype(np.float32),
        })
    # shard_datalist is the training-time split (strided, disjoint).
    strided = shard_datalist(rows)
    assert len(strided) == b_global // pc
    # For the cross-run equivalence assertion the batch uses contiguous
    # blocks instead: make_array_from_process_local_data is layout-driven
    # (process i's devices hold global rows [i*n_local, ...)), and the train
    # step's per-row segment RNG makes metrics sensitive to row order.
    # Training itself is order-independent; this test must not be.
    n_local = b_global // pc
    local_rows = rows[pi * n_local : (pi + 1) * n_local]
    local_batch = {
        k: np.stack([r[k] for r in local_rows]) for k in rows[0]
    }

    # Init on host-identical values (same PRNGKey on every process), then a
    # mesh over ALL global devices; global_batch exercises
    # make_array_from_process_local_data when pc > 1.
    example = {k: np.stack([r[k] for r in rows[:2]]) for k in rows[0]}
    state, model, disc = init_train_state(cfg, jax.random.PRNGKey(0), example)
    mesh = make_mesh(jax.devices())
    batch = global_batch(local_batch, mesh, cfg.mesh.data_axis)
    assert batch["tokens"].shape[0] == b_global

    step = make_parallel_train_step(cfg, model, disc, mesh, state=state)
    with mesh:
        state, metrics = step(state, batch)
    metrics = {k: float(v) for k, v in metrics.items()}
    # One param fingerprint so the test also compares updated weights.
    leaf = jax.device_get(
        state.g_params["generator"]["conv_pre"]["v"]
    )
    metrics["_param_fp"] = float(np.abs(leaf).sum())

    if pi == 0:
        print("METRICS " + json.dumps(metrics), flush=True)


if __name__ == "__main__":
    main()
