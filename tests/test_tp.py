"""Tensor-parallel ('model' mesh axis) correctness tests.

The reference has no TP (SURVEY.md §2.11); these tests verify that our
Megatron-style param sharding (parallel/sharding.py) both *actually
partitions* parameters across the model axis and produces the same training
step as the single-device graph.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from emotivoice_tpu.config import tiny_test_config
from emotivoice_tpu.parallel.mesh import make_mesh, shard_batch
from emotivoice_tpu.training.step import (
    init_train_state,
    make_parallel_train_step,
    make_train_step,
    shard_train_state,
    train_state_shardings,
)


def _make_batch(cfg, b=4, t_text=12, t_feats=32, seed=0):
    up = cfg.vocoder.upsample_factor
    rng = np.random.RandomState(seed)
    return {
        "tokens": jnp.asarray(
            rng.randint(0, cfg.am.n_vocab, (b, t_text)), jnp.int32
        ),
        "text_lengths": jnp.full((b,), t_text, jnp.int32),
        "speaker": jnp.zeros((b,), jnp.int32),
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


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    batch = _make_batch(cfg)
    state, model, disc = init_train_state(cfg, jax.random.PRNGKey(0), batch)
    return cfg, batch, state, model, disc


class TestShardingSpecs:
    def test_vocoder_and_attention_params_are_partitioned(self, setup):
        cfg, batch, state, model, disc = setup
        mesh = make_mesh(jax.devices()[:8], model_parallel_size=2)
        sh = train_state_shardings(state, mesh, cfg)

        def spec(tree, *path):
            node = tree
            for p in path:
                node = node[p]
            return node.spec

        # conv_pre column-parallel on output channels
        s = spec(sh.g_params, "generator", "conv_pre", "v")
        assert s[0] == cfg.mesh.model_axis
        # tconv output dim
        s = spec(sh.g_params, "generator", "ups_0", "v")
        assert s[1] == cfg.mesh.model_axis
        # resblock pair: convs1 column / convs2 row
        s1 = spec(sh.g_params, "generator", "resblocks_0", "convs1_0", "v")
        s2 = spec(sh.g_params, "generator", "resblocks_0", "convs2_0", "v")
        assert s1[0] == cfg.mesh.model_axis and s2[1] == cfg.mesh.model_axis
        # attention head-parallel qkv, row-parallel out
        enc = sh.g_params["am"]["encoder"]["layer_0"]["self_attn"]
        assert enc["linear_q"]["kernel"].spec[1] == cfg.mesh.model_axis
        assert enc["linear_out"]["kernel"].spec[0] == cfg.mesh.model_axis
        # optimizer moments mirror the param shardings
        mu = jax.tree_util.tree_leaves(sh.opt_g, is_leaf=lambda x: None)
        assert mu  # opt state has shardings too (smoke)

    def test_divisibility_guard_replicates(self, setup):
        cfg, batch, state, model, disc = setup
        # 3-way model axis cannot divide the power-of-two channel counts
        if len(jax.devices()) < 6:
            pytest.skip("needs 6 devices")
        mesh = make_mesh(jax.devices()[:6], model_parallel_size=3)
        sh = train_state_shardings(state, mesh, cfg)
        s = sh.g_params["generator"]["conv_pre"]["v"].spec
        assert all(a is None for a in s)

    def test_params_physically_sharded(self, setup):
        cfg, batch, state, model, disc = setup
        mesh = make_mesh(jax.devices()[:8], model_parallel_size=2)
        sharded = shard_train_state(state, mesh, cfg)
        v = sharded.g_params["generator"]["conv_pre"]["v"]
        shard = v.addressable_shards[0]
        assert shard.data.shape[0] * 2 == v.shape[0]  # half per model shard


class TestTPEquivalence:
    def test_tp_step_matches_single_device(self, setup):
        cfg, batch, state, model, disc = setup

        # Single-device baseline
        base_step = jax.jit(make_train_step(cfg, model, disc))
        base_state, base_metrics = base_step(state, batch)

        # 8-device mesh, data=4 x model=2, genuinely partitioned params
        mesh = make_mesh(jax.devices()[:8], model_parallel_size=2)
        tp_step = make_parallel_train_step(cfg, model, disc, mesh, state=state)
        tp_state = shard_train_state(state, mesh, cfg)
        with mesh:
            tp_state, tp_metrics = tp_step(tp_state, shard_batch(batch, mesh))

        for k in base_metrics:
            np.testing.assert_allclose(
                float(base_metrics[k]), float(tp_metrics[k]),
                rtol=2e-3, atol=2e-4, err_msg=k,
            )
        # Updated params agree leaf-by-leaf. Tolerance note: the mesh step
        # reduces gradients in a different order, so a leaf whose true
        # gradient is fp-cancellation noise (|g| ~ 1e-8) can flip sign
        # between the two runs; Adam's bias-corrected first step saturates
        # to lr * g/(|g|+eps) = +/-lr for any such g, so two runs may
        # legitimately differ by up to 2*lr on noise-gradient leaves
        # (observed: one 16-wide bias at 2.0018e-5 with lr=1.25e-5).
        # Real TP math errors show up orders of magnitude above this.
        atol = 2.5 * cfg.train.lr
        flat_a, _ = jax.tree_util.tree_flatten_with_path(
            jax.device_get(base_state.g_params)
        )
        flat_b, _ = jax.tree_util.tree_flatten_with_path(
            jax.device_get(tp_state.g_params)
        )
        for (pa, a), (_, b) in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                a, b, rtol=1e-3, atol=atol,
                err_msg=jax.tree_util.keystr(pa),
            )


class TestMultihostHelpers:
    """Single-process behavior of the multi-host runtime helpers
    (parallel/multihost.py); the multi-process path uses the same
    PartitionSpec via jax.make_array_from_process_local_data."""

    def test_shard_datalist_partitions_disjointly(self):
        from emotivoice_tpu.parallel.multihost import shard_datalist

        items = list(range(10))
        shards = [shard_datalist(items, i, 3) for i in range(3)]
        assert sorted(sum(shards, [])) == items
        assert all(
            not (set(a) & set(b))
            for i, a in enumerate(shards)
            for b in shards[i + 1:]
        )

    def test_global_batch_single_process_matches_shard_batch(self, setup):
        from emotivoice_tpu.parallel.multihost import (
            global_batch,
            initialize_multihost,
        )

        pi, pc = initialize_multihost()  # no-op single process
        assert (pi, pc) == (0, 1)

        cfg, batch, state, model, disc = setup
        mesh = make_mesh(jax.devices()[:8], model_parallel_size=2)
        ours = global_batch(batch, mesh)
        ref = shard_batch(batch, mesh)
        for k in batch:
            np.testing.assert_array_equal(
                np.asarray(ours[k]), np.asarray(ref[k])
            )
            assert ours[k].sharding == ref[k].sharding
