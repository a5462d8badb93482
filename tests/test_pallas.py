"""Pallas kernel correctness tests (interpret mode on CPU, real on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from emotivoice_tpu.ops.pallas.resblock import (
    fused_residual_unit,
    fused_residual_unit_reference,
)


def _interpret():
    return jax.devices()[0].platform != "tpu"


class TestFusedResidualUnit:
    @pytest.mark.parametrize("k,d", [(3, 1), (3, 5), (7, 3)])
    def test_matches_xla_reference(self, k, d):
        from jax.experimental import pallas as pl
        from emotivoice_tpu.ops.pallas import resblock as rb

        rng = np.random.RandomState(0)
        b, t, c = 2, 512, 16
        x = jnp.asarray(rng.randn(b, t, c).astype(np.float32)) * 0.3
        w1 = jnp.asarray(rng.randn(k, c, c).astype(np.float32)) * 0.1
        w2 = jnp.asarray(rng.randn(k, c, c).astype(np.float32)) * 0.1
        b1 = jnp.asarray(rng.randn(c).astype(np.float32)) * 0.01
        b2 = jnp.asarray(rng.randn(c).astype(np.float32)) * 0.01

        want = fused_residual_unit_reference(x, w1, b1, w2, b2, k, d)
        if _interpret():
            # run the pallas_call in interpreter mode by monkeypatching
            import functools as ft

            orig = pl.pallas_call
            try:
                pl.pallas_call = ft.partial(orig, interpret=True)
                got = fused_residual_unit.__wrapped__(x, w1, b1, w2, b2, k, d, 128)
            finally:
                pl.pallas_call = orig
        else:
            got = fused_residual_unit(x, w1, b1, w2, b2, k, d, 128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
