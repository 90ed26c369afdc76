"""Tests for the Pallas TPU kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_em_tpu.models.unet import _instance_norm
from torch_em_tpu.ops.pallas.norm import instance_norm_pallas, supports_pallas_norm


class TestPallasInstanceNorm:
    @pytest.mark.parametrize("shape,dtype", [
        ((2, 32, 32, 32), "float32"),
        ((1, 8, 16, 16, 64), "bfloat16"),
        ((3, 16, 32, 128), "float32"),
        ((2, 64, 16, 16), "float32"),
    ])
    def test_matches_jnp_forward(self, shape, dtype):
        x = jnp.asarray((np.random.randn(*shape) * 3 + 1).astype(dtype))
        assert supports_pallas_norm(x.shape, x.dtype)
        ref = _instance_norm(x).astype(jnp.float32)
        out = instance_norm_pallas(x, interpret=True).astype(jnp.float32)
        tol = 5e-2 if dtype == "bfloat16" else 5e-6
        assert float(jnp.abs(out - ref).max()) < tol

    def test_matches_jnp_gradient(self):
        x = jnp.asarray((np.random.randn(2, 32, 32, 32) * 2 + 0.5).astype("float32"))
        w = jnp.arange(x.size, dtype=jnp.float32).reshape(x.shape) / x.size

        g_ref = jax.grad(lambda x: ((_instance_norm(x) ** 2) * w).sum())(x)
        g_pal = jax.grad(lambda x: ((instance_norm_pallas(x, interpret=True) ** 2) * w).sum())(x)
        rel = float(jnp.abs(g_ref - g_pal).max() / (jnp.abs(g_ref).max() + 1e-8))
        assert rel < 1e-4

    def test_support_gate(self):
        # channel counts that do not divide 128 fall back to the jnp path
        assert not supports_pallas_norm((1, 64, 64, 48), "float32")
        # slabs above the VMEM budget fall back
        assert not supports_pallas_norm((1, 512, 512, 64), "float32")
        # 2D tensors (no spatial axes) are unsupported
        assert not supports_pallas_norm((4, 128), "float32")

    def test_normalization_properties(self):
        x = jnp.asarray((np.random.randn(2, 32, 32, 16) * 7 - 3).astype("float32"))
        out = np.asarray(instance_norm_pallas(x, interpret=True))
        mean = out.mean(axis=(1, 2))
        std = out.std(axis=(1, 2))
        assert np.abs(mean).max() < 1e-4
        assert np.abs(std - 1).max() < 1e-3
