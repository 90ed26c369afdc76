import numpy as np
import pytest

from torch_em_tpu.models import AnisotropicUNet, UNet2d, UNet3d


class TestUNet2d:
    def test_shape(self):
        model = UNet2d(in_channels=1, out_channels=2, depth=2, initial_features=4)
        x = np.random.rand(1, 1, 32, 32).astype("float32")
        out = model(x)
        assert out.shape == (1, 2, 32, 32)

    def test_multi_channel_input(self):
        model = UNet2d(in_channels=3, out_channels=1, depth=2, initial_features=4)
        out = model(np.random.rand(2, 3, 32, 32).astype("float32"))
        assert out.shape == (2, 1, 32, 32)

    def test_final_activation(self):
        model = UNet2d(in_channels=1, out_channels=1, depth=2, initial_features=4,
                       final_activation="Sigmoid")
        out = np.asarray(model(np.random.rand(1, 1, 32, 32).astype("float32")))
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_invalid_shape_raises(self):
        model = UNet2d(in_channels=1, out_channels=1, depth=3, initial_features=4)
        with pytest.raises(ValueError):
            model(np.random.rand(1, 1, 20, 20).astype("float32"))

    def test_side_outputs(self):
        model = UNet2d(in_channels=1, out_channels=2, depth=2, initial_features=4,
                       return_side_outputs=True)
        outs = model(np.random.rand(1, 1, 32, 32).astype("float32"))
        assert isinstance(outs, (list, tuple))
        assert len(outs) == 2
        assert outs[0].shape == (1, 2, 32, 32)  # full-res first
        assert outs[1].shape == (1, 2, 16, 16)

    def test_norms(self):
        for norm in ("InstanceNorm", "GroupNorm", "BatchNorm", None):
            model = UNet2d(in_channels=1, out_channels=1, depth=1, initial_features=4, norm=norm)
            out = model(np.random.rand(1, 1, 16, 16).astype("float32"))
            assert out.shape == (1, 1, 16, 16)

    def test_postprocessing(self):
        model = UNet2d(in_channels=1, out_channels=2, depth=1, initial_features=4,
                       postprocessing="affinities_to_boundaries2d")
        out = model(np.random.rand(1, 1, 16, 16).astype("float32"))
        assert out.shape == (1, 1, 16, 16)


class TestUNet3d:
    def test_shape(self):
        model = UNet3d(in_channels=1, out_channels=3, depth=2, initial_features=4)
        out = model(np.random.rand(1, 1, 16, 16, 16).astype("float32"))
        assert out.shape == (1, 3, 16, 16, 16)


class TestAnisotropicUNet:
    def test_anisotropic_scaling(self):
        model = AnisotropicUNet(
            in_channels=1, out_channels=2, scale_factors=[[1, 2, 2], [2, 2, 2]],
            initial_features=4, anisotropic_kernel=True,
        )
        out = model(np.random.rand(1, 1, 4, 32, 32).astype("float32"))
        assert out.shape == (1, 2, 4, 32, 32)

    def test_divisibility_check(self):
        model = AnisotropicUNet(
            in_channels=1, out_channels=1, scale_factors=[[1, 2, 2], [2, 2, 2]], initial_features=4,
        )
        with pytest.raises(ValueError):
            model(np.random.rand(1, 1, 3, 32, 32).astype("float32"))


class TestPackedExecution:
    """The width-packed TPU lowering must be numerically equivalent to the
    plain execution (models/unet.py W4_PACKING and the packed pool/norm)."""

    def test_packed_pool2x2(self):
        import jax
        import jax.numpy as jnp
        from torch_em_tpu.models import unet as um

        rs = np.random.RandomState(0)
        for p in (2, 4):
            c = 128 // p
            x = jnp.asarray(rs.rand(2, 8, 32, c), jnp.float32)
            xp = x.reshape(2, 8, 32 // p, p * c)
            ref = um._max_pool_reshape(x, (2, 2))
            got = um._unpack_w(um._pool2x2_packed(xp, p), p)
            assert float(jnp.max(jnp.abs(ref - got))) < 1e-6
            gref = jax.grad(lambda t: float_sum(um._max_pool_reshape(t, (2, 2))))(x)
            ggot = jax.grad(lambda t: float_sum(um._unpack_w(
                um._pool2x2_packed(t.reshape(2, 8, 32 // p, p * c), p), p)))(x)
            assert float(jnp.max(jnp.abs(gref - ggot))) < 1e-6

    def test_repack_roundtrip(self):
        import jax.numpy as jnp
        from torch_em_tpu.models import unet as um

        x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 32, 16), jnp.float32)
        for p1 in (1, 2, 4):
            for p2 in (1, 2, 4):
                a = x.reshape(2, 8, 32 // p1, p1 * 16)
                back = um._unpack_w(um._repack_w(a, p1, p2), p2)
                assert float(jnp.max(jnp.abs(back - x))) == 0.0

    def test_convblock_tuple_matches_concat(self):
        import jax
        import jax.numpy as jnp
        from torch_em_tpu.models import unet as um

        rs = np.random.RandomState(2)
        xa = jnp.asarray(rs.rand(1, 64, 64, 8), jnp.float32)
        xb = jnp.asarray(rs.rand(1, 64, 64, 8), jnp.float32)
        blk = um.ConvBlock(16, dim=2, norm="InstanceNorm")
        v = blk.init(jax.random.PRNGKey(0), (xa, xb))
        y_t = blk.apply(v, (xa, xb))
        y_c = blk.apply(v, jnp.concatenate([xa, xb], -1))
        assert float(jnp.max(jnp.abs(y_t - y_c))) < 1e-4
        # pre-packed input parts + packed output round-trip
        xp = xa.reshape(1, 64, 16, 32)
        y_p, pk = blk.apply(v, (xp, xb), in_pack=(4, 1), keep_packed=True)
        y_p = um._unpack_w(y_p, pk)
        assert float(jnp.max(jnp.abs(y_p - y_t))) < 1e-4

    def test_model_packed_matches_unpacked(self):
        import jax.numpy as jnp
        from torch_em_tpu.models import unet as um

        model = AnisotropicUNet(
            in_channels=1, out_channels=2, scale_factors=[[1, 2, 2], [2, 2, 2]],
            initial_features=8, anisotropic_kernel=True, seed=3,
        )
        x = np.random.RandomState(0).rand(1, 1, 4, 64, 64).astype("float32")
        try:
            um.W4_PACKING = True
            y1 = model(x)
            um.W4_PACKING = False
            y2 = model(x)
        finally:
            um.W4_PACKING = True
        assert float(jnp.max(jnp.abs(jnp.asarray(y1) - jnp.asarray(y2)))) < 1e-4


def float_sum(t):
    import jax.numpy as jnp
    return jnp.sum(jnp.sin(t))
