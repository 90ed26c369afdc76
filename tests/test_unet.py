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


@pytest.mark.slow
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

    def test_pack_factor_power_of_two(self):
        # Regression: 33 <= c_out <= 42 used to yield p=3, which the packed
        # even/odd pooling helpers cannot represent (channels were dropped).
        from torch_em_tpu.models import unet as um

        for c in range(1, 200):
            p = um._pack_factor(c)
            assert p in (1, 2, 4), (c, p)
            assert p * c <= 128 or p == 1

    def test_p3_band_model_runs(self):
        # initial_features=36 lands in the old p=3 band; the model must both
        # run and match its unpacked execution.
        import jax.numpy as jnp
        from torch_em_tpu.models import unet as um
        from torch_em_tpu.models import UNet2d

        model = UNet2d(in_channels=1, out_channels=2, initial_features=36,
                       depth=2, norm=None, seed=7)
        x = np.random.RandomState(5).rand(1, 1, 64, 64).astype("float32")
        try:
            um.W4_PACKING = True
            y1 = model(x)
            um.W4_PACKING = False
            y2 = model(x)
        finally:
            um.W4_PACKING = True
        assert y1.shape == (1, 2, 64, 64)
        assert float(jnp.max(jnp.abs(jnp.asarray(y1) - jnp.asarray(y2)))) < 1e-4

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


@pytest.mark.slow
class TestPhaseWpad:
    """PHASE_WPAD (dead-column W padding of the shifted grid, keeping the
    8-sublane tiling) must be exactly equivalent to the unpadded phase
    lowering — forward and gradients, fold and non-fold norm branches."""

    def _block_case(self, norm_fold):
        import jax
        import jax.numpy as jnp
        from torch_em_tpu.models import unet as um

        rs = np.random.RandomState(3)
        # W=66 -> Wb=33 -> shifted W=34 -> e=6 (a real dead-column case)
        x = jnp.asarray(rs.rand(1, 64, 66, 8), jnp.float32)
        blk = um.ConvBlock(32, dim=2, norm="InstanceNorm")
        with um.perf_options(phase_wpad=False, norm_fold=norm_fold):
            v = blk.init(jax.random.PRNGKey(0), x)
            y_ref = blk.apply(v, x)
            g_ref = jax.grad(lambda p: float_sum(jnp.tanh(blk.apply({"params": p["params"]}, x))))(v)
        with um.perf_options(phase_wpad=True, norm_fold=norm_fold):
            y_pad = blk.apply(v, x)
            g_pad = jax.grad(lambda p: float_sum(jnp.tanh(blk.apply({"params": p["params"]}, x))))(v)
        assert y_ref.shape == y_pad.shape
        assert float(jnp.max(jnp.abs(y_ref - y_pad))) < 1e-5
        # the padded lowering reassociates the f32 conv reductions (different
        # tiling), so gradients of magnitude O(50) differ by O(1e-4); a logic
        # bug in the dead-column handling shows as O(0.1+) errors
        for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pad)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3)

    def test_block_equivalence_fold(self):
        self._block_case(norm_fold=True)

    def test_block_equivalence_nofold(self):
        self._block_case(norm_fold=False)

    def test_unet_equivalence(self):
        import jax
        import jax.numpy as jnp
        from torch_em_tpu.models import UNet2d
        from torch_em_tpu.models import unet as um

        x = np.random.RandomState(4).rand(1, 1, 128, 136).astype("float32")
        with um.perf_options(phase_wpad=False):
            m = UNet2d(in_channels=1, out_channels=1, depth=2, initial_features=32,
                       final_activation="Sigmoid", seed=0)
            y_ref = np.asarray(m(x))
        with um.perf_options(phase_wpad=True):
            m2 = UNet2d(in_channels=1, out_channels=1, depth=2, initial_features=32,
                        final_activation="Sigmoid", seed=0)
            m2.replace_variables(m.variables)
            y_pad = np.asarray(m2(x))
        np.testing.assert_allclose(y_pad, y_ref, atol=2e-5)


class TestPerfOptions:
    def test_context_manager_restores(self):
        from torch_em_tpu.models import unet as um
        from torch_em_tpu.models.unet import perf_options

        before = (um.W4_PACKING, um.PALLAS_NORM, um.PACKED_CONV_MODE)
        with perf_options(packing=False, pallas_norm=False, packed_conv_mode="core"):
            assert um.W4_PACKING is False
            assert um.PALLAS_NORM is False
            assert um.PACKED_CONV_MODE == "core"
        assert (um.W4_PACKING, um.PALLAS_NORM, um.PACKED_CONV_MODE) == before

    def test_packed_conv_modes_equivalent(self):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models import unet as um

        rng = np.random.default_rng(5)
        for p in (2, 4):
            ci, co = 8, 8
            x = jnp.asarray(rng.standard_normal((1, 8, 16, ci)).astype("float32"))
            k = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype("float32") * 0.1)
            xp = x.reshape(1, 8, 16 // p, p * ci)
            with um.perf_options(packed_conv_mode="dense3"):
                yd = um._conv_packed(xp, k, p)
            with um.perf_options(packed_conv_mode="core"):
                yc = um._conv_packed(xp, k, p)
            np.testing.assert_allclose(np.asarray(yd), np.asarray(yc), atol=1e-4)
            # both match the plain conv
            ref = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
            np.testing.assert_allclose(np.asarray(yd).reshape(1, 8, 16, co),
                                       np.asarray(ref), atol=1e-4)

    def test_resize2x_custom_vjp_matches_ad(self):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models.unet import _resize2x_linear

        x = jnp.asarray(np.random.default_rng(0).random((2, 9, 6, 3)).astype("float32"))
        for factor in ((2, 2), (1, 2)):
            ref_fn = lambda a: jax.image.resize(
                a, (a.shape[0], a.shape[1] * factor[0], a.shape[2] * factor[1], a.shape[3]),
                "linear")
            g = jnp.asarray(np.random.default_rng(1).random(
                (2, 9 * factor[0], 6 * factor[1], 3)).astype("float32"))
            _, vjp_ref = jax.vjp(ref_fn, x)
            _, vjp_new = jax.vjp(lambda a: _resize2x_linear(a, factor), x)
            np.testing.assert_allclose(np.asarray(vjp_new(g)[0]), np.asarray(vjp_ref(g)[0]),
                                       atol=1e-5)


class TestInstanceNormTrackStats:
    def test_torch_semantics(self):
        """Matches torch InstanceNorm2d(affine=True, track_running_stats=True):
        train normalizes per instance + accumulates running stats; eval uses them."""
        torch = pytest.importorskip("torch")
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models.unet import _InstanceNormTrackStats

        C = 5
        tn = torch.nn.InstanceNorm2d(C, affine=True, track_running_stats=True)
        with torch.no_grad():
            tn.weight.normal_()
            tn.bias.normal_()

        m = _InstanceNormTrackStats()
        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((2, C, 12, 10)).astype("float32")
        state = m.init(jax.random.PRNGKey(0), jnp.asarray(x0.transpose(0, 2, 3, 1)), train=True)
        state["params"]["scale"] = jnp.asarray(tn.weight.detach().numpy())
        state["params"]["bias"] = jnp.asarray(tn.bias.detach().numpy())

        for i in range(3):
            x = rng.standard_normal((2, C, 12, 10)).astype("float32") * (i + 1) + i
            tn.train()
            yt = tn(torch.from_numpy(x)).detach().numpy()
            yj, upd = m.apply(state, jnp.asarray(x.transpose(0, 2, 3, 1)), train=True,
                              mutable=["batch_stats"])
            state = {"params": state["params"], **upd}
            np.testing.assert_allclose(np.asarray(yj).transpose(0, 3, 1, 2), yt, atol=1e-5)

        np.testing.assert_allclose(np.asarray(state["batch_stats"]["mean"]),
                                   tn.running_mean.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(state["batch_stats"]["var"]),
                                   tn.running_var.numpy(), atol=1e-5)

        tn.eval()
        x = rng.standard_normal((2, C, 12, 10)).astype("float32")
        yt = tn(torch.from_numpy(x)).detach().numpy()
        yj = m.apply(state, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        np.testing.assert_allclose(np.asarray(yj).transpose(0, 3, 1, 2), yt, atol=1e-5)

    def test_unet_with_track_stats_trains(self):
        from torch_em_tpu.models import UNet2d

        model = UNet2d(in_channels=1, out_channels=1, initial_features=4, depth=2,
                       norm="InstanceNormTrackStats")
        x = np.random.rand(2, 1, 32, 32).astype("float32")
        out = model(x)
        assert np.asarray(out).shape == (2, 1, 32, 32)
        assert "batch_stats" in model.variables

    def test_shift2_packed_conv_equivalent(self):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models import unet as um

        rng = np.random.default_rng(7)
        for p in (2, 4):
            ci, co = 8, 8
            x = jnp.asarray(rng.standard_normal((1, 8, 16, ci)).astype("float32"))
            k = jnp.asarray(rng.standard_normal((3, 3, ci, co)).astype("float32") * 0.1)
            xp = x.reshape(1, 8, 16 // p, p * ci)
            ref = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
            with um.perf_options(packed_conv_mode="shift2"):
                ys = um._conv_packed(xp, k, p).reshape(1, 8, 16, co)
            np.testing.assert_allclose(np.asarray(ys), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
class TestPhaseExecution:
    """The 2x2 shifted-phase lowering (models/unet.py PHASE_PACKING: p=4
    levels run as phase-alternating 2x2 convs at 1.78x nominal executed
    FLOPs instead of dense3's 4x) must be numerically equivalent to the
    other lowerings — including the masked-statistics InstanceNorm on the
    shifted grid and the phase-emitting decoder upsampler."""

    def _forward(self, model_fn, x, phase, pack=True):
        from torch_em_tpu.models import unet as um

        with um.perf_options(phase_packing=phase, packing=pack):
            return np.asarray(model_fn()(x))

    def test_unet2d_phase_matches_plain(self):
        from torch_em_tpu.models import UNet2d

        x = np.random.RandomState(0).rand(1, 1, 128, 128).astype("float32")
        mk = lambda: UNet2d(in_channels=1, out_channels=2, depth=2,
                            initial_features=32, final_activation="Sigmoid", seed=7)
        out_phase = self._forward(mk, x, True)
        out_plain = self._forward(mk, x, False, pack=False)
        np.testing.assert_allclose(out_phase, out_plain, atol=2e-5)

    def test_unet2d_phase_no_norm(self):
        from torch_em_tpu.models import UNet2d

        x = np.random.RandomState(1).rand(1, 1, 64, 64).astype("float32")
        mk = lambda: UNet2d(in_channels=1, out_channels=1, depth=1,
                            initial_features=32, norm=None, seed=2)
        np.testing.assert_allclose(
            self._forward(mk, x, True), self._forward(mk, x, False), atol=2e-5)

    def test_anisotropic_25d_phase(self):
        from torch_em_tpu.models import AnisotropicUNet

        x = np.random.RandomState(2).rand(1, 1, 4, 128, 128).astype("float32")
        mk = lambda: AnisotropicUNet(in_channels=1, out_channels=1,
                                     initial_features=32,
                                     scale_factors=[[1, 2, 2], [2, 2, 2]],
                                     final_activation="Sigmoid",
                                     anisotropic_kernel=True, seed=3)
        np.testing.assert_allclose(
            self._forward(mk, x, True), self._forward(mk, x, False), atol=2e-5)

    def test_gradients_match(self):
        """Gradient agreement at the cross-lowering noise level (the trusted
        wpack-vs-plain pair shows the same ~2e-5 max abs deviation on this
        fixture, so the tolerance reflects f32 accumulation-order noise, not
        an approximation)."""
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models import UNet2d
        from torch_em_tpu.models import unet as um

        x = np.random.RandomState(0).rand(1, 1, 128, 128).astype("float32")
        y = (np.random.RandomState(1).rand(1, 2, 128, 128) > 0.5).astype("float32")

        def grads(phase):
            with um.perf_options(phase_packing=phase, packing=True):
                m = UNet2d(in_channels=1, out_channels=2, depth=2,
                           initial_features=32, final_activation="Sigmoid", seed=7)

                def loss_fn(p):
                    pred = m.module.apply({"params": p}, jnp.asarray(x), train=True)
                    return jnp.mean((pred - y) ** 2)

                loss, g = jax.value_and_grad(loss_fn)(m.variables["params"])
                return float(loss), jax.device_get(g)

        l1, g1 = grads(True)
        l2, g2 = grads(False)
        assert abs(l1 - l2) < 1e-6
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_upsample_phase_matches_resize(self):
        import jax.numpy as jnp

        from torch_em_tpu.models import unet as um

        x = np.random.RandomState(4).rand(2, 16, 24, 8).astype("float32")
        want = np.asarray(um._upsample(jnp.asarray(x), (2, 2), "linear"))
        got = np.asarray(um._d2s_phase(um._upsample2x_to_phase(jnp.asarray(x))))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_phase_masked_norm_exact(self):
        """Masked statistics on the shifted grid: count_scale + zeroed
        out-of-image slots must reproduce the stats over the real pixels."""
        import jax.numpy as jnp

        from torch_em_tpu.models import unet as um

        rs = np.random.RandomState(5)
        c = 3
        x = rs.rand(2, 8, 8, c).astype("float32")
        want = np.asarray(um._instance_norm(jnp.asarray(x)))
        # build the shifted layout by hand: pad one pixel on each side, s2d
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        shifted = np.asarray(um._s2d_phase(jnp.asarray(xp)))
        sh, sw = shifted.shape[1], shifted.shape[2]
        cs = (sh * sw) / float((sh - 1) * (sw - 1))
        shifted = np.asarray(um._mask_shifted(jnp.asarray(shifted), c))
        normed = um._instance_norm_packed(jnp.asarray(shifted), 4, count_scale=cs)
        normed = np.asarray(um._mask_shifted(normed, c))
        # undo the shift: d2s then crop the pad ring
        back = np.asarray(um._d2s_phase(jnp.asarray(normed)))[:, 1:-1, 1:-1]
        np.testing.assert_allclose(back, want, atol=1e-5)


@pytest.mark.slow
class TestNormFold:
    """Norm-fold execution (NORM_FOLD): folding the single-group
    parameter-free InstanceNorm into the following conv's weights plus a
    border-correction bias must be numerically equivalent to the explicit
    normalize pass on every lowering (plain / width-packed / phase).
    Tolerances are f32 accumulation-order noise (measured ~2e-5 on these
    fixtures), not an approximation."""

    def _forward(self, model_fn, x, fold):
        from torch_em_tpu.models import unet as um

        with um.perf_options(norm_fold=fold):
            return np.asarray(model_fn()(x))

    def test_unet2d_fold_matches_explicit(self):
        # f=32 at 128^2: phase path on the top levels, packed below
        x = np.random.RandomState(0).rand(1, 1, 128, 128).astype("float32")
        mk = lambda: UNet2d(in_channels=1, out_channels=2, depth=2,
                            initial_features=32, final_activation="Sigmoid", seed=7)
        np.testing.assert_allclose(
            self._forward(mk, x, True), self._forward(mk, x, False), atol=1e-4)

    def test_unet2d_fold_plain_lowering(self):
        # packing off: the nn.Conv/_Conv2dFast plain path
        from torch_em_tpu.models import unet as um

        x = np.random.RandomState(1).rand(1, 1, 64, 64).astype("float32")
        mk = lambda: UNet2d(in_channels=1, out_channels=1, depth=2,
                            initial_features=16, seed=3)
        with um.perf_options(packing=False, phase_packing=False):
            a = self._forward(mk, x, True)
            b = self._forward(mk, x, False)
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_anisotropic_25d_fold(self):
        x = np.random.RandomState(2).rand(1, 1, 4, 64, 64).astype("float32")
        mk = lambda: AnisotropicUNet(in_channels=1, out_channels=1,
                                     initial_features=16,
                                     scale_factors=[[1, 2, 2], [2, 2, 2]],
                                     final_activation="Sigmoid",
                                     anisotropic_kernel=True, seed=3)
        np.testing.assert_allclose(
            self._forward(mk, x, True), self._forward(mk, x, False), atol=1e-4)

    def test_batch2_fold_inert(self):
        # multi-sample batches have per-sample statistics; the fold must
        # disable itself and match the explicit path bit-for-bit
        x = np.random.RandomState(3).rand(2, 1, 64, 64).astype("float32")
        mk = lambda: UNet2d(in_channels=1, out_channels=1, depth=1,
                            initial_features=16, seed=5)
        np.testing.assert_array_equal(
            self._forward(mk, x, True), self._forward(mk, x, False))

    def test_gradients_match(self):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models import unet as um

        x = np.random.RandomState(0).rand(1, 1, 64, 64).astype("float32")
        y = (np.random.RandomState(1).rand(1, 2, 64, 64) > 0.5).astype("float32")

        def grads(fold):
            with um.perf_options(norm_fold=fold):
                m = UNet2d(in_channels=1, out_channels=2, depth=2,
                           initial_features=16, final_activation="Sigmoid", seed=7)

                def loss_fn(p):
                    pred = m.module.apply({"params": p}, jnp.asarray(x), train=True)
                    return jnp.mean((pred - y) ** 2)

                loss, g = jax.value_and_grad(loss_fn)(m.variables["params"])
                return float(loss), jax.device_get(g)

        l1, g1 = grads(True)
        l2, g2 = grads(False)
        assert abs(l1 - l2) < 1e-5
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
