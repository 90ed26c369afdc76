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
