import numpy as np
import pytest

# real training loops / multi-minute compiles: full tier only
pytestmark = pytest.mark.slow


class TestResNet3d:
    def test_basic(self):
        from torch_em_tpu.models import resnet3d_18

        model = resnet3d_18(in_channels=1, out_channels=5)
        out = model(np.random.rand(2, 1, 32, 32, 32).astype("float32"))
        assert out.shape == (2, 5)

    def test_bottleneck(self):
        from torch_em_tpu.models import resnet3d_50

        model = resnet3d_50(in_channels=2, out_channels=3)
        out = model(np.random.rand(1, 2, 32, 32, 32).astype("float32"))
        assert out.shape == (1, 3)

    def test_resnext(self):
        from torch_em_tpu.models import resnext3d_50_32x4d

        model = resnext3d_50_32x4d(in_channels=1, out_channels=2)
        out = model(np.random.rand(1, 1, 32, 32, 32).astype("float32"))
        assert out.shape == (1, 2)


class TestUNETR:
    def test_forward(self):
        from torch_em_tpu.models import UNETR

        model = UNETR(img_size=128, encoder="vit_t", out_channels=2, resize_input=False,
                      final_activation="Sigmoid")
        out = np.asarray(model(np.random.rand(1, 1, 128, 128).astype("float32")))
        assert out.shape == (1, 2, 128, 128)
        assert out.min() >= 0 and out.max() <= 1

    def test_resize_input(self):
        from torch_em_tpu.models import UNETR

        model = UNETR(img_size=128, encoder="vit_t", out_channels=1, resize_input=True)
        out = model(np.random.rand(1, 1, 96, 96).astype("float32"))
        assert out.shape == (1, 1, 96, 96)  # resized back to the original shape

    def test_no_skip(self):
        from torch_em_tpu.models import UNETR

        model = UNETR(img_size=128, encoder="vit_t", out_channels=1, resize_input=False,
                      use_skip_connection=False)
        out = model(np.random.rand(1, 1, 128, 128).astype("float32"))
        assert out.shape == (1, 1, 128, 128)

    def test_unetr3d(self):
        from torch_em_tpu.models import UNETR3D

        model = UNETR3D(img_size=64, encoder="vit_t", out_channels=2, resize_input=False,
                        final_activation="Sigmoid")
        out = np.asarray(model(np.random.rand(1, 1, 3, 64, 64).astype("float32")))
        assert out.shape == (1, 2, 3, 64, 64)
        assert out.min() >= 0 and out.max() <= 1

    def test_unetr3d_strip_pooling_identity_for_single_slice(self):
        # DepthStripPooling must be a structural no-op for Z == 1 (reference unetr.py:872)
        from torch_em_tpu.models import UNETR3D

        model = UNETR3D(img_size=64, encoder="vit_t", out_channels=1, resize_input=False)
        out = model(np.random.rand(1, 1, 1, 64, 64).astype("float32"))
        assert out.shape == (1, 1, 1, 64, 64)


class TestViT:
    def test_feature_maps(self):
        import jax

        from torch_em_tpu.models import get_vision_transformer

        vit = get_vision_transformer(backbone="sam", model="vit_t", img_size=128)
        x = np.random.rand(1, 3, 128, 128).astype("float32")
        variables = vit.init(jax.random.PRNGKey(0), x)
        out, intermediates = vit.apply(variables, x)
        assert out.shape == (1, 256, 8, 8)
        assert len(intermediates) == 4
        assert intermediates[0].shape == (1, 192, 8, 8)


class TestViMUNet:
    def test_forward(self):
        from torch_em_tpu.models import get_vimunet_model

        model = get_vimunet_model(out_channels=1, model_type="vim_t", img_size=64)
        out = model(np.random.rand(1, 1, 64, 64).astype("float32"))
        assert out.shape == (1, 1, 64, 64)


class TestVimCheckpointLoading:
    def test_load_native_checkpoint_and_reject_pth(self, tmp_path):
        import numpy as np
        from flax import serialization as flax_serialization

        import pytest as _pytest

        from torch_em_tpu.models import get_vimunet_model
        from torch_em_tpu.models.vim import load_vim_weights

        model = get_vimunet_model(out_channels=1, model_type="vim_t", img_size=64, depth=2)
        # write a native-style checkpoint carrying model_state
        import jax

        state = flax_serialization.to_state_dict(jax.device_get(model.variables))
        ckpt = tmp_path / "latest.ckpt"
        with open(ckpt, "wb") as f:
            f.write(flax_serialization.msgpack_serialize({"model_state": state}))

        # loading through the factory reproduces the weights
        model2 = get_vimunet_model(out_channels=1, model_type="vim_t", img_size=64,
                                   depth=2, checkpoint=str(ckpt), seed=7)
        a = jax.tree_util.tree_leaves(model.variables)
        b = jax.tree_util.tree_leaves(model2.variables)
        assert all(np.allclose(x, y) for x, y in zip(a, b))

        # hustvl .pth checkpoints now route to the bimamba-v2 converter
        # (fidelity covered by tests/test_vim_conversion.py)
        with _pytest.raises(FileNotFoundError):
            load_vim_weights(jax.device_get(model.variables), "/nonexistent/vim_t.pth")
