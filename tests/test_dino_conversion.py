"""DINOv2 / DINOv3 encoder-geometry and conversion fidelity.

The native flax encoders (torch_em_tpu/models/dino.py, the geometries the
reference wraps in torch_em/model/vit.py:647 ``ViT_DINOv2`` and :714
``ViT_DINOv3``) are verified numerically against the public implementations in
the ``transformers`` package on random weights: a torch model is built, its
state dict converted via ``load_dino_weights`` (exercising the HF-format
sniffing + the fused-qkv mapping), and the outputs compared on a fixed input.
No network access needed — random weights exercise exactly the same geometry
a real checkpoint does.
"""

import numpy as np
import pytest

# real training loops / multi-minute compiles: full tier only
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _state_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestDinoV2Conversion:
    def _compare(self, hf_cfg_kwargs, flax_kwargs, n_prefix):
        from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

        from torch_em_tpu.models.dino import DinoV2ViT, load_dino_weights

        cfg = Dinov2WithRegistersConfig(num_channels=3, **hf_cfg_kwargs)
        tm = Dinov2WithRegistersModel(cfg).eval()
        fm = DinoV2ViT(in_chans=3, **flax_kwargs)

        size = hf_cfg_kwargs["image_size"]
        x = np.random.default_rng(0).standard_normal((2, 3, size, size)).astype("float32")
        variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = load_dino_weights(variables, _state_np(tm), backbone="dinov2")

        out_f, inter_f = fm.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            hf = tm(torch.from_numpy(x), output_hidden_states=True)

        g = size // hf_cfg_kwargs["patch_size"]
        dim = hf_cfg_kwargs["hidden_size"]

        def to_grid(seq):
            return seq[:, n_prefix:].reshape(2, g, g, dim).transpose(0, 3, 1, 2)

        np.testing.assert_allclose(
            np.asarray(out_f), to_grid(hf.last_hidden_state.numpy()), atol=2e-5)
        # intermediates are the outputs of blocks i where i % 3 == 2
        # (reference vit.py:686); hidden_states[i+1] is the output of layer i
        for j, inter in enumerate(inter_f):
            layer_idx = 3 * j + 2
            np.testing.assert_allclose(
                np.asarray(inter), to_grid(hf.hidden_states[layer_idx + 1].numpy()),
                atol=2e-5)

    def test_registers_mlp(self):
        self._compare(
            dict(hidden_size=32, num_hidden_layers=6, num_attention_heads=2,
                 mlp_ratio=2, image_size=28, patch_size=14, num_register_tokens=3),
            dict(img_size=28, patch_size=14, embed_dim=32, depth=6, num_heads=2,
                 mlp_ratio=2, num_register_tokens=3),
            n_prefix=4,
        )

    def test_no_registers(self):
        self._compare(
            dict(hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
                 mlp_ratio=2, image_size=28, patch_size=14, num_register_tokens=0),
            dict(img_size=28, patch_size=14, embed_dim=32, depth=3, num_heads=2,
                 mlp_ratio=2, num_register_tokens=0),
            n_prefix=1,
        )

    def test_swiglu_fused(self):
        # the vit_g FFN flavor (facebook SWiGLUFFNFused / HF use_swiglu_ffn)
        self._compare(
            dict(hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
                 mlp_ratio=4, image_size=28, patch_size=14, num_register_tokens=4,
                 use_swiglu_ffn=True),
            dict(img_size=28, patch_size=14, embed_dim=32, depth=3, num_heads=2,
                 mlp_ratio=4, num_register_tokens=4, ffn="swiglu_fused"),
            n_prefix=5,
        )


class TestDinoV3Conversion:
    def _compare(self, hf_cfg_kwargs, flax_kwargs, n_prefix):
        from transformers import DINOv3ViTConfig, DINOv3ViTModel

        from torch_em_tpu.models.dino import DinoV3ViT, load_dino_weights

        cfg = DINOv3ViTConfig(num_channels=3, **hf_cfg_kwargs)
        tm = DINOv3ViTModel(cfg).eval()
        fm = DinoV3ViT(in_chans=3, **flax_kwargs)

        size = hf_cfg_kwargs["image_size"]
        x = np.random.default_rng(1).standard_normal((2, 3, size, size)).astype("float32")
        variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = load_dino_weights(variables, _state_np(tm), backbone="dinov3")

        out_f, inter_f = fm.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            hf = tm(torch.from_numpy(x), output_hidden_states=True)

        g = size // hf_cfg_kwargs["patch_size"]
        dim = hf_cfg_kwargs["hidden_size"]

        def to_grid(seq):
            return seq[:, n_prefix:].reshape(2, g, g, dim).transpose(0, 3, 1, 2)

        np.testing.assert_allclose(
            np.asarray(out_f), to_grid(hf.last_hidden_state.numpy()), atol=2e-5)
        for j, inter in enumerate(inter_f):
            layer_idx = 3 * j + 2
            np.testing.assert_allclose(
                np.asarray(inter), to_grid(hf.hidden_states[layer_idx + 1].numpy()),
                atol=2e-5)

    def test_rope_storage_tokens(self):
        # rope applied to patch tokens only; cls + 3 storage tokens unrotated
        self._compare(
            dict(hidden_size=32, num_hidden_layers=6, num_attention_heads=2,
                 intermediate_size=64, image_size=32, patch_size=16,
                 num_register_tokens=3),
            dict(img_size=32, patch_size=16, embed_dim=32, depth=6, num_heads=2,
                 mlp_ratio=2.0, num_register_tokens=3),
            n_prefix=4,
        )

    def test_gated_swiglu(self):
        # the '+' model FFN flavor
        self._compare(
            dict(hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
                 intermediate_size=192, image_size=32, patch_size=16,
                 num_register_tokens=4, use_gated_mlp=True, hidden_act="silu"),
            dict(img_size=32, patch_size=16, embed_dim=32, depth=3, num_heads=2,
                 mlp_ratio=6.0, num_register_tokens=4, ffn="swiglu"),
            n_prefix=5,
        )

    def test_rectangular_grid(self):
        # rope coords are computed per-axis: non-square inputs must work
        from transformers import DINOv3ViTConfig, DINOv3ViTModel

        from torch_em_tpu.models.dino import DinoV3ViT, load_dino_weights

        cfg = DINOv3ViTConfig(hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
                              intermediate_size=64, image_size=32, patch_size=16,
                              num_register_tokens=2, num_channels=3)
        tm = DINOv3ViTModel(cfg).eval()
        fm = DinoV3ViT(img_size=32, patch_size=16, embed_dim=32, depth=3, num_heads=2,
                       mlp_ratio=2.0, num_register_tokens=2)
        x = np.random.default_rng(2).standard_normal((1, 3, 32, 64)).astype("float32")
        variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = load_dino_weights(variables, _state_np(tm), backbone="dinov3")
        out_f, _ = fm.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            hf = tm(torch.from_numpy(x))
        grid = hf.last_hidden_state.numpy()[:, 3:].reshape(1, 2, 4, 32).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(np.asarray(out_f), grid, atol=2e-5)


class TestDinoFactoryIntegration:
    def test_get_vision_transformer_routes(self):
        from torch_em_tpu.models.dino import DinoV2ViT, DinoV3ViT
        from torch_em_tpu.models.vit import get_vision_transformer

        m2 = get_vision_transformer(backbone="dinov2", model="vit_s_reg4", img_size=28)
        assert isinstance(m2, DinoV2ViT) and m2.num_register_tokens == 4
        m3 = get_vision_transformer(backbone="dinov3", model="vit_l+", img_size=32)
        assert isinstance(m3, DinoV3ViT) and m3.ffn == "swiglu"
        with pytest.raises(ValueError):
            get_vision_transformer(backbone="dinov2", model="vit_x")

    def test_unetr_with_dinov2_encoder(self):
        # a dino encoder (patch-14 grid, 3 intermediates at i % 3 == 2)
        # plugged into the UNETR decoder end-to-end
        from torch_em_tpu.models.dino import DinoV2ViT
        from torch_em_tpu.models.unetr import UNETRModule

        enc = DinoV2ViT(img_size=56, patch_size=14, embed_dim=32, depth=9,
                        num_heads=2, mlp_ratio=2)
        module = UNETRModule(img_size=56, backbone="dinov2", out_channels=2,
                             initial_features=8, encoder_module=enc,
                             resize_input=False)
        x = jnp.zeros((1, 3, 56, 56), jnp.float32)
        variables = module.init(jax.random.PRNGKey(0), x)
        out = module.apply(variables, x)
        assert out.shape == (1, 2, 56, 56)
