"""UNETR flax→torch state-dict export fidelity.

The exported state dict must load strictly into the reference's own UNETR
(``/root/reference/torch_em/model/unetr.py``, loaded standalone with its
relative imports satisfied) and reproduce the native model's outputs. The
segment-anything dependency is stood in for by the minimal torch SAM ViT
replica from tests/test_vit_conversion.py wrapped with the ViT_Sam forward
contract (raw features + global-attention skips, apply_neck=False —
reference vit.py:76,91-117), which the reference UNETR accepts as a custom
``encoder`` module (reference unetr.py:194).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import test_vit_conversion as tvc  # noqa: E402  (torch SAM ViT replica)


def _load_ref_unetr():
    if "refmodel.unetr" in sys.modules:
        return sys.modules["refmodel.unetr"]
    pkg = types.ModuleType("refmodel")
    pkg.__path__ = ["/root/reference/torch_em/model"]
    sys.modules["refmodel"] = pkg
    for name in ("unet", "vit", "unetr"):
        spec = importlib.util.spec_from_file_location(
            f"refmodel.{name}", f"/root/reference/torch_em/model/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodel.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refmodel.unetr"]


GLOBAL_ATTN = (1, 2, 3)


class TSamEncoder(tvc.TImageEncoder):
    """ViT_Sam forward contract: (raw channel-first features,
    [global-attention features][:3]); no neck module (have_neck detection in
    reference unetr.py:196 then derives embed_dim from the patch embed)."""

    def __init__(self, **kw):
        super().__init__(**kw)
        del self.neck
        self.chunks_for_projection = GLOBAL_ATTN
        self.img_size = kw.get("img_size", 32)  # read by UNETR.preprocess

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = x + self.pos_embed
        feats = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in self.chunks_for_projection:
                feats.append(x)
        return x.permute(0, 3, 1, 2), [f.permute(0, 3, 1, 2) for f in feats][:3]


class TestUnetrTorchExport:
    CFG = dict(img_size=32, patch_size=16, embed_dim=64, depth=4, num_heads=2,
               window_size=2, global_attn_indexes=GLOBAL_ATTN)

    def _build_native(self, use_skip):
        import jax.numpy as jnp

        from torch_em_tpu.models.base import Model
        from torch_em_tpu.models.unetr import UNETRModule
        from torch_em_tpu.models.vit import ViT

        encoder = ViT(use_rel_pos=True, use_neck=False, dtype=jnp.float32, **self.CFG)
        module = UNETRModule(
            img_size=32, out_channels=2, in_chans=3, resize_input=False,
            final_activation="Sigmoid", use_skip_connection=use_skip,
            encoder_module=encoder, dtype=jnp.float32,
        )
        model = Model(module, init_kwargs={}, example_input_shape=(1, 3, 32, 32),
                      in_channels=3, out_channels=2, seed=5)
        model.factory = "torch_em_tpu.models.unetr.UNETR"
        return model

    def _build_reference(self, use_skip):
        ref = _load_ref_unetr()
        torch.manual_seed(0)
        enc = TSamEncoder(
            img_size=32, patch_size=16, embed_dim=64, depth=4, num_heads=2,
            window_size=2, global_attn_indexes=GLOBAL_ATTN)
        net = ref.UNETR(img_size=32, encoder=enc, out_channels=2,
                        resize_input=False, final_activation="Sigmoid",
                        use_skip_connection=use_skip)
        net.eval()
        return net

    @pytest.mark.parametrize("use_skip", [True, False])
    def test_export_loads_and_matches(self, use_skip):
        from torch_em_tpu.utils.modelzoo import torch_state_dict_from_flax

        model = self._build_native(use_skip)
        state = torch_state_dict_from_flax(model)
        assert state is not None

        net = self._build_reference(use_skip)
        # strict load: every exported tensor must match by name and shape
        net.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                             for k, v in state.items()})

        x = np.random.RandomState(0).rand(1, 3, 32, 32).astype("float32")
        out_jax = np.asarray(model(x))
        with torch.no_grad():
            out_torch = net(torch.from_numpy(x)).numpy()
        assert out_jax.shape == out_torch.shape
        np.testing.assert_allclose(out_jax, out_torch, atol=2e-4, rtol=2e-3)
