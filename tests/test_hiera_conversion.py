"""SAM2 (Hiera) image-encoder conversion fidelity.

A minimal torch implementation of the sam2 Hiera trunk + FPN neck (the
geometry the reference wraps, torch_em/model/vit.py:291) is built with random
weights, saved as a torch checkpoint with sam2's state-dict naming
(``trunk.*`` / ``neck.convs.*``), converted via ``load_sam_weights(...,
backbone='sam2')``, and the native flax HieraSam2 outputs are compared
numerically against the torch outputs. This verifies the geometry (q-pooled
stage transitions, windowed attention with the one-block window-size lag,
bicubic background + tiled window pos embeds, FPN top-down levels) and the
conversion mapping — exactly what a real sam2 checkpoint exercises.
"""

import math

import numpy as np
import pytest

# real training loops / multi-minute compiles: full tier only
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# ---- minimal torch Hiera (public sam2 hieradet architecture) ----

def t_window_partition(x, window_size):
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h > 0 or pad_w > 0:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.view(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    windows = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, window_size, window_size, C)
    return windows, (Hp, Wp)


def t_window_unpartition(windows, window_size, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.view(B, Hp // window_size, Wp // window_size, window_size, window_size, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, Hp, Wp, -1)
    return x[:, :H, :W, :].contiguous()


def t_do_pool(x, pool):
    if pool is None:
        return x
    return pool(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)


class TMLP(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.layers = tnn.ModuleList([tnn.Linear(dim, hidden), tnn.Linear(hidden, dim)])

    def forward(self, x):
        return self.layers[1](F.gelu(self.layers[0](x)))


class TMultiScaleAttention(tnn.Module):
    def __init__(self, dim, dim_out, num_heads, q_pool=None):
        super().__init__()
        self.dim_out = dim_out
        self.num_heads = num_heads
        self.q_pool = q_pool
        self.qkv = tnn.Linear(dim, dim_out * 3)
        self.proj = tnn.Linear(dim_out, dim_out)

    def forward(self, x):
        B, H, W, _ = x.shape
        qkv = self.qkv(x).reshape(B, H * W, 3, self.num_heads, -1)
        q, k, v = torch.unbind(qkv, 2)
        if self.q_pool is not None:
            q = t_do_pool(q.reshape(B, H, W, -1), self.q_pool)
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, self.num_heads, -1)
        x = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        x = x.transpose(1, 2).reshape(B, H, W, -1)
        return self.proj(x)


class THieraBlock(tnn.Module):
    def __init__(self, dim, dim_out, num_heads, q_stride=None, window_size=0,
                 mlp_ratio=4.0):
        super().__init__()
        self.dim, self.dim_out = dim, dim_out
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.window_size = window_size
        self.q_stride = q_stride
        self.pool = tnn.MaxPool2d(q_stride, q_stride, ceil_mode=False) if q_stride else None
        self.attn = TMultiScaleAttention(dim, dim_out, num_heads, q_pool=self.pool)
        self.norm2 = tnn.LayerNorm(dim_out, eps=1e-6)
        self.mlp = TMLP(dim_out, int(dim_out * mlp_ratio))
        if dim != dim_out:
            self.proj = tnn.Linear(dim, dim_out)

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.dim != self.dim_out:
            shortcut = t_do_pool(self.proj(x), self.pool)
        window_size = self.window_size
        if window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = t_window_partition(x, window_size)
        x = self.attn(x)
        if self.q_stride:
            window_size = self.window_size // self.q_stride[0]
            H, W = shortcut.shape[1:3]
            pad_h = (window_size - H % window_size) % window_size if window_size else 0
            pad_w = (window_size - W % window_size) % window_size if window_size else 0
            pad_hw = (H + pad_h, W + pad_w)
        if self.window_size > 0:
            x = t_window_unpartition(x, window_size, pad_hw, (H, W))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class TPatchEmbed(tnn.Module):
    def __init__(self, embed_dim, in_chans=3):
        super().__init__()
        self.proj = tnn.Conv2d(in_chans, embed_dim, kernel_size=7, stride=4, padding=3)

    def forward(self, x):
        return self.proj(x).permute(0, 2, 3, 1)


class THiera(tnn.Module):
    def __init__(self, embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
                 global_att_blocks=(3,), window_pos_embed_bkg_spatial_size=(7, 7),
                 window_spec=(4, 4, 2, 2), q_pool=3, q_stride=(2, 2),
                 dim_mul=2.0, head_mul=2.0):
        super().__init__()
        depth = sum(stages)
        self.q_stride = q_stride
        self.stage_ends = [sum(stages[: i + 1]) - 1 for i in range(len(stages))]
        self.q_pool_blocks = [x + 1 for x in self.stage_ends[:q_pool]]
        self.window_spec = window_spec
        self.global_att_blocks = global_att_blocks
        self.patch_embed = TPatchEmbed(embed_dim)
        self.pos_embed = tnn.Parameter(
            torch.zeros(1, embed_dim, *window_pos_embed_bkg_spatial_size))
        self.pos_embed_window = tnn.Parameter(
            torch.zeros(1, embed_dim, window_spec[0], window_spec[0]))
        cur_stage = 1
        self.blocks = tnn.ModuleList()
        for i in range(depth):
            dim_out = embed_dim
            window_size = self.window_spec[cur_stage - 1]
            if self.global_att_blocks is not None:
                window_size = 0 if i in self.global_att_blocks else window_size
            if i - 1 in self.stage_ends:
                dim_out = int(embed_dim * dim_mul)
                num_heads = int(num_heads * head_mul)
                cur_stage += 1
            self.blocks.append(THieraBlock(
                dim=embed_dim, dim_out=dim_out, num_heads=num_heads,
                q_stride=q_stride if i in self.q_pool_blocks else None,
                window_size=window_size))
            embed_dim = dim_out

    def _get_pos_embed(self, hw):
        h, w = hw
        window_embed = self.pos_embed_window
        pos_embed = F.interpolate(self.pos_embed, size=(h, w), mode="bicubic")
        pos_embed = pos_embed + window_embed.tile(
            [x // y for x, y in zip(pos_embed.shape, window_embed.shape)])
        return pos_embed.permute(0, 2, 3, 1)

    def forward(self, x):
        x = self.patch_embed(x)
        x = x + self._get_pos_embed(x.shape[1:3])
        outputs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in self.stage_ends:
                outputs.append(x.permute(0, 3, 1, 2))
        return outputs


class TFpnNeck(tnn.Module):
    def __init__(self, d_model, backbone_channel_list, fpn_top_down_levels=(2, 3)):
        super().__init__()
        self.convs = tnn.ModuleList()
        for dim in backbone_channel_list:
            current = tnn.Sequential()
            current.add_module("conv", tnn.Conv2d(dim, d_model, kernel_size=1))
            self.convs.append(current)
        self.fpn_top_down_levels = list(fpn_top_down_levels)

    def forward(self, xs):
        out = [None] * len(self.convs)
        prev_features = None
        n = len(self.convs) - 1
        for i in range(n, -1, -1):
            lateral = self.convs[n - i](xs[i])
            if i in self.fpn_top_down_levels and prev_features is not None:
                top_down = F.interpolate(
                    prev_features.to(torch.float32), scale_factor=2.0, mode="nearest")
                prev_features = lateral + top_down
            else:
                prev_features = lateral
            out[i] = prev_features
        return out


class TImageEncoderSam2(tnn.Module):
    def __init__(self, scalp=1, **kwargs):
        super().__init__()
        self.trunk = THiera(**kwargs)
        self.neck = TFpnNeck(d_model=16, backbone_channel_list=[256, 128, 64, 32])
        self.scalp = scalp

    def forward(self, x):
        features = self.neck(self.trunk(x))
        if self.scalp > 0:
            features = features[: -self.scalp]
        return features[-1], features


class TestHieraConversion:
    CFG = dict(
        img_size=64, embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
        global_att_blocks=(3,), window_pos_embed_bkg_spatial_size=(7, 7),
        window_spec=(4, 4, 2, 2), backbone_channel_list=(256, 128, 64, 32),
        d_model=16,
    )

    def _build(self):
        torch.manual_seed(0)
        enc = TImageEncoderSam2(
            embed_dim=32, num_heads=1, stages=(1, 1, 2, 1), global_att_blocks=(3,),
            window_pos_embed_bkg_spatial_size=(7, 7), window_spec=(4, 4, 2, 2))
        with torch.no_grad():
            for p in enc.parameters():
                p.normal_(0.0, 0.05)
        return enc

    def test_bicubic_matrix_matches_torch(self):
        from torch_em_tpu.models.hiera import _torch_bicubic_matrix

        rs = np.random.RandomState(0)
        for n_in, n_out in ((7, 16), (14, 64), (7, 7), (8, 20)):
            x = rs.rand(1, 3, n_in, n_in).astype("float32")
            want = F.interpolate(torch.from_numpy(x), size=(n_out, n_out),
                                 mode="bicubic").numpy()
            m = _torch_bicubic_matrix(n_in, n_out)
            got = np.einsum("oh,bchw->bcow", m, x)
            got = np.einsum("ow,bchw->bcho", m, got)
            np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_conversion_matches_torch(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models.hiera import HieraSam2
        from torch_em_tpu.models.vit import load_sam_weights

        enc = self._build()
        ckpt = tmp_path / "sam2_tiny.pt"
        torch.save({f"image_encoder.{k}": v for k, v in enc.state_dict().items()}, ckpt)

        hiera = HieraSam2(dtype=jnp.float32, **self.CFG)
        x = np.random.RandomState(1).rand(1, 3, 64, 64).astype("float32")
        variables = hiera.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = load_sam_weights(variables, str(ckpt), backbone="sam2")

        out_jax, feats_jax = hiera.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            out_torch, feats_torch = enc(torch.from_numpy(x))

        assert out_jax.shape == tuple(out_torch.shape)
        np.testing.assert_allclose(np.asarray(out_jax), out_torch.numpy(),
                                   atol=2e-4, rtol=2e-3)
        assert len(feats_jax) == len(feats_torch) == 3
        for fj, ft in zip(feats_jax, feats_torch):
            np.testing.assert_allclose(np.asarray(fj), ft.numpy(), atol=2e-4, rtol=2e-3)

    def test_strict_rejects_unmatched(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models.hiera import HieraSam2
        from torch_em_tpu.models.vit import load_sam_weights

        enc = self._build()
        state = enc.state_dict()
        state["trunk.blocks.0.attn.extra"] = torch.zeros(3)
        ckpt = tmp_path / "sam2_bad.pt"
        torch.save(state, ckpt)

        hiera = HieraSam2(dtype=jnp.float32, **self.CFG)
        variables = hiera.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)))
        with pytest.raises(ValueError):
            load_sam_weights(variables, str(ckpt), backbone="sam2")
        load_sam_weights(variables, str(ckpt), backbone="sam2", strict=False)

    def test_get_vision_transformer_hvit(self):
        from torch_em_tpu.models.hiera import HieraSam2
        from torch_em_tpu.models.vit import get_vision_transformer

        enc = get_vision_transformer(backbone="sam2", model="hvit_t")
        assert isinstance(enc, HieraSam2)
        assert enc.stages == (1, 2, 7, 2) and enc.global_att_blocks == (5, 7, 9)
        with pytest.raises(ValueError):
            get_vision_transformer(backbone="sam2", model="vit_b")

    def test_unetr_with_sam2_encoder_runs(self):
        """The hvit encoder plugs into the UNETR contract end-to-end. Like
        the reference, sam2 runs without skip connections (its per-stage
        features live at different resolutions; reference unetr.py:726
        rejects skips for the hiera-based 3D model and the 2D skip path
        would shape-mismatch)."""
        from torch_em_tpu.models.unetr import UNETR

        model = UNETR(img_size=64, backbone="sam2", encoder="hvit_t",
                      out_channels=2, resize_input=False, initial_features=8,
                      use_skip_connection=False)
        x = np.random.RandomState(2).rand(1, 1, 64, 64).astype("float32")
        y = model(x)
        assert np.asarray(y).shape == (1, 2, 64, 64)
