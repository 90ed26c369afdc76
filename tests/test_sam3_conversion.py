"""SAM3 (PE/vitdet) encoder conversion fidelity.

Same methodology as tests/test_vit_conversion.py: a minimal torch
implementation of the documented SAM3 vitdet geometry (reference
torch_em/model/vit.py:356-470 + the fixed vit_pe config at :865-877) is
built with random weights, saved as a torch checkpoint, converted via
``load_sam_weights(backbone='sam3')``, and the native flax output is compared
numerically. The torch replica implements RoPE with complex arithmetic
(torch.polar), independently of the real-arithmetic JAX version, so the test
cross-validates the rotary math as well as the name mapping.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


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


def t_rope_freqs_cis(gh, gw, head_dim, scale_h, scale_w, theta=10000.0):
    """Axial 2D RoPE rotations as a complex tensor (gh*gw, head_dim//2)."""
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (torch.arange(quarter).double() * 4.0 / head_dim))
    ty = torch.arange(gh).double() * scale_h
    tx = torch.arange(gw).double() * scale_w
    ty, tx = torch.meshgrid(ty, tx, indexing="ij")
    ang_x = tx.reshape(-1)[:, None] * freqs[None, :]
    ang_y = ty.reshape(-1)[:, None] * freqs[None, :]
    ang = torch.cat([ang_x, ang_y], dim=1).float()
    return torch.polar(torch.ones_like(ang), ang)


def t_apply_rope(x, freqs_cis):
    # x: (B, L, d) -> complex pairs over the channel dim
    xc = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
    out = torch.view_as_real(xc * freqs_cis[None]).flatten(-2)
    return out.type_as(x)


class TRopeAttention(tnn.Module):
    def __init__(self, dim, num_heads, pretrain_grid):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.pretrain_grid = pretrain_grid
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, H, W, C = x.shape
        qkv = self.qkv(x.reshape(B, H * W, C))
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4).reshape(3, B * self.num_heads, H * W, self.head_dim)
        q, k, v = qkv.unbind(0)

        scale_h = min(1.0, self.pretrain_grid / H)
        scale_w = min(1.0, self.pretrain_grid / W)
        fc = t_rope_freqs_cis(H, W, self.head_dim, scale_h, scale_w)
        q, k = t_apply_rope(q, fc), t_apply_rope(k, fc)

        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).view(B, self.num_heads, H * W, self.head_dim)
        x = x.transpose(1, 2).reshape(B, H * W, C)
        return self.proj(x).reshape(B, H, W, C)


class TMLP(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TSam3Block(tnn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, window_size, pretrain_grid):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TRopeAttention(dim, num_heads, pretrain_grid)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = TMLP(dim, int(dim * mlp_ratio))
        self.window_size = window_size

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = t_window_partition(x, self.window_size)
        x = self.attn(x)
        if self.window_size > 0:
            x = t_window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class TSam3Encoder(tnn.Module):
    """Minimal torch vitdet at the documented SAM3 geometry."""

    def __init__(self, img_size=84, pretrain_img_size=28, patch_size=14, in_chans=3,
                 embed_dim=64, depth=4, num_heads=2, mlp_ratio=4.625, window_size=2,
                 global_attn_indexes=(1, 3)):
        super().__init__()

        class PatchEmbed(tnn.Module):
            def __init__(self):
                super().__init__()
                self.proj = tnn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                       stride=patch_size, bias=False)

            def forward(self, x):
                return self.proj(x).permute(0, 2, 3, 1)

        self.patch_embed = PatchEmbed()
        pre_grid = pretrain_img_size // patch_size
        self.pre_grid = pre_grid
        # pretrain_use_cls_token=True: leading cls row in the stored table
        self.pos_embed = tnn.Parameter(torch.zeros(1, pre_grid * pre_grid + 1, embed_dim))
        self.ln_pre = tnn.LayerNorm(embed_dim)
        self.global_attn_indexes = tuple(global_attn_indexes)
        self.blocks = tnn.ModuleList([
            TSam3Block(embed_dim, num_heads, mlp_ratio,
                       0 if i in self.global_attn_indexes else window_size, pre_grid)
            for i in range(depth)
        ])

    def _abs_pos(self, gh, gw):
        # drop cls (retain_cls_token=False), tile when exact multiple else resize
        spatial = self.pos_embed[:, 1:].reshape(1, self.pre_grid, self.pre_grid, -1)
        if (gh, gw) == (self.pre_grid, self.pre_grid):
            return spatial
        if gh % self.pre_grid == 0 and gw % self.pre_grid == 0:
            return spatial.repeat(1, gh // self.pre_grid, gw // self.pre_grid, 1)
        return F.interpolate(spatial.permute(0, 3, 1, 2), size=(gh, gw),
                             mode="bilinear", align_corners=False).permute(0, 2, 3, 1)

    def forward(self, x):
        x = self.patch_embed(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x + self._abs_pos(gh, gw)
        x = self.ln_pre(x)
        inter = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in self.global_attn_indexes:
                inter.append(x.permute(0, 3, 1, 2).contiguous())
        return x.permute(0, 3, 1, 2).contiguous(), inter


class TestSam3Conversion:
    def _build(self, img_size=84):
        torch.manual_seed(11)
        enc = TSam3Encoder(img_size=img_size)
        with torch.no_grad():
            for p in enc.parameters():
                p.uniform_(-0.08, 0.08)
            enc.pos_embed.normal_(0, 0.02)
        enc.eval()
        return enc

    def _convert_and_compare(self, tmp_path, img_size):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models.sam3 import Sam3ViT
        from torch_em_tpu.models.vit import load_sam_weights

        enc = self._build(img_size)
        ckpt = tmp_path / "sam3.pt"
        torch.save(enc.state_dict(), ckpt)

        vit = Sam3ViT(img_size=img_size, pretrain_img_size=28, patch_size=14,
                      embed_dim=64, depth=4, num_heads=2, mlp_ratio=4.625,
                      window_size=2, global_attn_indexes=(1, 3), dtype=jnp.float32)
        x = np.random.RandomState(0).rand(1, 3, img_size, img_size).astype("float32")
        variables = vit.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables, converted, skipped = load_sam_weights(
            variables, str(ckpt), backbone="sam3")
        assert not skipped
        assert converted == len(enc.state_dict())

        with torch.no_grad():
            t_out, t_inter = enc(torch.from_numpy(x))
        j_out, j_inter = vit.apply(variables, jnp.asarray(x))

        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-4)
        assert len(j_inter) == len(t_inter) == 2
        for j, t in zip(j_inter, t_inter):
            np.testing.assert_allclose(np.asarray(j), t.numpy(), atol=2e-4)

    def test_conversion_matches_torch_tiled_pos(self, tmp_path):
        # grid 6 = 3x the pretraining grid 2 -> the TILED abs-pos path,
        # global blocks at rope scale 2/6
        self._convert_and_compare(tmp_path, img_size=84)

    def test_conversion_matches_torch_resized_pos(self, tmp_path):
        # grid 5 is not a multiple of the pretraining grid 2 -> bilinear
        # resize path; windows (2x2) pad the 5x5 grid
        self._convert_and_compare(tmp_path, img_size=70)

    def test_strict_rejects_unmapped(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models.sam3 import Sam3ViT, load_sam3_weights

        enc = self._build()
        state = enc.state_dict()
        state["blocks.0.attn.rel_pos_h"] = torch.zeros(3, 4)
        ckpt = tmp_path / "sam3_bad.pt"
        torch.save(state, ckpt)

        vit = Sam3ViT(img_size=84, pretrain_img_size=28, patch_size=14,
                      embed_dim=64, depth=4, num_heads=2, mlp_ratio=4.625,
                      window_size=2, global_attn_indexes=(1, 3), dtype=jnp.float32)
        variables = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 84, 84)))
        with pytest.raises(ValueError):
            load_sam3_weights(variables, str(ckpt))
        _, converted, skipped = load_sam3_weights(variables, str(ckpt), strict=False)
        assert skipped == ["blocks.0.attn.rel_pos_h"]

    def test_vit_pe_rope_geometry(self):
        # full-size config sanity: pretraining grid 24 == window size, the
        # finetuning grid 72 is exactly 3 windows -> tiled pos; interp rope
        # scales global coords by 24/72
        from torch_em_tpu.models.sam3 import SAM3_CONFIG, _axial_rope_angles

        assert SAM3_CONFIG["pretrain_img_size"] // SAM3_CONFIG["patch_size"] == 24
        assert SAM3_CONFIG["img_size"] // SAM3_CONFIG["patch_size"] == 72
        ang_native = _axial_rope_angles(24, 24, 64)
        ang_global = _axial_rope_angles(72, 72, 64, scale_h=24 / 72, scale_w=24 / 72)
        # the rotary span of the rescaled 72-grid matches the native 24-grid
        np.testing.assert_allclose(float(ang_global.max()),
                                   float(ang_native.max()) * (71 * 24 / 72) / 23,
                                   rtol=1e-6)
