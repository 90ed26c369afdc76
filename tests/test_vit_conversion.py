"""SAM image-encoder conversion fidelity.

A minimal torch implementation of the segment-anything image encoder (the
geometry the reference wraps, torch_em/model/vit.py:58) is built with random
weights, saved as a torch checkpoint, converted via ``load_sam_weights``, and
the native flax ViT output is compared numerically against the torch output
on a fixed input. No network access needed — the test verifies the geometry
(windowed attention, decomposed rel-pos, neck) and the conversion mapping,
which is exactly what a real SAM checkpoint exercises.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# ---- minimal torch SAM image encoder (public segment-anything architecture) ----

def t_get_rel_pos(q_size, k_size, rel_pos):
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos_resized = F.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=max_rel_dist, mode="linear",
        ).reshape(-1, max_rel_dist).permute(1, 0)
    else:
        rel_pos_resized = rel_pos
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative_coords = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos_resized[relative_coords.long()]


def t_add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = t_get_rel_pos(q_h, k_h, rel_pos_h)
    Rw = t_get_rel_pos(q_w, k_w, rel_pos_w)
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = (attn.view(B, q_h, q_w, k_h, k_w)
            + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :])
    return attn.view(B, q_h * q_w, k_h * k_w)


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


class TAttention(tnn.Module):
    def __init__(self, dim, num_heads, use_rel_pos, input_size):
        super().__init__()
        self.num_heads = num_heads
        head_dim = dim // num_heads
        self.scale = head_dim ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)
        self.use_rel_pos = use_rel_pos
        if use_rel_pos:
            self.rel_pos_h = tnn.Parameter(torch.zeros(2 * input_size[0] - 1, head_dim))
            self.rel_pos_w = tnn.Parameter(torch.zeros(2 * input_size[1] - 1, head_dim))

    def forward(self, x):
        B, H, W, _ = x.shape
        qkv = self.qkv(x).reshape(B, H * W, 3, self.num_heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, B * self.num_heads, H * W, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        if self.use_rel_pos:
            attn = t_add_decomposed_rel_pos(attn, q, self.rel_pos_h, self.rel_pos_w, (H, W), (H, W))
        attn = attn.softmax(dim=-1)
        x = ((attn @ v).view(B, self.num_heads, H, W, -1)
             .permute(0, 2, 3, 1, 4).reshape(B, H, W, -1))
        return self.proj(x)


class TMLP(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.lin1 = tnn.Linear(dim, hidden)
        self.lin2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.lin2(F.gelu(self.lin1(x)))


class TBlock(tnn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, window_size, use_rel_pos, input_size):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttention(
            dim, num_heads, use_rel_pos,
            input_size=(window_size, window_size) if window_size > 0 else input_size)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
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


class TLayerNorm2d(tnn.Module):
    def __init__(self, num_channels, eps=1e-6):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(num_channels))
        self.bias = tnn.Parameter(torch.zeros(num_channels))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class TImageEncoder(tnn.Module):
    def __init__(self, img_size=32, patch_size=16, in_chans=3, embed_dim=64, depth=4,
                 num_heads=2, mlp_ratio=4.0, out_chans=32, window_size=2,
                 global_attn_indexes=(1, 3)):
        super().__init__()
        grid = img_size // patch_size
        self.patch_embed = tnn.Sequential()
        self.patch_embed.proj = tnn.Conv2d(in_chans, embed_dim, patch_size, patch_size)
        self.pos_embed = tnn.Parameter(torch.zeros(1, grid, grid, embed_dim))
        self.blocks = tnn.ModuleList([
            TBlock(embed_dim, num_heads, mlp_ratio,
                   0 if i in global_attn_indexes else window_size,
                   use_rel_pos=True, input_size=(grid, grid))
            for i in range(depth)
        ])
        self.neck = tnn.Sequential(
            tnn.Conv2d(embed_dim, out_chans, 1, bias=False),
            TLayerNorm2d(out_chans),
            tnn.Conv2d(out_chans, out_chans, 3, padding=1, bias=False),
            TLayerNorm2d(out_chans),
        )

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.neck(x.permute(0, 3, 1, 2))


class TCellposeEncoder(tnn.Module):
    """CellposeSAM-style encoder (reference vit.py:120): SAM geometry with a
    small patch size, ALL blocks global, rel-pos tables kept at their
    pretraining sizes (interpolated at runtime), chunked intermediates."""

    def __init__(self, img_size=32, patch_size=8, in_chans=3, embed_dim=64, depth=4,
                 num_heads=2, mlp_ratio=2.0, out_chans=32, table_sizes=(3, 8, 3, 8)):
        super().__init__()
        grid = img_size // patch_size
        self.patch_embed = tnn.Sequential()
        self.patch_embed.proj = tnn.Conv2d(in_chans, embed_dim, patch_size, patch_size)
        self.pos_embed = tnn.Parameter(torch.zeros(1, grid, grid, embed_dim))
        self.blocks = tnn.ModuleList([
            TBlock(embed_dim, num_heads, mlp_ratio, 0, use_rel_pos=True,
                   input_size=(n, n))     # table base size != running grid
            for n in table_sizes
        ])
        self.neck = tnn.Sequential(
            tnn.Conv2d(embed_dim, out_chans, 1, bias=False),
            TLayerNorm2d(out_chans),
            tnn.Conv2d(out_chans, out_chans, 3, padding=1, bias=False),
            TLayerNorm2d(out_chans),
        )

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = x + self.pos_embed
        inter = []
        chunk = len(self.blocks) // 4
        keep = {chunk - 1, 2 * chunk - 1, 3 * chunk - 1, 4 * chunk - 1}
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in keep:
                inter.append(x.permute(0, 3, 1, 2))
        return self.neck(x.permute(0, 3, 1, 2)), inter


class TestCellposeSamConversion:
    def test_conversion_matches_torch(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models.vit import ViT, load_sam_weights

        torch.manual_seed(1)
        enc = TCellposeEncoder()
        with torch.no_grad():
            for p in enc.parameters():
                p.normal_(0.0, 0.05)
        ckpt = tmp_path / "cellpose_sam.pt"
        torch.save(enc.state_dict(), ckpt)

        # all-global attention over the patch-8 grid; table base sizes kept
        # at their "pretraining" values and interpolated at call time
        vit = ViT(img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=2,
                  mlp_ratio=2.0, out_chans=32, window_size=0, use_rel_pos=True,
                  rel_pos_table_sizes=(3, 8, 3, 8), global_attn_indexes=(1, 3))
        x = np.random.default_rng(7).standard_normal((2, 3, 32, 32)).astype("float32")
        variables = vit.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = load_sam_weights(variables, str(ckpt), backbone="cellpose_sam")

        out_jax, _ = vit.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            out_torch, _ = enc(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(out_jax), out_torch.numpy(),
                                   atol=2e-4, rtol=2e-3)

    def test_factory_config(self):
        from torch_em_tpu.models.vit import get_vision_transformer

        m = get_vision_transformer(backbone="cellpose_sam", model="vit_l",
                                   img_size=256)
        assert m.patch_size == 8 and m.window_size == 0 and m.use_rel_pos
        # SAM vit_l global blocks keep 64-grid tables, windowed-origin keep 14
        assert m.rel_pos_table_sizes[5] == 64 and m.rel_pos_table_sizes[0] == 14
        with pytest.raises(ValueError):
            get_vision_transformer(backbone="cellpose_sam", model="vit_b")


class TestSamConversion:
    def _build(self):
        torch.manual_seed(0)
        enc = TImageEncoder()
        # randomize everything incl. rel-pos tables so the test is non-trivial
        with torch.no_grad():
            for p in enc.parameters():
                p.normal_(0.0, 0.05)
        return enc

    def test_conversion_matches_torch(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models.vit import ViT, load_sam_weights

        enc = self._build()
        ckpt = tmp_path / "sam_tiny.pt"
        torch.save({f"image_encoder.{k}": v for k, v in enc.state_dict().items()}, ckpt)

        vit = ViT(img_size=32, patch_size=16, embed_dim=64, depth=4, num_heads=2,
                  out_chans=32, window_size=2, use_rel_pos=True,
                  global_attn_indexes=(1, 3), dtype=jnp.float32)
        x = np.random.RandomState(1).rand(1, 3, 32, 32).astype("float32")
        variables = vit.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = load_sam_weights(variables, str(ckpt))  # strict: raises on any skip

        out_jax, intermediates = vit.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            out_torch = enc(torch.from_numpy(x)).numpy()

        assert out_jax.shape == out_torch.shape
        np.testing.assert_allclose(np.asarray(out_jax), out_torch, atol=2e-4, rtol=2e-3)
        assert len(intermediates) == 2

    def test_backbone_converter_coverage(self):
        # every reference backbone family routes to a verified conversion path
        # (dinov2/3: tests/test_dino_conversion.py, mae/scalemae:
        # tests/test_scalemae_conversion.py, sam2: tests/test_hiera_conversion.py,
        # sam3: tests/test_sam3_conversion.py, cellpose_sam: this file) —
        # the refusal list is empty
        from torch_em_tpu.models.vit import UNSUPPORTED_CONVERSION_BACKBONES

        assert UNSUPPORTED_CONVERSION_BACKBONES == ()

    def test_sam3_factory_dims(self):
        # the factory builds the reference's vit_pe geometry
        # (reference vit.py:866-877) via the native Sam3ViT
        from torch_em_tpu.models.sam3 import Sam3ViT
        from torch_em_tpu.models.vit import get_vision_transformer

        m = get_vision_transformer(backbone="sam3", model="vit_pe")
        assert isinstance(m, Sam3ViT)
        assert m.embed_dim == 1024 and m.depth == 32 and m.patch_size == 14
        assert m.window_size == 24 and m.img_size == 1008
        assert m.pretrain_img_size == 336 and m.mlp_ratio == 4.625
        with pytest.raises(ValueError):
            get_vision_transformer(backbone="sam3", model="vit_b")

    def test_strict_mode_rejects_mismatched_checkpoint(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.models.vit import ViT, load_sam_weights

        enc = self._build()
        state = enc.state_dict()
        state["blocks.0.attn.extra_tensor"] = torch.zeros(3)
        ckpt = tmp_path / "sam_bad.pt"
        torch.save(state, ckpt)

        vit = ViT(img_size=32, patch_size=16, embed_dim=64, depth=4, num_heads=2,
                  out_chans=32, window_size=2, use_rel_pos=True,
                  global_attn_indexes=(1, 3), dtype=jnp.float32)
        variables = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
        with pytest.raises(ValueError):
            load_sam_weights(variables, str(ckpt))
        # non-strict converts what it can
        load_sam_weights(variables, str(ckpt), strict=False)
