"""ScaleMAE encoder-geometry and conversion fidelity.

A minimal torch implementation of the ScaleMAE encoder (the geometry the
reference wraps, torch_em/model/vit.py:558: timm blocks + resolution-scaled
2D sincos position embeddings, no final norm) is built with random weights,
converted via ``load_scalemae_weights``, and compared numerically on a fixed
448-free input size (the internal resize is identity when the input already
matches ``input_size``, isolating the geometry from resampling differences).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# ---- the reference's functional pos embed (vit.py:484-541), numpy form ----

def ref_pos_embed_with_resolution(embed_dim, grid_size, res):
    grid_1d = np.arange(grid_size, dtype=np.float32)
    gx, gy = np.meshgrid(grid_1d, grid_1d, indexing="xy")
    grid = np.stack([gx, gy])                                 # (2, h, w)
    grid = np.einsum("chw,n->cnhw", grid, res)

    def emb_1d(pos):
        d = embed_dim // 2
        omega = np.arange(d // 2, dtype=np.float32) / (d / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate([emb_1d(grid[0]), emb_1d(grid[1])], axis=1)
    emb = emb.reshape(res.shape[0], grid_size * grid_size, embed_dim)
    zeros = np.zeros((res.shape[0], 1, embed_dim), np.float32)
    return np.concatenate([zeros, emb], axis=1)


class TorchTimmBlock(tnn.Module):
    def __init__(self, dim, num_heads, mlp_ratio):
        super().__init__()
        self.num_heads = num_heads
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.fc1 = tnn.Linear(dim, int(dim * mlp_ratio))
        self.fc2 = tnn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x):
        b, n, d = x.shape
        hd = d // self.num_heads
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(b, n, 3, self.num_heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.proj(h)
        h = self.norm2(x)
        return x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))


class TorchScaleMAE(tnn.Module):
    """Minimal ScaleMAE encoder: patch embed, cls token, functional pos embed,
    timm blocks, chunked intermediates, NO final norm (reference vit.py:608)."""

    def __init__(self, input_size, patch_size, dim, depth, num_heads, mlp_ratio,
                 base_resolution):
        super().__init__()
        self.input_size, self.patch_size = input_size, patch_size
        self.dim, self.depth = dim, depth
        self.base_resolution = base_resolution
        self.patch_embed = tnn.Conv2d(3, dim, patch_size, stride=patch_size)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim))
        self.blocks = tnn.ModuleList(
            [TorchTimmBlock(dim, num_heads, mlp_ratio) for _ in range(depth)])

    def forward(self, x):
        b, _, h, w = x.shape
        assert (h, w) == (self.input_size, self.input_size)
        res = np.full((b,), self.base_resolution, np.float32)  # identity crop
        g = self.input_size // self.patch_size
        tok = self.patch_embed(x).flatten(2).transpose(1, 2)
        tok = torch.cat([self.cls_token.expand(b, -1, -1), tok], dim=1)
        tok = tok + torch.from_numpy(
            ref_pos_embed_with_resolution(self.dim, g, res))

        chunk = self.depth // 4
        keep = {chunk - 1, 2 * chunk - 1, 3 * chunk - 1, 4 * chunk - 1}

        def to_grid(t):
            return t[:, 1:].reshape(b, g, g, self.dim).permute(0, 3, 1, 2)

        inter = []
        for i, blk in enumerate(self.blocks):
            tok = blk(tok)
            if i in keep:
                inter.append(to_grid(tok))
        return to_grid(tok), inter

    def timm_state_dict(self):
        out = {"cls_token": self.cls_token.data,
               "patch_embed.proj.weight": self.patch_embed.weight.data,
               "patch_embed.proj.bias": self.patch_embed.bias.data}
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}"
            out[f"{p}.norm1.weight"] = blk.norm1.weight.data
            out[f"{p}.norm1.bias"] = blk.norm1.bias.data
            out[f"{p}.attn.qkv.weight"] = blk.qkv.weight.data
            out[f"{p}.attn.qkv.bias"] = blk.qkv.bias.data
            out[f"{p}.attn.proj.weight"] = blk.proj.weight.data
            out[f"{p}.attn.proj.bias"] = blk.proj.bias.data
            out[f"{p}.norm2.weight"] = blk.norm2.weight.data
            out[f"{p}.norm2.bias"] = blk.norm2.bias.data
            out[f"{p}.mlp.fc1.weight"] = blk.fc1.weight.data
            out[f"{p}.mlp.fc1.bias"] = blk.fc1.bias.data
            out[f"{p}.mlp.fc2.weight"] = blk.fc2.weight.data
            out[f"{p}.mlp.fc2.bias"] = blk.fc2.bias.data
        # artifacts a real MAE checkpoint carries that the converter must skip
        out["pos_embed"] = torch.zeros(1, 17, self.dim)
        out["norm.weight"] = torch.ones(self.dim)
        out["norm.bias"] = torch.zeros(self.dim)
        out["mask_token"] = torch.zeros(1, 1, self.dim)
        return out


class TorchMAE(tnn.Module):
    """Minimal MAE encoder (reference vit.py:212 ViT_MAE): cls token +
    LEARNED pos embed over [cls + patches], chunked intermediates kept [:3],
    no final norm."""

    def __init__(self, img_size, patch_size, dim, depth, num_heads, mlp_ratio):
        super().__init__()
        self.img_size, self.patch_size = img_size, patch_size
        self.dim, self.depth = dim, depth
        g = img_size // patch_size
        self.patch_embed = tnn.Conv2d(3, dim, patch_size, stride=patch_size)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.randn(1, g * g + 1, dim))
        self.blocks = tnn.ModuleList(
            [TorchTimmBlock(dim, num_heads, mlp_ratio) for _ in range(depth)])

    def forward(self, x):
        b = x.shape[0]
        g = self.img_size // self.patch_size
        tok = self.patch_embed(x).flatten(2).transpose(1, 2)
        tok = torch.cat([self.cls_token.expand(b, -1, -1), tok], dim=1)
        tok = tok + self.pos_embed

        chunk = self.depth // 4
        keep = {chunk - 1, 2 * chunk - 1, 3 * chunk - 1, 4 * chunk - 1}

        def to_grid(t):
            return t[:, 1:].reshape(b, g, g, self.dim).permute(0, 3, 1, 2)

        inter = []
        for i, blk in enumerate(self.blocks):
            tok = blk(tok)
            if i in keep:
                inter.append(to_grid(tok))
        return to_grid(tok), inter[:3]

    def timm_state_dict(self):
        out = {"cls_token": self.cls_token.data,
               "pos_embed": self.pos_embed.data,
               "patch_embed.proj.weight": self.patch_embed.weight.data,
               "patch_embed.proj.bias": self.patch_embed.bias.data,
               # pretrain-checkpoint artifacts the converter must skip
               "mask_token": torch.zeros(1, 1, self.dim),
               "decoder_embed.weight": torch.zeros(self.dim, self.dim),
               "norm.weight": torch.ones(self.dim),
               "norm.bias": torch.zeros(self.dim)}
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}"
            out[f"{p}.norm1.weight"] = blk.norm1.weight.data
            out[f"{p}.norm1.bias"] = blk.norm1.bias.data
            out[f"{p}.attn.qkv.weight"] = blk.qkv.weight.data
            out[f"{p}.attn.qkv.bias"] = blk.qkv.bias.data
            out[f"{p}.attn.proj.weight"] = blk.proj.weight.data
            out[f"{p}.attn.proj.bias"] = blk.proj.bias.data
            out[f"{p}.norm2.weight"] = blk.norm2.weight.data
            out[f"{p}.norm2.bias"] = blk.norm2.bias.data
            out[f"{p}.mlp.fc1.weight"] = blk.fc1.weight.data
            out[f"{p}.mlp.fc1.bias"] = blk.fc1.bias.data
            out[f"{p}.mlp.fc2.weight"] = blk.fc2.weight.data
            out[f"{p}.mlp.fc2.bias"] = blk.fc2.bias.data
        return out


class TestMAEConversion:
    def test_conversion_matches_torch(self, tmp_path):
        from torch_em_tpu.models.scalemae import MAEViT, load_mae_weights

        tm = TorchMAE(img_size=32, patch_size=8, dim=32, depth=8,
                      num_heads=2, mlp_ratio=2).eval()
        fm = MAEViT(img_size=32, patch_size=8, embed_dim=32, depth=8,
                    num_heads=2, mlp_ratio=2)

        ckpt = tmp_path / "mae.pth"
        torch.save({"model": tm.timm_state_dict()}, ckpt)

        x = np.random.default_rng(3).standard_normal((2, 3, 32, 32)).astype("float32")
        variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = load_mae_weights(variables, str(ckpt))

        out_f, inter_f = fm.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            out_t, inter_t = tm(torch.from_numpy(x))

        np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(), atol=3e-5)
        assert len(inter_f) == len(inter_t) == 3
        for a, b in zip(inter_f, inter_t):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=3e-5)

    def test_pos_embed_size_mismatch_rejected(self):
        from torch_em_tpu.models.scalemae import MAEViT, load_mae_weights

        fm = MAEViT(img_size=32, patch_size=8, embed_dim=16, depth=4,
                    num_heads=2, mlp_ratio=2)
        x = jnp.zeros((1, 3, 32, 32), jnp.float32)
        variables = fm.init(jax.random.PRNGKey(0), x)
        bad = {"pos_embed": np.zeros((1, 99, 16), np.float32)}
        with pytest.raises(ValueError):
            load_mae_weights(variables, bad)

    def test_factory_routes_mae(self):
        from torch_em_tpu.models.scalemae import MAEViT
        from torch_em_tpu.models.vit import get_vision_transformer

        m = get_vision_transformer(backbone="mae", model="vit_h", img_size=224)
        assert isinstance(m, MAEViT) and m.patch_size == 14


class TestScaleMAEConversion:
    def test_conversion_matches_torch(self, tmp_path):
        from torch_em_tpu.models.scalemae import ScaleMAEViT, load_scalemae_weights

        tm = TorchScaleMAE(input_size=32, patch_size=8, dim=32, depth=8,
                           num_heads=2, mlp_ratio=2, base_resolution=2.5).eval()
        fm = ScaleMAEViT(input_size=32, patch_size=8, embed_dim=32, depth=8,
                         num_heads=2, mlp_ratio=2, base_resolution=2.5)

        ckpt = tmp_path / "scalemae.pth"
        torch.save({"model": tm.timm_state_dict()}, ckpt)

        x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype("float32")
        variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = load_scalemae_weights(variables, str(ckpt))

        out_f, inter_f = fm.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            out_t, inter_t = tm(torch.from_numpy(x))

        np.testing.assert_allclose(np.asarray(out_f), out_t.numpy(), atol=3e-5)
        assert len(inter_f) == len(inter_t) == 4
        for a, b in zip(inter_f, inter_t):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=3e-5)

    def test_resolution_scales_pos_embed(self):
        # doubling base_resolution must change the embeddings (the ScaleMAE
        # premise), while the zero cls row stays zero
        from torch_em_tpu.models.scalemae import sincos_pos_embed_with_resolution

        e1 = sincos_pos_embed_with_resolution(16, 4, jnp.asarray([1.0]))
        e2 = sincos_pos_embed_with_resolution(16, 4, jnp.asarray([2.0]))
        assert not np.allclose(np.asarray(e1), np.asarray(e2))
        np.testing.assert_array_equal(np.asarray(e1[:, 0]), 0.0)
        # and it must match the reference formula exactly
        np.testing.assert_allclose(
            np.asarray(e1)[0], ref_pos_embed_with_resolution(16, 4, np.ones(1))[0],
            atol=1e-6)

    def test_internal_resize_and_res_scaling(self):
        # a non-448 input is resized and its resolution rescaled:
        # feeding the same content at different sizes changes input_res
        from torch_em_tpu.models.scalemae import ScaleMAEViT

        fm = ScaleMAEViT(input_size=32, patch_size=8, embed_dim=16, depth=4,
                         num_heads=2, mlp_ratio=2)
        x64 = np.random.default_rng(1).standard_normal((1, 3, 64, 64)).astype("float32")
        variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x64))
        out, inter = fm.apply(variables, jnp.asarray(x64))
        assert out.shape == (1, 16, 4, 4)
        assert len(inter) == 4

    def test_factory_and_strict_reject(self, tmp_path):
        from torch_em_tpu.models.scalemae import ScaleMAEViT, load_scalemae_weights
        from torch_em_tpu.models.vit import get_vision_transformer

        m = get_vision_transformer(backbone="scalemae", model="vit_b")
        assert isinstance(m, ScaleMAEViT) and m.patch_size == 8

        fm = ScaleMAEViT(input_size=32, patch_size=8, embed_dim=16, depth=4,
                         num_heads=2, mlp_ratio=2)
        x = jnp.zeros((1, 3, 32, 32), jnp.float32)
        variables = fm.init(jax.random.PRNGKey(0), x)
        with pytest.raises(KeyError):
            load_scalemae_weights(variables, {"blocks.99.bogus": np.zeros(3)})