"""SAM3 perception-encoder (vitdet) image encoder, native flax.

Rebuild of the geometry the reference wraps in ``ViT_Sam3``
(torch_em/model/vit.py:356-470, which subclasses the external
``sam3.model.vitdet.ViT``), at the reference's fixed "vit_pe" configuration
(torch_em/model/vit.py:865-877): 1008 px input, 14 px patches, embed 1024,
depth 32, 16 heads, mlp ratio 4.625, window size 24 with global attention at
blocks (7, 15, 23, 31), TILED absolute position embeddings from the 336 px
pretraining grid, pre-transformer LayerNorm (``ln_pre``), interpolated 2D
axial RoPE inside every attention, no rel-pos tables, no ln_post, no neck.

Geometry notes (what "tiled"/"interpolated" mean here):

- ``tile_abs_pos``: the pretraining grid is 336/14 = 24 tokens per side and
  the finetuning grid 1008/14 = 72 = 3x24, so the absolute position table is
  tiled 3x3 across the larger grid instead of being bilinearly resized (the
  vitdet ``get_abs_pos(..., tiling=True)`` behavior the reference calls at
  vit.py:391). Non-multiple grids fall back to bilinear interpolation.
- ``use_interp_rope``: windows are exactly one pretraining grid (24x24), so
  windowed attention uses native token coordinates; the four global blocks
  attend over the full 72x72 grid with coordinates RESCALED by 24/72 so the
  rotary angles span the same range as pretraining.

The RoPE itself is the axial 2D form used by the perception-encoder family
(quarter of the head dim rotates with the x coordinate, a quarter with y,
consecutive channel pairs forming the complex planes).

The external sam3 package is not importable in this environment, so exact
upstream fidelity cannot be asserted against facebookresearch/sam3 directly;
the conversion path is therefore STRICT (every tensor must map, every mapped
shape must match) so a layout drift in a real checkpoint fails loudly instead
of silently computing a different function. The converter itself is verified
numerically against a torch implementation of this documented geometry in
tests/test_sam3_conversion.py (same methodology as the SAM/SAM2/DINO/MAE
converter tests).
"""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Sam3ViT", "SAM3_CONFIG", "load_sam3_weights"]

# the reference's fixed "vit_pe" configuration (torch_em/model/vit.py:871-877)
SAM3_CONFIG = dict(
    img_size=1008, pretrain_img_size=336, patch_size=14, embed_dim=1024,
    depth=32, num_heads=16, mlp_ratio=4.625, window_size=24,
    global_attn_indexes=(7, 15, 23, 31),
)


def _axial_rope_angles(gh, gw, head_dim, scale_h=1.0, scale_w=1.0, theta=10000.0):
    """Rotation angles for axial 2D RoPE over a (gh, gw) token grid.

    Returns (gh*gw, head_dim//2): the first head_dim//4 angle channels rotate
    with the x (column) coordinate, the rest with y (row). ``scale_*``
    rescales the coordinates (interpolated RoPE for grids larger than the
    pretraining span).
    """
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (np.arange(quarter, dtype=np.float64) * 4.0 / head_dim))
    ty, tx = np.meshgrid(
        np.arange(gh, dtype=np.float64) * scale_h,
        np.arange(gw, dtype=np.float64) * scale_w,
        indexing="ij",
    )
    ang_x = tx.reshape(-1)[:, None] * freqs[None, :]
    ang_y = ty.reshape(-1)[:, None] * freqs[None, :]
    return jnp.asarray(np.concatenate([ang_x, ang_y], axis=1), dtype=jnp.float32)


def _apply_rope(x, angles):
    """Rotate consecutive channel pairs of x (B, L, d) by angles (L, d//2)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    cos = jnp.cos(angles)[None, :, :, None]
    sin = jnp.sin(angles)[None, :, :, None]
    x1, x2 = xf[..., :1], xf[..., 1:]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return rot.reshape(x.shape).astype(orig_dtype)


def _tile_or_resize_pos(pos, gh, gw):
    """vitdet ``get_abs_pos(..., tiling=True)``: tile the pretraining grid
    across an exact-multiple target grid, otherwise bilinearly resize."""
    ph, pw = pos.shape[1], pos.shape[2]
    if (gh, gw) == (ph, pw):
        return pos
    if gh % ph == 0 and gw % pw == 0:
        return jnp.tile(pos, (1, gh // ph, gw // pw, 1))
    return jax.image.resize(pos, (1, gh, gw, pos.shape[-1]), method="bilinear")


class _RopeAttention(nn.Module):
    """Multi-head attention with axial 2D RoPE on q and k (no rel-pos)."""

    num_heads: int
    # pretraining grid side: spans larger than this get their coordinates
    # rescaled into it (interpolated RoPE)
    pretrain_grid: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b * self.num_heads, h * w, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]

        scale_h = min(1.0, self.pretrain_grid / h)
        scale_w = min(1.0, self.pretrain_grid / w)
        angles = _axial_rope_angles(h, w, head_dim, scale_h=scale_h, scale_w=scale_w)
        q = _apply_rope(q, angles)
        k = _apply_rope(k, angles)

        attn = jnp.einsum("bqd,bkd->bqk", q * (head_dim ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkd->bqd", attn, v)
        out = out.reshape(b, self.num_heads, h * w, head_dim).transpose(0, 2, 1, 3)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out.reshape(b, h * w, c))
        return out.reshape(b, h, w, c)


class _Sam3Block(nn.Module):
    num_heads: int
    mlp_ratio: float
    window_size: int  # 0 = global attention
    pretrain_grid: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .vit import _window_partition, _window_unpartition

        c = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            hw = h.shape[1], h.shape[2]
            h, pad_hw = _window_partition(h, self.window_size)
        attn = _RopeAttention(self.num_heads, pretrain_grid=self.pretrain_grid,
                              dtype=self.dtype, name="attn")(h)
        if self.window_size > 0:
            attn = _window_unpartition(attn, self.window_size, pad_hw, hw)
        x = x + attn
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_lin1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, name="mlp_lin2")(h)
        return x + h


class Sam3ViT(nn.Module):
    """SAM3 vitdet encoder; call contract matches the SAM family ViT:
    x (N, C, H, W) -> (features (N, embed_dim, H/14, W/14), [intermediates at
    each global block, same layout])."""

    img_size: int = 1008
    pretrain_img_size: int = 336
    patch_size: int = 14
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.625
    window_size: int = 24
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        # bias_patch_embed=False in the reference config
        h = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), use_bias=False,
                    name="patch_embed")(h)
        gh, gw = h.shape[1], h.shape[2]

        pre_grid = self.pretrain_img_size // self.patch_size
        # pretrain_use_cls_token=True: the stored table has a leading cls row;
        # retain_cls_token=False: it is dropped before the spatial tile
        pos_embed = self.param("pos_embed", nn.initializers.normal(0.02),
                               (1, pre_grid * pre_grid + 1, self.embed_dim))
        pos_spatial = pos_embed[:, 1:].reshape(1, pre_grid, pre_grid, self.embed_dim)
        h = h + _tile_or_resize_pos(pos_spatial, gh, gw).astype(self.dtype)
        h = nn.LayerNorm(dtype=self.dtype, name="ln_pre")(h)

        intermediates = []
        for i in range(self.depth):
            is_global = i in self.global_attn_indexes
            h = _Sam3Block(
                self.num_heads, self.mlp_ratio,
                window_size=0 if is_global else self.window_size,
                pretrain_grid=pre_grid, dtype=self.dtype, name=f"block{i}",
            )(h)
            if is_global:
                # ln_post=False in the reference config, so the last global
                # block's output is the final feature map as-is
                intermediates.append(jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32))

        out = jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)
        return out, intermediates


def load_sam3_weights(variables, checkpoint_path: str, strict: bool = True):
    """Convert a SAM3 vitdet torch checkpoint into :class:`Sam3ViT` params.

    Accepts a raw vitdet state dict or a full-model dict (``model`` envelope;
    vision-encoder keys under common prefixes are stripped). MLP layers are
    accepted under both ``mlp.fc{1,2}`` and ``mlp.lin{1,2}`` names. With
    ``strict=True`` any unmapped tensor or shape mismatch raises.
    """
    import torch

    state = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state and isinstance(state["model"], dict):
        state = state["model"]
    for prefix in ("image_encoder.trunk.", "image_encoder.", "vision_encoder.", "trunk.", "backbone."):
        stripped = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
        if stripped:
            state = stripped
            break

    params = jax.device_get(variables["params"])
    converted, skipped = 0, []

    def _set(path, value):
        nonlocal converted
        node = params
        for p in path[:-1]:
            if p not in node:
                skipped.append(".".join(path))
                return
            node = node[p]
        if path[-1] not in node or node[path[-1]].shape != value.shape:
            skipped.append(".".join(path))
            return
        node[path[-1]] = value.astype(node[path[-1]].dtype)
        converted += 1

    for name, tensor in state.items():
        t = tensor.numpy()
        if name == "patch_embed.proj.weight":
            _set(["patch_embed", "kernel"], t.transpose(2, 3, 1, 0))
        elif name == "pos_embed":
            _set(["pos_embed"], t.reshape(1, -1, t.shape[-1]))
        elif name in ("ln_pre.weight", "ln_pre.bias"):
            _set(["ln_pre", "scale" if name.endswith("weight") else "bias"], t)
        elif name.startswith("blocks."):
            parts = name.split(".")
            idx, rest = int(parts[1]), ".".join(parts[2:])
            blk = f"block{idx}"
            if rest in ("norm1.weight", "norm1.bias", "norm2.weight", "norm2.bias"):
                which, kind = rest.split(".")
                _set([blk, which, "scale" if kind == "weight" else "bias"], t)
            elif rest == "attn.qkv.weight":
                _set([blk, "attn", "qkv", "kernel"], t.T)
            elif rest == "attn.qkv.bias":
                _set([blk, "attn", "qkv", "bias"], t)
            elif rest == "attn.proj.weight":
                _set([blk, "attn", "proj", "kernel"], t.T)
            elif rest == "attn.proj.bias":
                _set([blk, "attn", "proj", "bias"], t)
            elif rest in ("mlp.fc1.weight", "mlp.lin1.weight"):
                _set([blk, "mlp_lin1", "kernel"], t.T)
            elif rest in ("mlp.fc1.bias", "mlp.lin1.bias"):
                _set([blk, "mlp_lin1", "bias"], t)
            elif rest in ("mlp.fc2.weight", "mlp.lin2.weight"):
                _set([blk, "mlp_lin2", "kernel"], t.T)
            elif rest in ("mlp.fc2.bias", "mlp.lin2.bias"):
                _set([blk, "mlp_lin2", "bias"], t)
            else:
                skipped.append(name)
        else:
            skipped.append(name)

    if strict and skipped:
        raise ValueError(
            f"load_sam3_weights(strict=True): {len(skipped)} tensors did not map "
            f"onto the Sam3ViT parameter tree: {skipped[:10]}{'...' if len(skipped) > 10 else ''}")
    new_vars = dict(variables)
    new_vars["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    return new_vars, converted, skipped
