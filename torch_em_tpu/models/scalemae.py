"""Native ScaleMAE vision-transformer encoder.

Faithful re-implementation of the geometry the reference wraps
(reference torch_em/model/vit.py:558 ``ViT_ScaleMAE``): a timm-style ViT whose
position embeddings are *functional* — 2D sincos embeddings scaled by the
physical resolution of the input pixels (reference vit.py:484
``get_2d_sincos_pos_embed_with_resolution``), so the same weights transfer
across zoom factors. TPU-first: the resolution-aware tables are computed with
jnp ops inside the trace (static shapes; ``input_res`` is a traced scalar so
changing physical resolution does NOT recompile), blocks lower to MXU matmuls
via the shared sequence-attention module.

Reference behavior mirrored exactly:
 - inputs are bicubic-resized to ``input_size`` (448) and the per-sample
   resolution becomes ``(W_src / 448) * base_resolution`` (reference
   vit.py:581-597: a deterministic full-image RandomResizedCrop with
   scale=ratio=(1,1), dx = source width).
 - the sincos grid is built with xy-indexed meshgrid and the h/w halves
   concatenated in the reference's order (vit.py:511-521).
 - block outputs are collected in depth/4 chunks; the final output skips the
   trailing LayerNorm (vit.py:608-644 ``forward_features`` applies no norm).
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .dino import _DinoBlock


def sincos_pos_embed_with_resolution(embed_dim, grid_size, res, cls_token=True):
    """Resolution-scaled 2D sincos position embeddings (reference vit.py:484).

    ``res`` is a traced (n,) array of per-sample pixel resolutions; returns
    (n, grid_size**2 [+1], embed_dim).
    """
    grid_1d = np.arange(grid_size, dtype=np.float32)
    gx, gy = np.meshgrid(grid_1d, grid_1d, indexing="xy")      # each (h, w)
    grid = np.stack([gx, gy])                                  # (2, h, w)
    # scale the integer grid by the per-sample resolution
    grid = jnp.einsum("chw,n->cnhw", jnp.asarray(grid), res)   # (2, n, h, w)

    def emb_1d(pos):
        d = embed_dim // 2
        omega = np.arange(d // 2, dtype=np.float32) / (d / 2.0)
        omega = 1.0 / 10000 ** omega                           # (d/2,)
        out = jnp.einsum("m,d->md", pos.reshape(-1), jnp.asarray(omega))
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)  # (M, d)

    emb = jnp.concatenate([emb_1d(grid[0]), emb_1d(grid[1])], axis=1)
    n = res.shape[0]
    emb = emb.reshape(n, grid_size * grid_size, embed_dim)
    if cls_token:
        emb = jnp.concatenate(
            [jnp.zeros((n, 1, embed_dim), emb.dtype), emb], axis=1)
    return emb


class ScaleMAEViT(nn.Module):
    """ScaleMAE encoder (reference vit.py:558). Call: x (N, C, H, W) ->
    (grid (N, embed_dim, 56, 56), [4 intermediate grids]); inputs are
    internally resized to ``input_size`` and the sincos embeddings scaled by
    ``(W / input_size) * base_resolution``."""

    img_size: int = 224          # kept for config parity; the transform wins
    input_size: int = 448        # the fixed post-transform size
    patch_size: int = 8
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    base_resolution: float = 2.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, _, h_in, w_in = x.shape
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        if (h_in, w_in) != (self.input_size, self.input_size):
            h = jax.image.resize(
                h, (b, self.input_size, self.input_size, h.shape[-1]), method="cubic")
        input_res = jnp.full((b,), (w_in / self.input_size) * self.base_resolution,
                             jnp.float32)

        h = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), name="patch_embed")(h)
        g = self.input_size // self.patch_size
        tokens = h.reshape(b, g * g, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.normal(0.02),
                               (1, 1, self.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)).astype(self.dtype),
             tokens], axis=1)
        pos = sincos_pos_embed_with_resolution(self.embed_dim, g, input_res)
        tokens = tokens + pos.astype(self.dtype)

        def to_grid(t):
            return jnp.transpose(
                t[:, 1:].reshape(b, g, g, self.embed_dim), (0, 3, 1, 2)
            ).astype(jnp.float32)

        # chunk indices for the UNETR skips (reference vit.py:627-637)
        chunk = self.depth // 4
        chunk_idx = {chunk - 1, 2 * chunk - 1, 3 * chunk - 1, 4 * chunk - 1}

        intermediates = []
        for i in range(self.depth):
            tokens = _DinoBlock(self.num_heads, self.mlp_ratio, eps=1e-6,
                                layerscale=False, dtype=self.dtype,
                                name=f"block{i}")(tokens)
            if i in chunk_idx:
                intermediates.append(to_grid(tokens))

        # NOTE: the reference forward_features applies NO final norm
        return to_grid(tokens), intermediates


SCALEMAE_CONFIGS = {
    # reference vit.py:898-923 — all scalemae models use patch_size 8
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, patch_size=8),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, patch_size=8),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16, patch_size=8),
}


class MAEViT(nn.Module):
    """MAE encoder (reference vit.py:212 ``ViT_MAE``): a timm ViT with cls
    token and learned position embeddings over [cls + patches]; block outputs
    collected in depth/4 chunks, first three returned for UNETR skips; NO
    final norm (reference forward_features:253-277). Call:
    x (N, C, H, W) -> (grid (N, embed_dim, H/p, W/p), [3 intermediate grids]).

    The learned pos embed is bicubic-interpolated (patch part only) when the
    input grid differs from the pretraining grid."""

    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        h = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), name="patch_embed")(h)
        gh, gw = h.shape[1], h.shape[2]
        tokens = h.reshape(b, gh * gw, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.normal(0.02),
                               (1, 1, self.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)).astype(self.dtype),
             tokens], axis=1)

        grid0 = self.img_size // self.patch_size
        pos_embed = self.param("pos_embed", nn.initializers.normal(0.02),
                               (1, grid0 * grid0 + 1, self.embed_dim))
        if (gh, gw) != (grid0, grid0):
            cls_pe, patch_pe = pos_embed[:, :1], pos_embed[:, 1:]
            patch_pe = jax.image.resize(
                patch_pe.reshape(1, grid0, grid0, self.embed_dim),
                (1, gh, gw, self.embed_dim), method="cubic",
            ).reshape(1, gh * gw, self.embed_dim)
            pos_embed = jnp.concatenate([cls_pe, patch_pe], axis=1)
        tokens = tokens + pos_embed.astype(self.dtype)

        def to_grid(t):
            return jnp.transpose(
                t[:, 1:].reshape(b, gh, gw, self.embed_dim), (0, 3, 1, 2)
            ).astype(jnp.float32)

        chunk = self.depth // 4
        chunk_idx = {chunk - 1, 2 * chunk - 1, 3 * chunk - 1, 4 * chunk - 1}

        intermediates = []
        for i in range(self.depth):
            tokens = _DinoBlock(self.num_heads, self.mlp_ratio, eps=1e-6,
                                layerscale=False, dtype=self.dtype,
                                name=f"block{i}")(tokens)
            if i in chunk_idx and len(intermediates) < 3:
                intermediates.append(to_grid(tokens))

        # reference ViT_MAE applies no final norm and keeps list[:3]
        return to_grid(tokens), intermediates


MAE_CONFIGS = {
    # reference vit.py:879-896 — vit_h uses patch_size 14
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, patch_size=16),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, patch_size=16),
    "vit_h": dict(embed_dim=1280, depth=32, num_heads=16, patch_size=14),
}


def load_mae_weights(variables, checkpoint_path, strict: bool = True):
    """Convert an MAE torch checkpoint (facebookresearch/mae pretrain or
    fine-tune layout) into the native flax params. Unlike ScaleMAE the
    learned ``pos_embed`` IS loaded (interpolated at call time for other
    input sizes); decoder tensors, ``mask_token``, the unused trailing
    ``norm``/``fc_norm`` and classification heads are skipped."""
    if isinstance(checkpoint_path, dict):
        state = {k: np.asarray(v) for k, v in checkpoint_path.items()}
    else:
        import torch

        state = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
        if isinstance(state, dict) and "model" in state and isinstance(state["model"], dict):
            state = state["model"]
        state = {k: np.asarray(v.detach().float().numpy()) for k, v in state.items()}

    params = jax.device_get(variables["params"])
    target_pe = params["pos_embed"]
    if "pos_embed" in state and state["pos_embed"].shape != target_pe.shape:
        raise ValueError(
            f"pos_embed shape {state['pos_embed'].shape} does not match the model "
            f"({target_pe.shape}); build the encoder with the checkpoint's img_size.")

    # the shared converter handles everything but pos_embed (which it treats
    # as a functional-embedding artifact and skips)
    out = load_scalemae_weights({"params": params}, state, strict=strict)
    params = out["params"]

    if "pos_embed" in state:
        params["pos_embed"] = state["pos_embed"].astype(target_pe.dtype)
    elif strict:
        raise KeyError("Checkpoint is missing key 'pos_embed'")
    return {"params": params}


def load_scalemae_weights(variables, checkpoint_path, strict: bool = True):
    """Convert a ScaleMAE torch checkpoint (timm VisionTransformer layout)
    into the native flax params. The learned ``pos_embed`` of plain-MAE
    checkpoints is ignored — ScaleMAE's position embeddings are functional
    (resolution-scaled sincos). Decoder tensors (``decoder_*``,
    ``mask_token``) and the trailing ``norm`` (unused by forward_features,
    reference vit.py:608-640) are skipped.
    """
    if isinstance(checkpoint_path, dict):
        state = {k: np.asarray(v) for k, v in checkpoint_path.items()}
    else:
        import torch

        state = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
        if isinstance(state, dict) and "model" in state and isinstance(state["model"], dict):
            state = state["model"]
        state = {k: np.asarray(v.detach().float().numpy()) for k, v in state.items()}

    params = jax.device_get(variables["params"])
    used = set()

    def take(key):
        used.add(key)
        if key not in state:
            if strict:
                raise KeyError(f"Checkpoint is missing key '{key}'")
            return None
        return state[key]

    def set_(path, value):
        if value is None:
            return
        node = params
        for p in path[:-1]:
            node = node[p]
        target = node[path[-1]]
        assert target.shape == value.shape, (path, target.shape, value.shape)
        node[path[-1]] = value.astype(target.dtype)

    set_(("cls_token",), take("cls_token"))
    w = take("patch_embed.proj.weight")
    if w is not None:
        set_(("patch_embed", "kernel"), np.transpose(w, (2, 3, 1, 0)))
    set_(("patch_embed", "bias"), take("patch_embed.proj.bias"))

    n_blocks = sum(1 for k in params if k.startswith("block"))
    for i in range(n_blocks):
        blk = f"blocks.{i}"
        for ln in ("norm1", "norm2"):
            set_((f"block{i}", ln, "scale"), take(f"{blk}.{ln}.weight"))
            set_((f"block{i}", ln, "bias"), take(f"{blk}.{ln}.bias"))
        set_((f"block{i}", "attn", "qkv", "kernel"), take(f"{blk}.attn.qkv.weight").T)
        set_((f"block{i}", "attn", "qkv", "bias"), take(f"{blk}.attn.qkv.bias"))
        set_((f"block{i}", "attn", "proj", "kernel"), take(f"{blk}.attn.proj.weight").T)
        set_((f"block{i}", "attn", "proj", "bias"), take(f"{blk}.attn.proj.bias"))
        set_((f"block{i}", "mlp_fc1", "kernel"), take(f"{blk}.mlp.fc1.weight").T)
        set_((f"block{i}", "mlp_fc1", "bias"), take(f"{blk}.mlp.fc1.bias"))
        set_((f"block{i}", "mlp_fc2", "kernel"), take(f"{blk}.mlp.fc2.weight").T)
        set_((f"block{i}", "mlp_fc2", "bias"), take(f"{blk}.mlp.fc2.bias"))

    if strict:
        ignorable = ("pos_embed", "mask_token", "norm.", "fc_norm", "head",
                     "decoder_")
        leftover = {k for k in state if k not in used
                    and not k.startswith(ignorable)}
        if leftover:
            raise KeyError(f"Unconsumed checkpoint keys: {sorted(leftover)[:8]} ...")
    return {"params": params}
