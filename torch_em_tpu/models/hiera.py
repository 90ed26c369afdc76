"""Native flax Hiera (SAM2 image-encoder trunk) + FPN neck.

Rebuild of the geometry the reference wraps in ``ViT_Sam2``
(torch_em/model/vit.py:291 — which imports facebook's sam2
``Hiera``/``FpnNeck``): a hierarchical windowed-attention transformer with
four stages, q-pooling at the stage transitions, a background+window additive
position embedding, and a 256-channel FPN neck whose top-down pathway touches
only ``fpn_top_down_levels``. Output contract matches :class:`..vit.ViT`:
``(final_features, [per-stage features])``, channel-first, so UNETR consumes
either encoder uniformly.

TPU notes: everything is channels-last internally, attention runs in merged
(B*windows) batches (static shapes per stage), and the bicubic position-embed
interpolation is precomputed as two static matrices (matmul instead of a
gather-based resize) that exactly reproduce torch's ``bicubic`` kernel
(a=-0.75, half-pixel sampling, clamped borders).
"""

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .vit import _window_partition, _window_unpartition

__all__ = ["HieraSam2", "HIERA_CONFIGS", "load_sam2_weights"]


def _torch_bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Interpolation matrix reproducing ``torch.nn.functional.interpolate``
    (mode='bicubic', align_corners=False): cubic-convolution kernel with
    a=-0.75, half-pixel source sampling, indices clamped at the borders."""
    a = -0.75

    def cubic(x):
        x = abs(x)
        if x <= 1.0:
            return (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0
        if x < 2.0:
            return a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a
        return 0.0

    w = np.zeros((n_out, n_in), dtype=np.float64)
    scale = n_in / n_out
    for o in range(n_out):
        src = (o + 0.5) * scale - 0.5
        f = math.floor(src)
        t = src - f
        for k in range(-1, 3):
            idx = min(max(f + k, 0), n_in - 1)
            w[o, idx] += cubic(k - t)
    return w.astype(np.float32)


def _bicubic_resize_2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Torch-matching bicubic resize of (1, H, W, C) along H and W."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = jnp.asarray(_torch_bicubic_matrix(h_in, h_out))
    mw = jnp.asarray(_torch_bicubic_matrix(w_in, w_out))
    x = jnp.einsum("oh,bhwc->bowc", mh, x.astype(jnp.float32))
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


def _max_pool_2x2(x: jnp.ndarray, stride: Tuple[int, int]) -> jnp.ndarray:
    """Stride-window max pool of (B, H, W, C) (torch MaxPool2d, floor mode)."""
    sh, sw = stride
    b, h, w, c = x.shape
    h2, w2 = h // sh, w // sw
    x = x[:, : h2 * sh, : w2 * sw]
    x = x.reshape(b, h2, sh, w2, sw, c)
    return jnp.max(x, axis=(2, 4))


class _MultiScaleAttention(nn.Module):
    """sam2 ``MultiScaleAttention``: joint qkv to ``dim_out``, optional 2x2
    max-pool of q (spatial downsample; k/v stay at input resolution)."""

    dim_out: int
    num_heads: int
    q_stride: Optional[Tuple[int, int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        head_dim = self.dim_out // self.num_heads
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(
            x.reshape(b, h * w, -1))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.q_stride is not None:
            q = _max_pool_2x2(q.reshape(b, h, w, self.dim_out), self.q_stride)
            h, w = q.shape[1], q.shape[2]
            q = q.reshape(b, h * w, self.num_heads, head_dim)

        # (B, L, nH, d) -> (B, nH, L, d)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = jnp.einsum("bnqd,bnkd->bnqk", q * (head_dim ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class _HieraBlock(nn.Module):
    """sam2 ``MultiScaleBlock``: pre-LN attention block with optional window
    partition, q-pooling (stage transition) and a linear shortcut projection
    when the channel count changes."""

    dim_out: int
    num_heads: int
    window_size: int = 0
    q_stride: Optional[Tuple[int, int]] = None
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim_in = x.shape[-1]
        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)

        if dim_in != self.dim_out:
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(xn)
            if self.q_stride is not None:
                shortcut = _max_pool_2x2(shortcut, self.q_stride)

        ws = self.window_size
        if ws > 0:
            hw = xn.shape[1], xn.shape[2]
            xw, pad_hw = _window_partition(xn, ws)
        else:
            xw = xn

        att = _MultiScaleAttention(
            self.dim_out, self.num_heads, q_stride=self.q_stride,
            dtype=self.dtype, name="attn")(xw)

        if self.q_stride is not None:
            # shapes changed under the pooling: the output windows are
            # window_size // stride wide and target the pooled extents
            ws = self.window_size // self.q_stride[0]
            h2, w2 = shortcut.shape[1], shortcut.shape[2]
            pad_h = (ws - h2 % ws) % ws if ws > 0 else 0
            pad_w = (ws - w2 % ws) % ws if ws > 0 else 0
            pad_hw = (h2 + pad_h, w2 + pad_w)
            hw = (h2, w2)
        if self.window_size > 0:
            att = _window_unpartition(att, ws, pad_hw, hw)

        x = shortcut + att
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=self.dtype, name="mlp_lin1")(h)
        h = nn.gelu(h, approximate=False)  # torch F.gelu default: exact erf
        h = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_lin2")(h)
        return x + h


def _hiera_block_configs(embed_dim, num_heads, stages, global_att_blocks,
                         window_spec, q_pool, dim_mul, head_mul):
    """Replicates sam2 Hiera's per-block schedule: stage ends, q-pool blocks
    (= the first block of stages 2..q_pool+1), the one-block window-size lag
    at stage transitions, and dim/head doubling."""
    depth = sum(stages)
    stage_ends = [sum(stages[: i + 1]) - 1 for i in range(len(stages))]
    q_pool_blocks = [x + 1 for x in stage_ends[:q_pool]]
    cur_stage = 1
    cfgs = []
    for i in range(depth):
        dim_out = embed_dim
        # lags by one block: the stage-transition block keeps the previous
        # stage's window size (sam2 hieradet semantics)
        window_size = window_spec[cur_stage - 1]
        if i in (global_att_blocks or ()):
            window_size = 0
        if i - 1 in stage_ends:
            dim_out = int(embed_dim * dim_mul)
            num_heads = int(num_heads * head_mul)
            cur_stage += 1
        cfgs.append(dict(
            dim_out=dim_out, num_heads=num_heads, window_size=window_size,
            q_stride=(i in q_pool_blocks),
        ))
        embed_dim = dim_out
    return cfgs, stage_ends


class HieraSam2(nn.Module):
    """SAM2 image encoder (Hiera trunk + FPN neck), natively in flax.

    Call: x (N, C, H, W) -> (features (N, d_model, H/16, W/16),
    [stage features (N, d_model, H/4, W/4), (..., H/8, W/8), (..., H/16, W/16)])
    — i.e. the reference ``ViT_Sam2.forward`` contract after ``scalp`` drops
    the 1/32 level (torch_em/model/vit.py:348-354).
    """

    img_size: int = 1024
    in_chans: int = 3
    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (2, 3, 16, 3)
    global_att_blocks: Tuple[int, ...] = (12, 16, 20)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (14, 14)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    backbone_channel_list: Tuple[int, ...] = (768, 384, 192, 96)
    d_model: int = 256
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    scalp: int = 1
    q_pool: int = 3
    q_stride: Tuple[int, int] = (2, 2)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    # UNETR reads this as the skip/bottleneck channel count
    @property
    def out_chans(self):
        return self.d_model

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        # patch embed: 7x7 stride-4 conv, pad 3
        h = nn.Conv(self.embed_dim, (7, 7), strides=(4, 4), padding=((3, 3), (3, 3)),
                    dtype=self.dtype, name="patch_embed")(h)
        gh, gw = h.shape[1], h.shape[2]

        # background pos embed (bicubic to grid) + tiled window embed
        pos_bkg = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1,) + tuple(self.window_pos_embed_bkg_spatial_size) + (self.embed_dim,))
        wsz = self.window_spec[0]
        pos_win = self.param(
            "pos_embed_window", nn.initializers.normal(0.02), (1, wsz, wsz, self.embed_dim))
        pos = _bicubic_resize_2d(pos_bkg, (gh, gw))
        pos = pos + jnp.tile(pos_win, (1, gh // wsz, gw // wsz, 1))
        h = h + pos.astype(self.dtype)

        cfgs, stage_ends = _hiera_block_configs(
            self.embed_dim, self.num_heads, self.stages, self.global_att_blocks,
            self.window_spec, self.q_pool, self.dim_mul, self.head_mul)

        trunk_outs = []
        for i, cfg in enumerate(cfgs):
            h = _HieraBlock(
                dim_out=cfg["dim_out"], num_heads=cfg["num_heads"],
                window_size=cfg["window_size"],
                q_stride=self.q_stride if cfg["q_stride"] else None,
                mlp_ratio=self.mlp_ratio, dtype=self.dtype, name=f"block{i}",
            )(h)
            if i in stage_ends:
                trunk_outs.append(h)

        # FPN neck: per-level 1x1 lateral conv to d_model; nearest 2x top-down
        # only for fpn_top_down_levels (sam2 FpnNeck semantics)
        n = len(trunk_outs) - 1
        outs = [None] * len(trunk_outs)
        prev = None
        for i in range(n, -1, -1):
            lateral = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                              name=f"neck_conv{n - i}")(trunk_outs[i])
            if i in self.fpn_top_down_levels and prev is not None:
                b, ph, pw, c = prev.shape
                top = jnp.repeat(jnp.repeat(prev.astype(jnp.float32), 2, axis=1), 2, axis=2)
                lateral = lateral + top.astype(lateral.dtype)
            prev = lateral
            outs[i] = lateral

        if self.scalp > 0:
            outs = outs[: -self.scalp]
        feats = [jnp.transpose(o, (0, 3, 1, 2)).astype(jnp.float32) for o in outs]
        return feats[-1], feats


# configurations exposed by the reference (torch_em/model/vit.py:841-860)
HIERA_CONFIGS = {
    "hvit_t": dict(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                   global_att_blocks=(5, 7, 9), window_pos_embed_bkg_spatial_size=(7, 7),
                   backbone_channel_list=(768, 384, 192, 96)),
    "hvit_s": dict(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2),
                   global_att_blocks=(7, 10, 13), window_pos_embed_bkg_spatial_size=(7, 7),
                   backbone_channel_list=(768, 384, 192, 96)),
    "hvit_b": dict(embed_dim=112, num_heads=2,
                   backbone_channel_list=(896, 448, 224, 112)),
    "hvit_l": dict(embed_dim=144, num_heads=2, stages=(2, 6, 36, 4),
                   global_att_blocks=(23, 33, 43), window_spec=(8, 4, 16, 8),
                   backbone_channel_list=(1152, 576, 288, 144)),
}


def load_sam2_weights(variables, checkpoint_path: str, strict: bool = True):
    """Convert a SAM2 (Hiera) image-encoder torch checkpoint into the native
    :class:`HieraSam2` parameter tree. Accepts full sam2 checkpoints
    (``model`` wrapper, ``image_encoder.`` prefix) or bare encoder state
    dicts with ``trunk.`` / ``neck.`` prefixes. With ``strict=True`` any
    unmatched or shape-mismatched tensor raises.
    """
    import warnings

    import torch

    state = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state and isinstance(state["model"], dict):
        state = state["model"]
    state = {k[len("image_encoder."):] if k.startswith("image_encoder.") else k: v
             for k, v in state.items()
             if not k.startswith(("mask_decoder", "prompt_encoder", "sam_", "memory_",
                                  "obj_ptr", "no_mem", "maskmem"))}

    params = jax.device_get(variables["params"])
    converted, skipped = 0, []

    def _set(path, value):
        nonlocal converted
        node = params
        for p in path[:-1]:
            if not isinstance(node, dict) or p not in node:
                skipped.append(".".join(path))
                return
            node = node[p]
        if path[-1] not in node or tuple(node[path[-1]].shape) != tuple(value.shape):
            skipped.append(".".join(path))
            return
        node[path[-1]] = value.astype(node[path[-1]].dtype)
        converted += 1

    for name, tensor in state.items():
        t = tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)
        if name == "trunk.patch_embed.proj.weight":
            _set(["patch_embed", "kernel"], t.transpose(2, 3, 1, 0))
        elif name == "trunk.patch_embed.proj.bias":
            _set(["patch_embed", "bias"], t)
        elif name == "trunk.pos_embed":           # (1, C, h, w) -> (1, h, w, C)
            _set(["pos_embed"], t.transpose(0, 2, 3, 1))
        elif name == "trunk.pos_embed_window":
            _set(["pos_embed_window"], t.transpose(0, 2, 3, 1))
        elif name.startswith("trunk.blocks."):
            parts = name.split(".")
            blk = f"block{parts[2]}"
            rest = ".".join(parts[3:])
            mapping = {
                "norm1.weight": ([blk, "norm1", "scale"], None),
                "norm1.bias": ([blk, "norm1", "bias"], None),
                "norm2.weight": ([blk, "norm2", "scale"], None),
                "norm2.bias": ([blk, "norm2", "bias"], None),
                "attn.qkv.weight": ([blk, "attn", "qkv", "kernel"], "T"),
                "attn.qkv.bias": ([blk, "attn", "qkv", "bias"], None),
                "attn.proj.weight": ([blk, "attn", "proj", "kernel"], "T"),
                "attn.proj.bias": ([blk, "attn", "proj", "bias"], None),
                "proj.weight": ([blk, "proj", "kernel"], "T"),
                "proj.bias": ([blk, "proj", "bias"], None),
                "mlp.layers.0.weight": ([blk, "mlp_lin1", "kernel"], "T"),
                "mlp.layers.0.bias": ([blk, "mlp_lin1", "bias"], None),
                "mlp.layers.1.weight": ([blk, "mlp_lin2", "kernel"], "T"),
                "mlp.layers.1.bias": ([blk, "mlp_lin2", "bias"], None),
            }
            if rest in mapping:
                path, op = mapping[rest]
                _set(path, t.T if op == "T" else t)
            else:
                skipped.append(name)
        elif name.startswith("neck.convs."):
            parts = name.split(".")
            idx = parts[2]
            if name.endswith("conv.weight") or name.endswith(f"convs.{idx}.weight"):
                _set([f"neck_conv{idx}", "kernel"], t.transpose(2, 3, 1, 0))
            elif name.endswith("bias"):
                _set([f"neck_conv{idx}", "bias"], t)
            else:
                skipped.append(name)
        elif name.startswith("neck.position_encoding"):
            continue  # sine position encoding has no parameters worth keeping
        else:
            skipped.append(name)

    if skipped:
        msg = (f"load_sam2_weights: {len(skipped)} unmatched tensors "
               f"(converted {converted}), e.g. {skipped[:5]}")
        if strict:
            raise ValueError(
                msg + " — the converted encoder would not reproduce the source "
                "model. Pass strict=False to skip them anyway.")
        warnings.warn(msg)
    return {**variables, "params": params}
