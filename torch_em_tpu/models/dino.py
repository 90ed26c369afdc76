"""Native DINOv2 / DINOv3 vision-transformer encoders.

Faithful re-implementations of the encoder geometries the reference wraps
(reference torch_em/model/vit.py:647 ``ViT_DINOv2`` and :714 ``ViT_DINOv3``),
built TPU-first: sequence-form attention lowers to large MXU matmuls, the
DINOv3 RoPE tables are trace-time constants (static shapes, no gathers), and
all parameters live in f32 with a configurable compute dtype.

Geometry facts (verified numerically against the public implementations in
the ``transformers`` package, see tests/test_dino_conversion.py):

DINOv2 (facebookresearch/dinov2):
 - conv patch embed (k = s = patch_size), tokens = [cls, registers, patches];
   registers are appended AFTER the cls token and receive NO position embed.
 - learned pos embed for [cls + patches], bicubic-interpolated for non-native
   grid sizes.
 - pre-norm blocks: LN(eps 1e-6) -> fused-qkv attention -> LayerScale ->
   residual; LN -> MLP(GELU) -> LayerScale -> residual.
 - final LayerNorm; the torch_em wrapper strips cls+registers and reshapes
   patch tokens to an (N, C, H/p, W/p) grid.

DINOv3 (facebookresearch/dinov3):
 - no learned pos embed; axial RoPE over patch-center coordinates normalized
   to [-1, 1]: inv_freq = base**-arange(0, 1, 4/head_dim), angles =
   2*pi*coord*inv_freq per axis, concatenated then tiled, rotate-half applied
   to patch tokens ONLY (cls + storage tokens are left unrotated).
 - separate q/k/v/o projections; k has no bias.
 - blocks as DINOv2 (LN eps 1e-5), optional gated MLP (7B models).

Both encoders return ``(final_grid, intermediates)`` with intermediates taken
after blocks i where i % 3 == 2 (reference vit.py:686,:773) — the first three
feed the UNETR decoder skips.
"""

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _interpolate_pos_embed(pos_embed, gh, gw):
    """Bicubic-resize the patch part of a [cls + grid] pos embed (dinov2
    ``interpolate_pos_encoding``)."""
    n = pos_embed.shape[1] - 1
    g0 = int(math.sqrt(n))
    if (gh, gw) == (g0, g0):
        return pos_embed
    cls_pe, patch_pe = pos_embed[:, :1], pos_embed[:, 1:]
    patch_pe = patch_pe.reshape(1, g0, g0, -1)
    patch_pe = jax.image.resize(patch_pe, (1, gh, gw, patch_pe.shape[-1]), method="cubic")
    return jnp.concatenate([cls_pe, patch_pe.reshape(1, gh * gw, -1)], axis=1)


class _SeqAttention(nn.Module):
    """Sequence-form multi-head self attention.

    ``fused_qkv`` selects the dinov2 parameter layout (one qkv projection);
    otherwise separate q/k/v projections with per-projection bias flags
    (dinov3: key has no bias). ``rope`` is an optional (cos, sin) pair applied
    to the trailing ``num_patches`` tokens only.
    """

    num_heads: int
    fused_qkv: bool = True
    key_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rope=None):
        n_tok, dim = x.shape[1], x.shape[2]
        head_dim = dim // self.num_heads
        if self.fused_qkv:
            qkv = nn.Dense(3 * dim, dtype=self.dtype, name="qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(dim, dtype=self.dtype, name="q_proj")(x)
            k = nn.Dense(dim, use_bias=self.key_bias, dtype=self.dtype, name="k_proj")(x)
            v = nn.Dense(dim, dtype=self.dtype, name="v_proj")(x)

        def heads(t):
            return t.reshape(t.shape[0], n_tok, self.num_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)

        if rope is not None:
            cos, sin = rope  # (num_patches, head_dim) each
            n_patch = cos.shape[0]
            n_prefix = n_tok - n_patch

            def rot(t):
                prefix, patches = t[:, :n_prefix], t[:, n_prefix:]
                p1, p2 = jnp.split(patches, 2, axis=-1)
                rotated = jnp.concatenate([-p2, p1], axis=-1)
                patches = patches * cos[None, :, None, :] + rotated * sin[None, :, None, :]
                return jnp.concatenate([prefix, patches], axis=1)

            q, k = rot(q), rot(k)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(x.shape[0], n_tok, dim)
        name = "proj" if self.fused_qkv else "o_proj"
        return nn.Dense(dim, dtype=self.dtype, name=name)(out)


class _LayerScale(nn.Module):
    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_value), (self.dim,))
        return x * gamma.astype(x.dtype)


class _DinoBlock(nn.Module):
    """Pre-norm transformer block with LayerScale.

    ``ffn`` selects the feed-forward flavor:
      - "mlp": fc1 -> GELU -> fc2 (dinov2/3 base models)
      - "swiglu_fused": w12 -> chunk -> silu(x1)*x2 -> w3 (dinov2 vit_g,
        facebook ``SwiGLUFFNFused`` layout, hidden aligned to 8)
      - "swiglu": silu(gate(x))*up(x) -> down (dinov3 '+' models)
    """

    num_heads: int
    mlp_ratio: float = 4.0
    eps: float = 1e-6
    fused_qkv: bool = True
    key_bias: bool = True
    ffn: str = "mlp"
    layerscale: bool = True   # False = plain timm block (MAE/ScaleMAE)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rope=None):
        dim = x.shape[-1]
        ls1 = _LayerScale(dim, name="ls1") if self.layerscale else (lambda t: t)
        ls2 = _LayerScale(dim, name="ls2") if self.layerscale else (lambda t: t)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        h = _SeqAttention(self.num_heads, fused_qkv=self.fused_qkv, key_bias=self.key_bias,
                          dtype=self.dtype, name="attn")(h, rope=rope)
        x = x + ls1(h)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm2")(x)
        hidden = int(dim * self.mlp_ratio)
        if self.ffn == "swiglu_fused":
            hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
            h12 = nn.Dense(2 * hidden, dtype=self.dtype, name="mlp_w12")(h)
            h1, h2 = jnp.split(h12, 2, axis=-1)
            h = nn.Dense(dim, dtype=self.dtype, name="mlp_w3")(nn.silu(h1) * h2)
        elif self.ffn == "swiglu":
            gate = nn.Dense(hidden, dtype=self.dtype, name="mlp_gate")(h)
            up = nn.Dense(hidden, dtype=self.dtype, name="mlp_up")(h)
            h = nn.Dense(dim, dtype=self.dtype, name="mlp_down")(nn.silu(gate) * up)
        else:
            h = nn.Dense(hidden, dtype=self.dtype, name="mlp_fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + ls2(h)


class DinoV2ViT(nn.Module):
    """DINOv2 encoder (reference vit.py:647). Call: x (N, C, H, W) ->
    (grid (N, embed_dim, H/p, W/p), [3 intermediate grids])."""

    img_size: int = 224
    patch_size: int = 14
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_register_tokens: int = 0
    ffn: str = "mlp"   # "swiglu_fused" for vit_g
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
            [jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)).astype(self.dtype), tokens],
            axis=1)

        grid0 = self.img_size // self.patch_size
        pos_embed = self.param("pos_embed", nn.initializers.normal(0.02),
                               (1, grid0 * grid0 + 1, self.embed_dim))
        tokens = tokens + _interpolate_pos_embed(pos_embed, gh, gw).astype(self.dtype)

        if self.num_register_tokens > 0:
            regs = self.param("register_tokens", nn.initializers.normal(0.02),
                              (1, self.num_register_tokens, self.embed_dim))
            regs = jnp.broadcast_to(
                regs, (b, self.num_register_tokens, self.embed_dim)).astype(self.dtype)
            tokens = jnp.concatenate([tokens[:, :1], regs, tokens[:, 1:]], axis=1)

        n_prefix = 1 + self.num_register_tokens

        def to_grid(t):
            return jnp.transpose(
                t[:, n_prefix:].reshape(b, gh, gw, self.embed_dim), (0, 3, 1, 2)
            ).astype(jnp.float32)

        intermediates = []
        for i in range(self.depth):
            tokens = _DinoBlock(self.num_heads, self.mlp_ratio, eps=1e-6, ffn=self.ffn,
                                dtype=self.dtype, name=f"block{i}")(tokens)
            if i % 3 == 2 and len(intermediates) < 3:
                intermediates.append(to_grid(tokens))

        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
        return to_grid(tokens), intermediates


def _rope_tables(gh, gw, head_dim, base):
    """DINOv3 axial RoPE cos/sin tables as trace-time constants."""
    inv_freq = 1.0 / base ** np.arange(0, 1, 4 / head_dim, dtype=np.float32)
    coords_h = (np.arange(0.5, gh, dtype=np.float32) / gh) * 2.0 - 1.0
    coords_w = (np.arange(0.5, gw, dtype=np.float32) / gw) * 2.0 - 1.0
    coords = np.stack(np.meshgrid(coords_h, coords_w, indexing="ij"), axis=-1)
    coords = coords.reshape(gh * gw, 2)                       # (hw, 2)
    angles = 2.0 * np.pi * coords[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(gh * gw, -1)                      # (hw, head_dim/2)
    angles = np.tile(angles, (1, 2))                          # (hw, head_dim)
    return jnp.asarray(np.cos(angles)), jnp.asarray(np.sin(angles))


class DinoV3ViT(nn.Module):
    """DINOv3 encoder (reference vit.py:714). Call: x (N, C, H, W) ->
    (grid (N, embed_dim, H/p, W/p), [3 intermediate grids])."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_register_tokens: int = 0   # "storage tokens" in the dinov3 paper
    rope_theta: float = 100.0
    ffn: str = "mlp"   # "swiglu" for the '+' models
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
        parts = [jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)).astype(self.dtype)]
        if self.num_register_tokens > 0:
            regs = self.param("register_tokens", nn.initializers.normal(0.02),
                              (1, self.num_register_tokens, self.embed_dim))
            parts.append(jnp.broadcast_to(
                regs, (b, self.num_register_tokens, self.embed_dim)).astype(self.dtype))
        tokens = jnp.concatenate(parts + [tokens], axis=1)

        cos, sin = _rope_tables(gh, gw, self.embed_dim // self.num_heads, self.rope_theta)
        rope = (cos.astype(self.dtype), sin.astype(self.dtype))
        n_prefix = 1 + self.num_register_tokens

        def to_grid(t):
            return jnp.transpose(
                t[:, n_prefix:].reshape(b, gh, gw, self.embed_dim), (0, 3, 1, 2)
            ).astype(jnp.float32)

        intermediates = []
        for i in range(self.depth):
            tokens = _DinoBlock(self.num_heads, self.mlp_ratio, eps=1e-5,
                                fused_qkv=False, key_bias=False, ffn=self.ffn,
                                dtype=self.dtype, name=f"block{i}")(tokens, rope=rope)
            if i % 3 == 2 and len(intermediates) < 3:
                intermediates.append(to_grid(tokens))

        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tokens)
        return to_grid(tokens), intermediates


# model-name configs matching the public releases and the reference factory
# (reference vit.py:1004-1037 dinov2, :960-1008 dinov3; '_reg4' selects the
# registers variants, '+' the swiglu variants)
DINOV2_CONFIGS = {
    "vit_s": dict(embed_dim=384, depth=12, num_heads=6, patch_size=14),
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, patch_size=14),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, patch_size=14),
    "vit_g": dict(embed_dim=1536, depth=40, num_heads=24, patch_size=14,
                  ffn="swiglu_fused"),
}
DINOV2_CONFIGS.update({
    f"{name}_reg4": dict(cfg, num_register_tokens=4)
    for name, cfg in list(DINOV2_CONFIGS.items())
})
DINOV3_CONFIGS = {
    "vit_s": dict(embed_dim=384, depth=12, num_heads=6, patch_size=16,
                  num_register_tokens=4),
    "vit_s+": dict(embed_dim=384, depth=12, num_heads=6, patch_size=16,
                   num_register_tokens=4, mlp_ratio=6.0, ffn="swiglu"),
    "vit_b": dict(embed_dim=768, depth=12, num_heads=12, patch_size=16,
                  num_register_tokens=4),
    "vit_l": dict(embed_dim=1024, depth=24, num_heads=16, patch_size=16,
                  num_register_tokens=4),
    "vit_l+": dict(embed_dim=1024, depth=24, num_heads=16, patch_size=16,
                   num_register_tokens=4, mlp_ratio=6.0, ffn="swiglu"),
    "vit_h+": dict(embed_dim=1280, depth=32, num_heads=20, patch_size=16,
                   num_register_tokens=4, mlp_ratio=6.0, ffn="swiglu"),
}


def _torch_load(checkpoint_path):
    import torch

    state = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "model" in state and isinstance(state["model"], dict):
        state = state["model"]
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: np.asarray(v.detach().float().numpy()) for k, v in state.items()}


def _is_hf_format(state):
    return any(k.startswith(("embeddings.", "encoder.layer.", "layer.")) for k in state)


def _hf_to_native_dinov2(state):
    """Rename a transformers Dinov2(WithRegisters)Model state dict to the
    facebook-native key layout (the format ``load_dino_weights`` consumes)."""
    import re

    out = {}
    for k, v in state.items():
        k = re.sub(r"^dinov2\.", "", k)
        k = k.replace("embeddings.patch_embeddings.projection", "patch_embed.proj")
        k = k.replace("embeddings.position_embeddings", "pos_embed")
        k = k.replace("embeddings.cls_token", "cls_token")
        k = k.replace("embeddings.mask_token", "mask_token")
        k = k.replace("embeddings.register_tokens", "register_tokens")
        k = re.sub(r"^encoder\.layer\.(\d+)\.", r"blocks.\1.", k)
        k = k.replace("attention.output.dense", "attn.proj")
        k = k.replace("layer_scale1.lambda1", "ls1.gamma")
        k = k.replace("layer_scale2.lambda1", "ls2.gamma")
        k = k.replace("mlp.weights_in", "mlp.w12").replace("mlp.weights_out", "mlp.w3")
        k = re.sub(r"^layernorm\.", "norm.", k)
        out[k] = v
    # fuse per-projection q/k/v into the facebook qkv layout
    fused = {}
    for k in list(out):
        m = re.match(r"blocks\.(\d+)\.attention\.attention\.query\.(weight|bias)", k)
        if m:
            i, kind = m.groups()
            q = out.pop(f"blocks.{i}.attention.attention.query.{kind}")
            kk = out.pop(f"blocks.{i}.attention.attention.key.{kind}")
            v = out.pop(f"blocks.{i}.attention.attention.value.{kind}")
            fused[f"blocks.{i}.attn.qkv.{kind}"] = np.concatenate([q, kk, v], axis=0)
    out.update(fused)
    return out


def _hf_to_native_dinov3(state):
    """Rename a transformers DINOv3ViTModel state dict to a native layout."""
    import re

    out = {}
    for k, v in state.items():
        k = re.sub(r"^dinov3_vit\.", "", k)
        k = k.replace("embeddings.patch_embeddings", "patch_embed.proj")
        k = k.replace("embeddings.cls_token", "cls_token")
        k = k.replace("embeddings.mask_token", "mask_token")
        k = k.replace("embeddings.register_tokens", "register_tokens")
        k = re.sub(r"^layer\.(\d+)\.", r"blocks.\1.", k)
        k = k.replace("attention.q_proj", "attn.q_proj")
        k = k.replace("attention.k_proj", "attn.k_proj")
        k = k.replace("attention.v_proj", "attn.v_proj")
        k = k.replace("attention.o_proj", "attn.o_proj")
        k = k.replace("layer_scale1.lambda1", "ls1.gamma")
        k = k.replace("layer_scale2.lambda1", "ls2.gamma")
        k = k.replace("mlp.up_proj", "mlp.fc1").replace("mlp.down_proj", "mlp.fc2")
        k = k.replace("mlp.gate_proj", "mlp.gate")
        k = re.sub(r"^norm\.", "norm.", k)
        out[k] = v
    return out


def load_dino_weights(variables, checkpoint_path: str, backbone: str = "dinov2",
                      strict: bool = True):
    """Convert a DINOv2/DINOv3 torch checkpoint into the native flax params.

    Accepts both the facebook-native key layout (``blocks.N.attn.qkv`` /
    ``ls1.gamma`` — what ``torch.hub`` dinov2 checkpoints and the dinov3
    release use) and transformers state dicts (``Dinov2Model``,
    ``Dinov2WithRegistersModel``, ``DINOv3ViTModel``), detected by key
    sniffing. Reference behavior: torch_em loads these through the upstream
    packages (torch_em/model/vit.py:647,:714); here the weights are mapped
    directly into the flax modules.
    """
    state = checkpoint_path if isinstance(checkpoint_path, dict) else \
        _torch_load(checkpoint_path)
    if _is_hf_format(state):
        state = _hf_to_native_dinov2(state) if backbone == "dinov2" else \
            _hf_to_native_dinov3(state)

    params = jax.device_get(variables["params"])
    used = set()

    def take(key, shape=None):
        used.add(key)
        if key not in state:
            if strict:
                raise KeyError(f"Checkpoint is missing key '{key}'")
            return None
        v = state[key]
        if shape is not None:
            v = v.reshape(shape)
        return v

    def set_(path, value):
        node = params
        for p in path[:-1]:
            node = node[p]
        if value is None:
            return
        target = node[path[-1]]
        assert target.shape == value.shape, (path, target.shape, value.shape)
        node[path[-1]] = value.astype(target.dtype)

    set_(("cls_token",), take("cls_token"))
    if "register_tokens" in params:
        set_(("register_tokens",), take("register_tokens"))
    if "pos_embed" in params:
        set_(("pos_embed",), take("pos_embed"))
    # conv kernel: torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    w = take("patch_embed.proj.weight")
    if w is not None:
        set_(("patch_embed", "kernel"), np.transpose(w, (2, 3, 1, 0)))
    set_(("patch_embed", "bias"), take("patch_embed.proj.bias"))

    n_blocks = sum(1 for k in params if k.startswith("block"))
    for i in range(n_blocks):
        blk = f"blocks.{i}"
        tgt = params[f"block{i}"]
        for ln in ("norm1", "norm2"):
            set_((f"block{i}", ln, "scale"), take(f"{blk}.{ln}.weight"))
            set_((f"block{i}", ln, "bias"), take(f"{blk}.{ln}.bias"))
        set_((f"block{i}", "ls1", "gamma"), take(f"{blk}.ls1.gamma"))
        set_((f"block{i}", "ls2", "gamma"), take(f"{blk}.ls2.gamma"))
        if "qkv" in tgt["attn"]:  # dinov2 fused layout
            set_((f"block{i}", "attn", "qkv", "kernel"), take(f"{blk}.attn.qkv.weight").T)
            set_((f"block{i}", "attn", "qkv", "bias"), take(f"{blk}.attn.qkv.bias"))
            set_((f"block{i}", "attn", "proj", "kernel"), take(f"{blk}.attn.proj.weight").T)
            set_((f"block{i}", "attn", "proj", "bias"), take(f"{blk}.attn.proj.bias"))
        else:  # dinov3 separate projections
            for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
                set_((f"block{i}", "attn", name, "kernel"), take(f"{blk}.attn.{name}.weight").T)
                if name != "k_proj":
                    set_((f"block{i}", "attn", name, "bias"), take(f"{blk}.attn.{name}.bias"))
        if "mlp_w12" in tgt:  # dinov2 fused swiglu (w12/w3)
            set_((f"block{i}", "mlp_w12", "kernel"), take(f"{blk}.mlp.w12.weight").T)
            set_((f"block{i}", "mlp_w12", "bias"), take(f"{blk}.mlp.w12.bias"))
            set_((f"block{i}", "mlp_w3", "kernel"), take(f"{blk}.mlp.w3.weight").T)
            set_((f"block{i}", "mlp_w3", "bias"), take(f"{blk}.mlp.w3.bias"))
        elif "mlp_gate" in tgt:  # dinov3 gated swiglu
            set_((f"block{i}", "mlp_gate", "kernel"), take(f"{blk}.mlp.gate.weight").T)
            set_((f"block{i}", "mlp_gate", "bias"), take(f"{blk}.mlp.gate.bias"))
            set_((f"block{i}", "mlp_up", "kernel"), take(f"{blk}.mlp.fc1.weight").T)
            set_((f"block{i}", "mlp_up", "bias"), take(f"{blk}.mlp.fc1.bias"))
            set_((f"block{i}", "mlp_down", "kernel"), take(f"{blk}.mlp.fc2.weight").T)
            set_((f"block{i}", "mlp_down", "bias"), take(f"{blk}.mlp.fc2.bias"))
        else:
            set_((f"block{i}", "mlp_fc1", "kernel"), take(f"{blk}.mlp.fc1.weight").T)
            set_((f"block{i}", "mlp_fc1", "bias"), take(f"{blk}.mlp.fc1.bias"))
            set_((f"block{i}", "mlp_fc2", "kernel"), take(f"{blk}.mlp.fc2.weight").T)
            set_((f"block{i}", "mlp_fc2", "bias"), take(f"{blk}.mlp.fc2.bias"))

    set_(("norm", "scale"), take("norm.weight"))
    set_(("norm", "bias"), take("norm.bias"))

    if strict:
        # mask_token is a training-only artifact; dinov3's mask_k_bias keeps a
        # zero k bias tensor in the checkpoint that the math never uses;
        # register-free checkpoints may carry an empty (1, 0, C) registers slot
        leftover = {k for k in state if k not in used
                    and not k.startswith(("mask_token", "head"))
                    and not k.endswith("attn.k_proj.bias")
                    and np.asarray(state[k]).size > 0}
        if leftover:
            raise KeyError(f"Unconsumed checkpoint keys: {sorted(leftover)[:8]} ...")
    return {"params": params}
