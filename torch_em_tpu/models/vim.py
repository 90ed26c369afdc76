"""ViM-UNet: Vision-Mamba encoder + UNETR-style decoder.

Rebuild of torch_em/model/vim.py (``ViM`` :30 over the hustvl/Vim fork,
``get_vim_encoder`` :200, ``get_vimunet_model`` :231; arXiv:2404.07705).
The reference depends on the mamba-ssm CUDA kernels; here the selective scan
(S6) is implemented natively in JAX with ``lax.associative_scan`` — the
parallel-prefix formulation maps well onto the TPU vector units.

Two block variants:

- ``variant="hustvl"`` (default, reference parity): the faithful bimamba-v2
  mixer — per-direction depthwise conv / x_proj / dt_proj / A_log / D,
  dt-rank bottleneck for the per-channel step size, RMSNorm pre-norm with the
  (hidden, residual) threading of mamba's ``Block``, middle cls token, and
  ``if_divide_out`` halving — so hustvl ``.pth`` checkpoints convert exactly
  (:func:`load_vim_weights`).
- ``variant="native"``: the round-1 TPU-native simplification (shared
  direction parameters, scalar dt) kept for training from scratch.

Bug-compatibility note: after the final norm the reference drops token 0
(``x[:, 1:]``, reference vim.py:192) even though the cls token was inserted
at the sequence middle — removing a *patch* token and keeping the cls token
inside the feature grid. ``variant="hustvl"`` reproduces this exactly (that
is the function pretrained ViM-UNets compute); ``variant="native"`` has no
cls token at all.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import Model, get_activation
from .unet import ConvBlock, Upsampler

__all__ = ["MambaBlock", "BiMambaMixerV2", "ViM", "get_vim_encoder", "get_vimunet_model",
           "VIM_CONFIGS", "load_vim_weights"]


def load_vim_weights(variables, checkpoint_path: str, strict: bool = True):
    """Load pretrained weights into a ViM encoder / ViM-UNet.

    - hustvl/Vim ``.pth`` checkpoints (reference vim.py:245: the ``model``
      entry holds the VisionMamba state dict) convert into the faithful
      ``variant="hustvl"`` encoder tree via a strict tensor-name mapping.
    - checkpoints written by this framework's ``DefaultTrainer`` (``.ckpt``
      msgpack files carrying ``model_state``) restore directly — the analog
      of the reference's torch_em branch (reference vim.py:248).
    """
    from flax import serialization as flax_serialization

    if checkpoint_path.endswith(".pth"):
        return _convert_hustvl_checkpoint(variables, checkpoint_path, strict=strict)
    with open(checkpoint_path, "rb") as f:
        save_dict = flax_serialization.msgpack_restore(f.read())
    state = save_dict.get("model_state", save_dict)
    return flax_serialization.from_state_dict(variables, state)


def _convert_hustvl_checkpoint(variables, checkpoint_path: str, strict: bool = True):
    """Map a hustvl/Vim VisionMamba state dict onto the ``variant="hustvl"``
    encoder parameter tree. With ``strict=True`` any unmatched or
    shape-mismatched tensor raises."""
    import warnings

    import torch

    state = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state and isinstance(state["model"], dict):
        state = state["model"]
    # drop the classification head (not part of the encoder function)
    state = {k: v for k, v in state.items() if not k.startswith("head.")}

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
        if path[-1] not in node or tuple(node[path[-1]].shape) != tuple(np.shape(value)):
            skipped.append(".".join(path))
            return
        node[path[-1]] = np.asarray(value, dtype=np.asarray(node[path[-1]]).dtype)
        converted += 1

    for name, tensor in state.items():
        t = tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)
        if name == "patch_embed.proj.weight":
            _set(["patch_embed", "kernel"], t.transpose(2, 3, 1, 0))
        elif name == "patch_embed.proj.bias":
            _set(["patch_embed", "bias"], t)
        elif name == "pos_embed":
            # hustvl checkpoints are 224px (197 tokens); the torch_em encoder is
            # built at img_size=1024 (4097).  Interpolate the patch grid
            # (bicubic, the convention of hustvl's interpolate_pos_embed) and
            # re-insert the middle cls position.
            want = params.get("pos_embed")
            if want is not None and tuple(want.shape) != tuple(t.shape):
                t = _interp_flat_pos(t, want.shape[1])
            _set(["pos_embed"], t)
        elif name == "cls_token":
            _set(["cls_token"], t)
        elif name == "norm_f.weight":
            _set(["norm_f", "scale"], t)
        elif name.startswith("layers."):
            parts = name.split(".")
            blk = f"block{parts[1]}"
            rest = ".".join(parts[2:])
            mapping = {
                "norm.weight": ([blk, "norm", "scale"], None),
                "mixer.in_proj.weight": ([blk, "in_proj", "kernel"], "T"),
                "mixer.out_proj.weight": ([blk, "out_proj", "kernel"], "T"),
                "mixer.A_log": ([blk, "A_log"], None),
                "mixer.D": ([blk, "D"], None),
                "mixer.A_b_log": ([blk, "A_log_b"], None),
                "mixer.D_b": ([blk, "D_b"], None),
                "mixer.conv1d.weight": ([blk, "conv1d_kernel"], "C"),
                "mixer.conv1d.bias": ([blk, "conv1d_bias"], None),
                "mixer.conv1d_b.weight": ([blk, "conv1d_b_kernel"], "C"),
                "mixer.conv1d_b.bias": ([blk, "conv1d_b_bias"], None),
                "mixer.x_proj.weight": ([blk, "x_proj", "kernel"], "T"),
                "mixer.x_proj_b.weight": ([blk, "x_proj_b", "kernel"], "T"),
                "mixer.dt_proj.weight": ([blk, "dt_proj", "kernel"], "T"),
                "mixer.dt_proj.bias": ([blk, "dt_proj", "bias"], None),
                "mixer.dt_proj_b.weight": ([blk, "dt_proj_b", "kernel"], "T"),
                "mixer.dt_proj_b.bias": ([blk, "dt_proj_b", "bias"], None),
            }
            if rest in mapping:
                path, op = mapping[rest]
                if op == "T":
                    t = t.T
                elif op == "C":  # torch depthwise (E, 1, K) -> flax (K, 1, E)
                    t = t.transpose(2, 1, 0)
                _set(path, t)
            else:
                skipped.append(name)
        else:
            skipped.append(name)

    if skipped:
        msg = (f"load_vim_weights: {len(skipped)} unmatched tensors "
               f"(converted {converted}), e.g. {skipped[:5]}")
        if strict:
            raise ValueError(
                msg + " — the converted encoder would not reproduce the source "
                "model. Pass strict=False to skip them anyway.")
        warnings.warn(msg)
    return {**variables, "params": params}


def _interp_flat_pos(pos, n_tokens_out, has_cls: bool = True):
    """Resize a flat ``(1, P(+1), C)`` Vim pos-embed to ``n_tokens_out`` tokens.

    The cls position sits at the sequence middle (token ``P // 2`` of the
    patch grid, reference vim.py:61); it is extracted, the patch grid is
    resized bilinearly, and the cls position is re-inserted at the new middle.
    Works on numpy or jax arrays; returns the same kind.
    """
    pos = np.asarray(pos) if isinstance(pos, np.ndarray) else pos
    xp = jnp if isinstance(pos, jnp.ndarray) else np
    n_in = pos.shape[1] - (1 if has_cls else 0)
    n_out = n_tokens_out - (1 if has_cls else 0)
    g_in, g_out = int(round(n_in ** 0.5)), int(round(n_out ** 0.5))
    if has_cls:
        tp = n_in // 2
        cls_pos = pos[:, tp:tp + 1]
        grid = xp.concatenate([pos[:, :tp], pos[:, tp + 1:]], axis=1)
    else:
        cls_pos, grid = None, pos
    grid = grid.reshape(1, g_in, g_in, -1)
    resized = jax.image.resize(jnp.asarray(grid), (1, g_out, g_out, grid.shape[-1]),
                               method="bilinear")
    resized = resized if xp is jnp else np.asarray(resized)
    flat = resized.reshape(1, g_out * g_out, -1).astype(pos.dtype)
    if not has_cls:
        return flat
    tp_out = n_out // 2
    return xp.concatenate([flat[:, :tp_out], cls_pos, flat[:, tp_out:]], axis=1)


class BiMambaMixerV2(nn.Module):
    """One Vim layer: RMSNorm pre-norm + the bimamba-v2 Mamba mixer, with
    mamba's ``(hidden, residual)`` threading (mamba_simple ``Block``).

    Faithful to hustvl/Vim's ``Mamba(bimamba_type="v2", if_divide_out=True)``:
    separate backward-direction depthwise conv / x_proj / dt_proj / A_log / D
    parameters, a dt-rank bottleneck (``ceil(dim / 16)``) for the per-channel
    step size, silu-gated output halved across the two directions.  The S6
    recurrence itself runs as a parallel associative scan (TPU-friendly)
    instead of the reference's sequential CUDA kernel — same math.

    Call: ``(hidden, residual) -> (hidden, residual)`` where
    ``residual_out = hidden_in + residual_in`` (kept in fp32,
    ``residual_in_fp32=True``) and ``hidden_out = mixer(norm(residual_out))``.
    """

    dim: int
    state_dim: int = 16
    expand: int = 2
    conv_width: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual=None):
        d = self.dim
        e = d * self.expand
        dt_rank = -(-d // 16)  # ceil, mamba's default dt_rank="auto"

        residual = hidden.astype(jnp.float32) if residual is None \
            else residual + hidden.astype(jnp.float32)
        h = nn.RMSNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(residual)

        xz = nn.Dense(2 * e, use_bias=False, dtype=self.dtype, name="in_proj")(h)
        xs, z = jnp.split(xz, 2, axis=-1)

        def direction(u, suffix):
            """Causal conv -> silu -> input-dependent (dt, B, C) -> S6 scan."""
            kernel = self.param(f"conv1d{suffix}_kernel", nn.initializers.lecun_normal(),
                                (self.conv_width, 1, e))
            bias = self.param(f"conv1d{suffix}_bias", nn.initializers.zeros, (e,))
            padded = jnp.pad(u, ((0, 0), (self.conv_width - 1, 0), (0, 0)))
            u = jax.lax.conv_general_dilated(
                padded.astype(self.dtype), kernel.astype(self.dtype), window_strides=(1,),
                padding="VALID", dimension_numbers=("NLC", "LIO", "NLC"),
                feature_group_count=e) + bias.astype(self.dtype)
            u = nn.silu(u)

            dbl = nn.Dense(dt_rank + 2 * self.state_dim, use_bias=False,
                           dtype=self.dtype, name=f"x_proj{suffix}")(u)
            dt_low = dbl[..., :dt_rank]
            B = dbl[..., dt_rank:dt_rank + self.state_dim].astype(jnp.float32)
            C = dbl[..., dt_rank + self.state_dim:].astype(jnp.float32)
            dt = nn.Dense(e, use_bias=True, dtype=self.dtype, name=f"dt_proj{suffix}")(dt_low)
            delta = nn.softplus(dt.astype(jnp.float32))

            A_log = self.param(f"A_log{suffix}", lambda k, s: jnp.log(jnp.broadcast_to(
                jnp.arange(1, s[1] + 1, dtype=jnp.float32), s)), (e, self.state_dim))
            D = self.param(f"D{suffix}", nn.initializers.ones, (e,))
            A = -jnp.exp(A_log)
            u32 = u.astype(jnp.float32)
            y = jax.vmap(lambda uu, dd, bb, cc: _selective_scan(uu, dd, A, bb, cc, D))(
                u32, delta, B, C)
            return y.astype(self.dtype)

        y_fwd = direction(xs, "")
        # backward direction: the whole pipeline (conv included) runs on the
        # flipped sequence with its own parameters, then flips back — the z
        # gate is elementwise so gating once after the sum is identical to
        # mamba's per-direction gating with the flipped z.
        y_bwd = jnp.flip(direction(jnp.flip(xs, axis=1), "_b"), axis=1)
        y = (y_fwd + y_bwd) / 2  # if_divide_out=True (reference vim.py:224)
        y = y * nn.silu(z)
        out = nn.Dense(d, use_bias=False, dtype=self.dtype, name="out_proj")(y)
        return out, residual


def _selective_scan(u, delta, A, B, C, D):
    """S6 selective scan via associative scan.

    u: (L, E_in); delta: (L, E_in); A: (E_in, N); B, C: (L, N); D: (E_in,)
    h_t = exp(delta_t A) h_{t-1} + delta_t B_t u_t;   y_t = C_t h_t + D u_t
    """
    # discretize
    dA = jnp.exp(delta[..., None] * A[None])                    # (L, E, N)
    dBu = delta[..., None] * B[:, None, :] * u[..., None]       # (L, E, N)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, h = jax.lax.associative_scan(combine, (dA, dBu), axis=0)
    y = jnp.einsum("len,ln->le", h, C)
    return y + u * D[None]


class MambaBlock(nn.Module):
    """Bidirectional Mamba (S6) block for vision sequences."""

    dim: int
    state_dim: int = 16
    expand: int = 2
    conv_width: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, L, D)
        b, l, d = x.shape
        e = self.dim * self.expand
        residual = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)

        xz = nn.Dense(2 * e, dtype=self.dtype, name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)

        # depthwise causal conv along the sequence
        conv_kernel = self.param("conv_kernel", nn.initializers.lecun_normal(),
                                 (self.conv_width, 1, e))
        padded = jnp.pad(xs, ((0, 0), (self.conv_width - 1, 0), (0, 0)))
        xs = jax.lax.conv_general_dilated(
            padded.astype(self.dtype), conv_kernel.astype(self.dtype), window_strides=(1,),
            padding="VALID", dimension_numbers=("NLC", "LIO", "NLC"), feature_group_count=e,
        )
        xs = nn.silu(xs)

        # SSM parameters (input-dependent B, C, delta)
        A_log = self.param("A_log", lambda k, s: jnp.log(jnp.broadcast_to(
            jnp.arange(1, s[1] + 1, dtype=jnp.float32), s)), (e, self.state_dim))
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (e,))
        bc_dt = nn.Dense(2 * self.state_dim + 1, dtype=self.dtype, name="x_proj")(xs)
        B = bc_dt[..., : self.state_dim]
        C = bc_dt[..., self.state_dim: 2 * self.state_dim]
        dt = nn.softplus(bc_dt[..., -1:] + self.param("dt_bias", nn.initializers.zeros, (1,)))
        delta = jnp.broadcast_to(dt, xs.shape)

        def scan_one(u_seq, d_seq, b_seq, c_seq):
            return _selective_scan(u_seq, d_seq, A, b_seq, c_seq, D)

        # forward direction
        y_fwd = jax.vmap(scan_one)(xs, delta, B, C)
        # backward direction (bidirectional like Vim)
        y_bwd = jax.vmap(scan_one)(
            jnp.flip(xs, axis=1), jnp.flip(delta, axis=1), jnp.flip(B, axis=1), jnp.flip(C, axis=1)
        )
        y = y_fwd + jnp.flip(y_bwd, axis=1)

        y = y * nn.silu(z)
        out = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(y)
        return residual + out


class ViM(nn.Module):
    """Vision Mamba encoder (reference vim.py:30): patch embed + pos embed +
    bidirectional Mamba blocks; returns the final feature map and intermediate
    features for the decoder skips (channel-first).

    ``variant="hustvl"`` is the faithful VisionMamba geometry (bimamba-v2
    blocks with ``(hidden, residual)`` threading, middle cls token, flat
    absolute pos embed covering the cls slot, RMSNorm final norm, and the
    reference's drop-token-0 output slicing — see the module docstring).
    ``variant="native"`` is the TPU-native simplification (no cls token,
    grid pos embed, shared-direction :class:`MambaBlock`)."""

    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 192
    depth: int = 24
    state_dim: int = 16
    feature_indexes: Tuple[int, ...] = (5, 11, 17, 23)
    variant: str = "hustvl"
    with_cls_token: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        h = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), name="patch_embed")(h)
        b, gh, gw, c = h.shape

        if self.variant == "hustvl":
            return self._hustvl_forward(h, b, gh, gw, c)
        if self.variant != "native":
            raise ValueError(f"Unknown ViM variant {self.variant!r}")

        pos_grid = self.img_size // self.patch_size
        pos_embed = self.param("pos_embed", nn.initializers.normal(0.02),
                               (1, pos_grid, pos_grid, self.embed_dim))
        if (gh, gw) != (pos_grid, pos_grid):
            pos_embed = jax.image.resize(pos_embed, (1, gh, gw, self.embed_dim), method="bilinear")
        h = (h + pos_embed.astype(self.dtype)).reshape(b, gh * gw, c)

        intermediates = []
        for i in range(self.depth):
            h = MambaBlock(self.embed_dim, state_dim=self.state_dim, dtype=self.dtype,
                           name=f"block{i}")(h)
            if i in self.feature_indexes:
                fmap = h.reshape(b, gh, gw, c)
                intermediates.append(jnp.transpose(fmap, (0, 3, 1, 2)).astype(jnp.float32))

        h = nn.LayerNorm(dtype=self.dtype, name="norm_f")(h)
        fmap = jnp.transpose(h.reshape(b, gh, gw, c), (0, 3, 1, 2)).astype(jnp.float32)
        return fmap, intermediates

    def _hustvl_forward(self, h, b, gh, gw, c):
        n_patch = gh * gw
        h = h.reshape(b, n_patch, c)

        if self.with_cls_token:
            cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, c))
            tp = n_patch // 2  # middle cls token (reference vim.py:59-63)
            h = jnp.concatenate(
                [h[:, :tp], jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, c)),
                 h[:, tp:]], axis=1)
        n_tok = h.shape[1]

        pos_tokens = (self.img_size // self.patch_size) ** 2 + int(self.with_cls_token)
        pos_embed = self.param("pos_embed", nn.initializers.normal(0.02),
                               (1, pos_tokens, self.embed_dim))
        if n_tok != pos_tokens:
            pos_embed = _interp_flat_pos(pos_embed, n_tok, has_cls=self.with_cls_token)
        h = h + pos_embed.astype(self.dtype)

        def strip_cls(seq):
            # the reference drops token 0, NOT the middle cls token
            # (reference vim.py:192) — bug-compatible by design.
            return seq[:, 1:] if self.with_cls_token else seq

        intermediates = []
        hidden, residual = h, None
        for i in range(self.depth):
            hidden, residual = BiMambaMixerV2(
                self.embed_dim, state_dim=self.state_dim, dtype=self.dtype,
                name=f"block{i}")(hidden, residual)
            if i in self.feature_indexes:
                fmap = strip_cls(hidden).reshape(b, gh, gw, c)
                intermediates.append(jnp.transpose(fmap, (0, 3, 1, 2)).astype(jnp.float32))

        # final fused add-norm (reference vim.py:161-172), prenorm=False
        residual = residual + hidden.astype(jnp.float32)
        hidden = nn.RMSNorm(epsilon=1e-5, dtype=self.dtype, name="norm_f")(residual)
        fmap = jnp.transpose(strip_cls(hidden).reshape(b, gh, gw, c),
                             (0, 3, 1, 2)).astype(jnp.float32)
        return fmap, intermediates


VIM_CONFIGS = {
    "vim_t": dict(embed_dim=192, depth=24, feature_indexes=(5, 11, 17, 23)),
    "vim_s": dict(embed_dim=384, depth=24, feature_indexes=(5, 11, 17, 23)),
    "vim_b": dict(embed_dim=768, depth=24, feature_indexes=(5, 11, 17, 23)),
}


def get_vim_encoder(model_type: str = "vim_t", with_cls_token: bool = True,
                    img_size: int = 1024, in_chans: int = 3, dtype=jnp.float32, **kwargs) -> ViM:
    """Build a ViM encoder (reference vim.py:200)."""
    if model_type not in VIM_CONFIGS:
        raise ValueError(f"Unknown vim model {model_type}; available: {sorted(VIM_CONFIGS)}")
    cfg = dict(VIM_CONFIGS[model_type])
    cfg.update(kwargs)
    return ViM(img_size=img_size, in_chans=in_chans, with_cls_token=with_cls_token,
               dtype=dtype, **cfg)


def _deconv_chain(parent, prefix, feature_list, h, train, dtype):
    # constructed inside the parent's compact context, so registration is automatic
    for i, f in enumerate(feature_list):
        h = Upsampler(f, scale_factor=2, dim=2, dtype=dtype, name=f"{prefix}_up{i}")(h, train=train)
        h = ConvBlock(f, dim=2, dtype=dtype, name=f"{prefix}_conv{i}")(h, train=train)
    return h


def get_vimunet_model(
    out_channels: int = 1,
    model_type: str = "vim_t",
    img_size: int = 1024,
    with_cls_token: bool = True,
    checkpoint: Optional[str] = None,
    in_chans: int = 3,
    final_activation: Optional[str] = "Sigmoid",
    dtype=jnp.float32,
    seed: int = 0,
    **kwargs,
) -> Model:
    """Build a ViM-UNet (reference vim.py:231): the ViM encoder plugged into
    the UNETR decoder with ``use_skip_connection=False`` and
    ``resize_input=False`` — exactly the reference's wiring (it constructs
    ``UNETR(encoder=encoder, resize_input=False, use_skip_connection=False,
    final_activation="Sigmoid")``)."""
    from .unetr import UNETRModule

    cfg = dict(VIM_CONFIGS[model_type])
    cfg.update({k: kwargs[k] for k in ("variant", "state_dim") if k in kwargs})
    encoder = ViM(img_size=img_size, in_chans=in_chans, with_cls_token=with_cls_token,
                  dtype=dtype, **cfg)
    decoder_kwargs = {k: kwargs[k] for k in ("initial_features", "depth") if k in kwargs}
    module = UNETRModule(
        img_size=img_size, out_channels=out_channels, in_chans=in_chans,
        resize_input=False, use_skip_connection=False,
        final_activation=final_activation if isinstance(final_activation, str) else None,
        encoder_module=encoder, dtype=dtype, **decoder_kwargs,
    )
    model = Model(
        module,
        init_kwargs={
            "out_channels": out_channels, "model_type": model_type, "img_size": img_size,
            "with_cls_token": with_cls_token, "in_chans": in_chans,
            "final_activation": final_activation,
        },
        example_input_shape=(1, in_chans, min(img_size, 128), min(img_size, 128)),
        in_channels=in_chans, out_channels=out_channels, seed=seed,
    )
    model.factory = "torch_em_tpu.models.vim.get_vimunet_model"
    if checkpoint is not None:
        import jax as _jax

        variables = load_vim_weights(_jax.device_get(model.variables), checkpoint)
        model.replace_variables(variables)
    return model
