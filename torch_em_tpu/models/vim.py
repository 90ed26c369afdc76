"""ViM-UNet: Vision-Mamba encoder + UNETR-style decoder.

Rebuild of torch_em/model/vim.py (``ViM`` :30 over the hustvl/Vim fork,
``get_vim_encoder`` :200, ``get_vimunet_model`` :231; arXiv:2404.07705).
The reference depends on the mamba-ssm CUDA kernels; here the selective scan
(S6) is implemented natively in JAX with ``lax.associative_scan`` — the
parallel-prefix formulation maps well onto the TPU vector units — and the
vision blocks run the scan bidirectionally like Vim.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import Model, get_activation
from .unet import ConvBlock, Upsampler

__all__ = ["MambaBlock", "ViM", "get_vim_encoder", "get_vimunet_model", "VIM_CONFIGS",
           "load_vim_weights"]


def load_vim_weights(variables, checkpoint_path: str):
    """Load pretrained weights into a ViM-UNet.

    Supported: checkpoints written by this framework's ``DefaultTrainer``
    (``.ckpt`` msgpack files carrying ``model_state``) — the analog of the
    reference's torch_em branch (reference vim.py:248).

    hustvl/Vim ``.pth`` checkpoints are rejected: their bimamba-v2 mixer
    (separate backward-direction conv/x_proj/dt_proj/A/D parameters, dt-rank
    projection, RMSNorm, middle cls token) is a different parameterization
    than this TPU-native block (shared-direction parameters, scalar dt), so a
    tensor-name conversion would not reproduce the source function — erring
    is honest, silently loading a subset would not be (same policy as the
    sam2/dinov2 encoders in models/vit.py).
    """
    from flax import serialization as flax_serialization

    if checkpoint_path.endswith(".pth"):
        raise NotImplementedError(
            "hustvl/Vim checkpoints use the bimamba-v2 parameterization which this "
            "native S6 block does not implement; conversion would not reproduce the "
            "source model. Train natively or load a torch_em_tpu checkpoint (.ckpt).")
    with open(checkpoint_path, "rb") as f:
        save_dict = flax_serialization.msgpack_restore(f.read())
    state = save_dict.get("model_state", save_dict)
    return flax_serialization.from_state_dict(variables, state)


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
    features for the decoder skips (channel-first)."""

    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 192
    depth: int = 24
    state_dim: int = 16
    feature_indexes: Tuple[int, ...] = (5, 11, 17, 23)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        h = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), name="patch_embed")(h)
        b, gh, gw, c = h.shape

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
    return ViM(img_size=img_size, in_chans=in_chans, dtype=dtype, **cfg)


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
    encoder = ViM(img_size=img_size, in_chans=in_chans, dtype=dtype, **cfg)
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
