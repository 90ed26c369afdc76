"""UNETR: vision-transformer encoder + convolutional decoder.

Rebuild of torch_em/model/unetr.py: ``UNETRBase`` (:80) with longest-side
input resizing (:343), pretrained-stats normalization (:420) and mask
resize-back (:389); ``UNETR`` 2D (:505) with skip connections taken from the
ViT's global-attention layers and a z9/z6/z3/z0 deconv pyramid (:665-680).
The encoder is the native flax ViT (torch_em_tpu.models.vit); pretrained SAM
torch checkpoints can be converted via ``encoder_checkpoint``.

The 3D variant (reference UNETR3D :703) encodes each z-slice with a shared
2D ViT and decodes in 3D with (1,2,2) anisotropic upsampling; depth context
is injected via DepthStripPooling (:872) — a gated residual from a
depth-averaged squeeze-excite branch.
"""

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import Model, get_activation
from .unet import ConvBlock, Upsampler
from .vit import ViT, get_vision_transformer, load_sam_weights

__all__ = ["UNETR", "UNETR2D", "UNETRModule", "UNETR3D", "UNETR3DModule", "DepthStripPooling"]

# normalization statistics of the pretrained encoder families
# (reference unetr.py preprocess_vit_inputs :420)
_SAM_MEAN = np.array([123.675, 116.28, 103.53]) / 255.0
_SAM_STD = np.array([58.395, 57.12, 57.375]) / 255.0
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406])
_IMAGENET_STD = np.array([0.229, 0.224, 0.225])


class _DeconvBlock(nn.Module):
    """Faithful Deconv2DBlock (reference unetr.py:1004): 2x upsampler
    (interp + 1x1 conv, ``use_conv_transpose=False`` — the UNETR default) →
    single 3x3 conv → BatchNorm → ReLU. The geometry matches the reference
    tensor-for-tensor so UNETR state dicts transfer in both directions
    (utils/modelzoo: ``torch_state_dict_from_flax`` /
    ``load_torch_unet_state``)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Upsampler(self.out_channels, scale_factor=2, dim=2, dtype=self.dtype, name="up")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        # torch BatchNorm2d defaults: momentum 0.1 (flax: 1 - 0.1), eps 1e-5
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class UNETRModule(nn.Module):
    """Pure UNETR computation; x is channel-first (N, C, H, W)."""

    img_size: int = 1024
    backbone: str = "sam"
    encoder_name: str = "vit_b"
    out_channels: int = 1
    use_sam_stats: bool = False
    use_mae_stats: bool = False
    use_dino_stats: bool = False
    resize_input: bool = True
    final_activation: Optional[str] = None
    use_skip_connection: bool = True
    initial_features: int = 64
    depth: int = 3
    in_chans: int = 3
    encoder_module: Optional[Any] = None  # plug a custom encoder (e.g. ViM)
    dtype: Any = jnp.float32

    def setup(self):
        if self.encoder_module is not None:
            self.encoder = self.encoder_module
        else:
            # apply_neck=False: like the reference (vit.py:76 default), UNETR
            # consumes the RAW embed_dim features; the SAM family's neck
            # params still exist for strict checkpoint conversion.
            # neck-less encoder families take no apply_neck kwarg; only the
            # SAM-family grid ViTs carry (and skip) a neck (sam3's native
            # Sam3ViT has no neck parameters at all)
            extra = ({"apply_neck": False}
                     if self.backbone in ("sam", "cellpose_sam") else {})
            self.encoder = get_vision_transformer(
                backbone=self.backbone, model=self.encoder_name, img_size=self.img_size,
                in_chans=self.in_chans, dtype=self.dtype, **extra,
            )
        gain = 2
        feats = [self.initial_features * gain ** i for i in range(self.depth + 1)][::-1]
        self.features_decoder = feats
        self.deconv1 = _DeconvBlock(feats[0], dtype=self.dtype)
        if self.use_skip_connection:
            # reference unetr.py:580-615: deconv2/3 are chains from the
            # embed dim; deconv4 is a ConvBlock on the raw input
            self.deconv2 = [_DeconvBlock(feats[0], dtype=self.dtype),
                            _DeconvBlock(feats[1], dtype=self.dtype)]
            self.deconv3 = [_DeconvBlock(feats[0], dtype=self.dtype),
                            _DeconvBlock(feats[1], dtype=self.dtype),
                            _DeconvBlock(feats[2], dtype=self.dtype)]
            self.deconv4 = ConvBlock(feats[-1], dim=2, dtype=self.dtype)
        else:
            # reference unetr.py:617-640: a single deconv per stage, each
            # upsampling the previous one (deconv4 included)
            self.deconv2 = [_DeconvBlock(feats[1], dtype=self.dtype)]
            self.deconv3 = [_DeconvBlock(feats[2], dtype=self.dtype)]
            self.deconv4 = _DeconvBlock(feats[-1], dtype=self.dtype)
        self.base_block = ConvBlock(feats[0], dim=2, dtype=self.dtype)
        self.decoder_blocks = [ConvBlock(f, dim=2, dtype=self.dtype) for f in feats[1:]]
        self.decoder_samplers = [
            Upsampler(f, scale_factor=2, dim=2, dtype=self.dtype) for f in feats[1:]
        ]
        self.deconv_out = Upsampler(feats[-1], scale_factor=2, dim=2, dtype=self.dtype)
        self.decoder_head = ConvBlock(feats[-1], dim=2, dtype=self.dtype)
        self.out_conv = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)

    def _preprocess(self, x):
        """Channel handling, optional resize to img_size, pretrained-stat normalization."""
        if x.shape[1] == 1 and self.in_chans == 3:
            x = jnp.repeat(x, 3, axis=1)
        original_shape = x.shape[-2:]
        if self.resize_input and original_shape != (self.img_size, self.img_size):
            x = jax.image.resize(
                x, x.shape[:2] + (self.img_size, self.img_size), method="bilinear"
            )
        if self.use_sam_stats:
            mean, std = _SAM_MEAN, _SAM_STD
            x = (x - jnp.asarray(mean).reshape(1, -1, 1, 1)) / jnp.asarray(std).reshape(1, -1, 1, 1)
        elif self.use_mae_stats or self.use_dino_stats:
            mean, std = _IMAGENET_MEAN, _IMAGENET_STD
            x = (x - jnp.asarray(mean).reshape(1, -1, 1, 1)) / jnp.asarray(std).reshape(1, -1, 1, 1)
        return x, original_shape

    def _postprocess_masks(self, masks, original_shape):
        if masks.shape[-2:] != tuple(original_shape):
            masks = jax.image.resize(masks, masks.shape[:2] + tuple(original_shape), method="bilinear")
        return masks

    def _to_last(self, x):
        return jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)

    def _to_first(self, x):
        return jnp.transpose(x, (0, 3, 1, 2))

    def __call__(self, x, train: bool = False):
        x, original_shape = self._preprocess(x)
        z12, from_encoder = self.encoder(x, train=train)

        z12 = self._to_last(z12)
        if self.use_skip_connection:
            from_encoder = from_encoder[::-1]
            z9 = self.deconv1(self._to_last(from_encoder[0]), train=train)
            z6 = from_encoder[1]
            z6 = self._to_last(z6)
            for block in self.deconv2:
                z6 = block(z6, train=train)
            z3 = self._to_last(from_encoder[2])
            for block in self.deconv3:
                z3 = block(z3, train=train)
            z0 = self.deconv4(self._to_last(x), train=train)
        else:
            z9 = self.deconv1(z12, train=train)
            z6 = self.deconv2[0](z9, train=train)
            z3 = self.deconv3[0](z6, train=train)
            z0 = self.deconv4(z3, train=train)

        h = self.base_block(z12, train=train)
        for sampler, block, skip in zip(self.decoder_samplers, self.decoder_blocks, [z9, z6, z3]):
            h = sampler(h, train=train)
            # the reference's Decoder._concat crops the skip to the sampler
            # output's shape over ALL dims including channels (a centered
            # channel slice, reference unet.py:363-373) before concatenating
            if skip.shape[-1] != h.shape[-1]:
                off = (skip.shape[-1] - h.shape[-1]) // 2
                skip = skip[..., off:off + h.shape[-1]]
            h = jnp.concatenate([h, skip], axis=-1)
            h = block(h, train=train)

        h = self.deconv_out(h, train=train)
        if z0.shape[1:3] != h.shape[1:3]:
            z0 = jax.image.resize(z0, h.shape[:3] + (z0.shape[-1],), method="bilinear")
        h = jnp.concatenate([h, z0], axis=-1)
        h = self.decoder_head(h, train=train)
        h = self.out_conv(h)
        out = self._to_first(h).astype(jnp.float32)

        activation = get_activation(self.final_activation)
        if activation is not None:
            out = activation(out)
        return self._postprocess_masks(out, original_shape)


def UNETR(
    img_size: int = 1024,
    backbone: str = "sam",
    encoder: Union[str, None] = "vit_b",
    decoder=None,
    out_channels: int = 1,
    use_sam_stats: bool = False,
    use_mae_stats: bool = False,
    use_dino_stats: bool = False,
    resize_input: bool = True,
    encoder_checkpoint: Optional[str] = None,
    final_activation: Optional[str] = None,
    use_skip_connection: bool = True,
    embed_dim: Optional[int] = None,
    use_conv_transpose: bool = False,
    in_chans: int = 3,
    dtype=jnp.float32,
    seed: int = 0,
    **kwargs,
) -> Model:
    """Build a 2D UNETR (reference model/unetr.py:505)."""
    module = UNETRModule(
        img_size=img_size, backbone=backbone, encoder_name=encoder or "vit_b",
        out_channels=out_channels, use_sam_stats=use_sam_stats, use_mae_stats=use_mae_stats,
        use_dino_stats=use_dino_stats, resize_input=resize_input,
        final_activation=final_activation if isinstance(final_activation, str) else None,
        use_skip_connection=use_skip_connection, in_chans=in_chans, dtype=dtype,
    )
    # init with a small input; the position embeddings interpolate to any size
    example_shape = (1, in_chans, min(img_size, 256), min(img_size, 256))
    model = Model(
        module,
        init_kwargs={
            "img_size": img_size, "backbone": backbone, "encoder": encoder,
            "out_channels": out_channels, "use_sam_stats": use_sam_stats,
            "use_mae_stats": use_mae_stats, "use_dino_stats": use_dino_stats,
            "resize_input": resize_input, "final_activation": final_activation,
            "use_skip_connection": use_skip_connection, "in_chans": in_chans,
        },
        example_input_shape=example_shape,
        in_channels=in_chans, out_channels=out_channels, seed=seed,
    )
    model.factory = "torch_em_tpu.models.unetr.UNETR"
    if encoder_checkpoint is not None:
        # map the SAM image-encoder weights into the encoder subtree
        variables = jax.device_get(model.variables)
        encoder_vars = {"params": variables["params"]["encoder"]}
        converted = load_sam_weights(encoder_vars, encoder_checkpoint, backbone=backbone)
        variables["params"]["encoder"] = converted["params"]
        model.replace_variables(variables)
    return model


UNETR2D = UNETR


# ---------------------------------------------------------------------------
# UNETR3D (reference model/unetr.py:703)
# ---------------------------------------------------------------------------

class DepthStripPooling(nn.Module):
    """Strip pooling along the depth axis (reference unetr.py:872): global
    depth context via average pooling to Z=1 -> small 1x1x1 MLP -> sigmoid
    gate broadcast back over Z (gated residual). No-op for Z == 1.
    Input/output are channels-last (N, Z, H, W, C)."""

    channels: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[1] == 1:
            return x
        hidden = max(1, self.channels // self.reduction)
        feat = jnp.mean(x, axis=1, keepdims=True)  # (N, 1, H, W, C)
        feat = nn.Conv(hidden, (1, 1, 1), dtype=self.dtype, name="conv1")(feat)
        feat = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype,
                            name="bn1")(feat)
        feat = nn.relu(feat)
        feat = nn.Conv(self.channels, (1, 1, 1), dtype=self.dtype, name="conv2")(feat)
        gate = jax.nn.sigmoid(feat)
        return x * gate + x


class _ConvBlock3dWithStrip(nn.Module):
    """3D conv block + depth strip pooling (reference ConvBlock3dWithStrip)."""

    out_channels: int
    use_strip_pooling: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.out_channels, dim=3, dtype=self.dtype, name="conv")(x, train=train)
        if self.use_strip_pooling:
            x = DepthStripPooling(self.out_channels, dtype=self.dtype, name="strip")(x, train=train)
        return x


class _Deconv3DBlock(nn.Module):
    """(1,2,2) upsample + conv block + strip pooling (reference Deconv3DBlock)."""

    out_channels: int
    scale_factor: Tuple[int, int, int] = (1, 2, 2)
    use_strip_pooling: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Upsampler(self.out_channels, scale_factor=self.scale_factor, dim=3,
                      dtype=self.dtype, name="up")(x, train=train)
        x = _ConvBlock3dWithStrip(self.out_channels, self.use_strip_pooling,
                                  dtype=self.dtype, name="conv")(x, train=train)
        return x


class UNETR3DModule(nn.Module):
    """Pure UNETR3D computation: per-slice ViT encoder + 3D decoder with depth
    strip pooling; x is channel-first (N, C, Z, H, W)."""

    img_size: int = 1024
    backbone: str = "sam"
    encoder_name: str = "vit_b"
    out_channels: int = 1
    use_sam_stats: bool = False
    resize_input: bool = True
    final_activation: Optional[str] = None
    use_strip_pooling: bool = True
    initial_features: int = 64
    depth: int = 3
    in_chans: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, c, z, h, w = x.shape
        original_shape = (z, h, w)
        if c == 1 and self.in_chans == 3:
            x = jnp.repeat(x, 3, axis=1)
        if self.resize_input and (h, w) != (self.img_size, self.img_size):
            x = jax.image.resize(
                x, x.shape[:3] + (self.img_size, self.img_size), method="bilinear"
            )
        if self.use_sam_stats:
            x = (x - jnp.asarray(_SAM_MEAN).reshape(1, -1, 1, 1, 1)) / \
                jnp.asarray(_SAM_STD).reshape(1, -1, 1, 1, 1)

        encoder = get_vision_transformer(
            backbone=self.backbone, model=self.encoder_name, img_size=self.img_size,
            in_chans=self.in_chans, dtype=self.dtype,
        )
        # run the (shared-weight) encoder per z-slice and stack along depth
        slices = []
        for i in range(z):
            feat, _ = encoder(x[:, :, i], train=train)
            slices.append(feat)
        curr = jnp.stack(slices, axis=2)  # (N, 256, Z, h16, w16) channel-first
        curr = jnp.transpose(curr, (0, 2, 3, 4, 1)).astype(self.dtype)  # channels-last

        gain = 2
        feats = [self.initial_features * gain ** i for i in range(self.depth + 1)][::-1]

        z9 = _Deconv3DBlock(feats[0], use_strip_pooling=self.use_strip_pooling,
                            dtype=self.dtype, name="deconv1")(curr, train=train)
        z6 = _Deconv3DBlock(feats[1], use_strip_pooling=self.use_strip_pooling,
                            dtype=self.dtype, name="deconv2")(z9, train=train)
        z3 = _Deconv3DBlock(feats[2], use_strip_pooling=self.use_strip_pooling,
                            dtype=self.dtype, name="deconv3")(z6, train=train)
        z0 = _Deconv3DBlock(feats[3], use_strip_pooling=self.use_strip_pooling,
                            dtype=self.dtype, name="deconv4")(z3, train=train)

        hdec = _ConvBlock3dWithStrip(feats[0], self.use_strip_pooling, dtype=self.dtype,
                                     name="base")(curr, train=train)
        for i, (f, skip) in enumerate(zip(feats[1:], [z9, z6, z3])):
            hdec = Upsampler(f, scale_factor=(1, 2, 2), dim=3, dtype=self.dtype,
                             name=f"sampler{i}")(hdec, train=train)
            hdec = jnp.concatenate([hdec, skip], axis=-1)
            hdec = _ConvBlock3dWithStrip(f, self.use_strip_pooling, dtype=self.dtype,
                                         name=f"decoder{i}")(hdec, train=train)

        hdec = _Deconv3DBlock(feats[-1], use_strip_pooling=self.use_strip_pooling,
                              dtype=self.dtype, name="deconv_out")(hdec, train=train)
        if z0.shape[1:4] != hdec.shape[1:4]:
            z0 = jax.image.resize(z0, hdec.shape[:4] + (z0.shape[-1],), method="bilinear")
        hdec = jnp.concatenate([hdec, z0], axis=-1)
        hdec = _ConvBlock3dWithStrip(feats[-1], self.use_strip_pooling, dtype=self.dtype,
                                     name="decoder_head")(hdec, train=train)
        hdec = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype, name="out_conv")(hdec)

        out = jnp.transpose(hdec, (0, 4, 1, 2, 3)).astype(jnp.float32)
        activation = get_activation(self.final_activation)
        if activation is not None:
            out = activation(out)
        if out.shape[-3:] != original_shape:
            out = jax.image.resize(out, out.shape[:2] + original_shape, method="trilinear"
                                   if hasattr(jax.image, "trilinear") else "linear")
        return out


def UNETR3D(
    img_size: int = 1024,
    backbone: str = "sam",
    encoder: Union[str, None] = "vit_b",
    decoder=None,
    out_channels: int = 1,
    use_sam_stats: bool = False,
    resize_input: bool = True,
    encoder_checkpoint: Optional[str] = None,
    final_activation: Optional[str] = None,
    use_skip_connection: bool = False,
    embed_dim: Optional[int] = None,
    use_conv_transpose: bool = False,
    use_strip_pooling: bool = True,
    in_chans: int = 3,
    dtype=jnp.float32,
    seed: int = 0,
    **kwargs,
) -> Model:
    """Build a 3D UNETR (reference model/unetr.py:703): a shared 2D ViT
    encoder per z-slice + a 3D decoder with depth-strip-pooling gates."""
    if use_skip_connection:
        raise NotImplementedError("UNETR3D does not support skip connections (reference parity).")
    module = UNETR3DModule(
        img_size=img_size, backbone=backbone, encoder_name=encoder or "vit_b",
        out_channels=out_channels, use_sam_stats=use_sam_stats, resize_input=resize_input,
        final_activation=final_activation if isinstance(final_activation, str) else None,
        use_strip_pooling=use_strip_pooling, in_chans=in_chans, dtype=dtype,
    )
    example_shape = (1, in_chans, 2, min(img_size, 128), min(img_size, 128))
    model = Model(
        module,
        init_kwargs={
            "img_size": img_size, "backbone": backbone, "encoder": encoder,
            "out_channels": out_channels, "use_sam_stats": use_sam_stats,
            "resize_input": resize_input, "final_activation": final_activation,
            "use_strip_pooling": use_strip_pooling, "in_chans": in_chans,
        },
        example_input_shape=example_shape,
        in_channels=in_chans, out_channels=out_channels, seed=seed,
    )
    model.factory = "torch_em_tpu.models.unetr.UNETR3D"
    return model
