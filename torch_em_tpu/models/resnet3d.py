"""3D ResNet / ResNeXt / WideResNet zoo.

Rebuild of torch_em/model/resnet3d.py (torchvision-style): ``BasicBlock``
(:53), ``Bottleneck`` (:104), ``ResNet3d`` (:164) with groups/width/dilation
options, and the factories (:313-500). flax.linen, channels-last internally,
channel-first public API; classification head = global average pool + dense.
"""

from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .base import Model

__all__ = [
    "ResNet3dModule", "resnet3d_18", "resnet3d_34", "resnet3d_50", "resnet3d_101",
    "resnet3d_152", "resnext3d_50_32x4d", "resnext3d_101_32x8d", "resnext3d_101_64x4d",
    "wide_resnet3d_50_2", "wide_resnet3d_101_2",
]


class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, dtype=self.dtype)
        identity = x
        out = nn.Conv(self.planes, (3, 3, 3), strides=(self.stride,) * 3, padding=1,
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = norm(name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3, 3), padding=1, use_bias=False, dtype=self.dtype,
                      name="conv2")(out)
        out = norm(name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1, 1), strides=(self.stride,) * 3,
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = norm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9, dtype=self.dtype)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = nn.Conv(width, (1, 1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(norm(name="bn1")(out))
        out = nn.Conv(width, (3, 3, 3), strides=(self.stride,) * 3, padding=self.dilation,
                      kernel_dilation=(self.dilation,) * 3, feature_group_count=self.groups,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(norm(name="bn2")(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = norm(name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1, 1), strides=(self.stride,) * 3,
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = norm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet3dModule(nn.Module):
    """3D ResNet (reference resnet3d.py:164); input (N, C, D, H, W)."""

    block: str  # "basic" | "bottleneck"
    layers: Tuple[int, ...]
    in_channels: int
    out_channels: int
    groups: int = 1
    width_per_group: int = 64
    stride_conv1: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = _BasicBlock if self.block == "basic" else _Bottleneck
        expansion = 1 if self.block == "basic" else 4

        h = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(self.dtype)
        h = nn.Conv(64, (7, 7, 7), strides=(2,) * 3 if self.stride_conv1 else (1,) * 3,
                    padding=3, use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype,
                         name="bn1")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, window_shape=(3, 3, 3), strides=(2, 2, 2), padding=((1, 1),) * 3)

        inplanes = 64
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                down = (b == 0) and (s != 1 or inplanes != planes * expansion)
                h = block_cls(
                    planes=planes, stride=s, groups=self.groups, base_width=self.width_per_group,
                    downsample=down, dtype=self.dtype, name=f"layer{stage + 1}_{b}",
                )(h, train=train)
                inplanes = planes * expansion

        h = jnp.mean(h, axis=(1, 2, 3))  # global average pool
        h = nn.Dense(self.out_channels, dtype=self.dtype, name="fc")(h.astype(jnp.float32))
        return h.astype(jnp.float32)


def _resnet(factory_name, block, layers, in_channels, out_channels, seed=0, dtype=jnp.float32,
            **kwargs):
    module = ResNet3dModule(
        block=block, layers=tuple(layers), in_channels=in_channels, out_channels=out_channels,
        groups=kwargs.pop("groups", 1), width_per_group=kwargs.pop("width_per_group", 64),
        stride_conv1=kwargs.pop("stride_conv1", True), dtype=dtype,
    )
    model = Model(
        module,
        init_kwargs={"in_channels": in_channels, "out_channels": out_channels, **kwargs},
        example_input_shape=(1, in_channels, 32, 32, 32),
        in_channels=in_channels, out_channels=out_channels, seed=seed,
    )
    model.factory = f"torch_em_tpu.models.resnet3d.{factory_name}"
    return model


def resnet3d_18(in_channels: int, out_channels: int, **kwargs: Any) -> Model:
    """ResNet3d-18 (reference resnet3d.py:313)."""
    return _resnet("resnet3d_18", "basic", [2, 2, 2, 2], in_channels, out_channels, **kwargs)


def resnet3d_34(in_channels: int, out_channels: int, **kwargs: Any) -> Model:
    """ResNet3d-34 (reference resnet3d.py:333)."""
    return _resnet("resnet3d_34", "basic", [3, 4, 6, 3], in_channels, out_channels, **kwargs)


def resnet3d_50(in_channels: int, out_channels: int, **kwargs: Any) -> Model:
    """ResNet3d-50 (reference resnet3d.py:353)."""
    return _resnet("resnet3d_50", "bottleneck", [3, 4, 6, 3], in_channels, out_channels, **kwargs)


def resnet3d_101(in_channels: int, out_channels: int, **kwargs: Any) -> Model:
    """ResNet3d-101 (reference resnet3d.py:373)."""
    return _resnet("resnet3d_101", "bottleneck", [3, 4, 23, 3], in_channels, out_channels, **kwargs)


def resnet3d_152(in_channels: int, out_channels: int, **kwargs: Any) -> Model:
    """ResNet3d-152 (reference resnet3d.py:393)."""
    return _resnet("resnet3d_152", "bottleneck", [3, 8, 36, 3], in_channels, out_channels, **kwargs)


def resnext3d_50_32x4d(in_channels: int, out_channels: int, **kwargs: Any) -> Model:
    """ResNeXt3d-50 32x4d (reference resnet3d.py:413)."""
    return _resnet("resnext3d_50_32x4d", "bottleneck", [3, 4, 6, 3], in_channels, out_channels,
                   groups=32, width_per_group=4, **kwargs)


def resnext3d_101_32x8d(in_channels: int, out_channels: int, **kwargs: Any) -> Model:
    """ResNeXt3d-101 32x8d (reference resnet3d.py:435)."""
    return _resnet("resnext3d_101_32x8d", "bottleneck", [3, 4, 23, 3], in_channels, out_channels,
                   groups=32, width_per_group=8, **kwargs)


def resnext3d_101_64x4d(in_channels: int, out_channels: int, **kwargs: Any) -> Model:
    """ResNeXt3d-101 64x4d (reference resnet3d.py:457)."""
    return _resnet("resnext3d_101_64x4d", "bottleneck", [3, 4, 23, 3], in_channels, out_channels,
                   groups=64, width_per_group=4, **kwargs)


def wide_resnet3d_50_2(in_channels: int, out_channels: int, **kwargs: Any) -> Model:
    """WideResNet3d-50-2 (reference resnet3d.py:479)."""
    return _resnet("wide_resnet3d_50_2", "bottleneck", [3, 4, 6, 3], in_channels, out_channels,
                   width_per_group=64 * 2, **kwargs)


def wide_resnet3d_101_2(in_channels: int, out_channels: int, **kwargs: Any) -> Model:
    """WideResNet3d-101-2 (reference resnet3d.py:500)."""
    return _resnet("wide_resnet3d_101_2", "bottleneck", [3, 4, 23, 3], in_channels, out_channels,
                   width_per_group=64 * 2, **kwargs)
