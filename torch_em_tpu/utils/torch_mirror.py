"""Self-contained torch mirror of the native UNet family, for torchscript
(and, where available, ONNX) weight-format export.

A bioimage.io package produced by this framework carries its weights in the
reference's ``pytorch_state_dict`` naming (see
:func:`torch_em_tpu.utils.modelzoo.torch_state_dict_from_flax`); consumers
like ilastik/deepimageJ additionally understand a ``torchscript`` weights
entry that embeds the program itself (reference
torch_em/util/modelzoo.py:617-660 produces it by tracing its torch model).
This module rebuilds an equivalent torch program *from the exported state
dict*: the layer graph is reconstructed shape-driven from the weight tensors
themselves, so there is no second copy of the architecture arithmetic to
drift — channel counts, kernel sizes, and per-level anisotropy all come from
the tensors; only the pooling/upsampling factors and norm flavor come from
the model config.

Semantics mirrored (the interop contract, reference model/unet.py:409-463):
``[norm -> conv(same pad) -> ReLU] x2`` per block, MaxPool downsampling with
the per-level scale factor, ``interpolate(align_corners=False)`` + 1x1-conv
upsamplers, channel concat with the encoder skip, 1x1 ``out_conv``, optional
final activation. Inputs must be divisible by the total scale (both
frameworks enforce this), so no center-crop is needed at the skip joins and
the traced program stays valid for any divisible input size.
"""

from typing import Dict, List, Optional

import numpy as np

__all__ = ["build_torch_mirror", "trace_torch_mirror"]


def _norm_layer(torch, norm: Optional[str], dim: int, channels: int):
    nn = torch.nn
    inorm = nn.InstanceNorm2d if dim == 2 else nn.InstanceNorm3d
    if norm == "InstanceNorm":
        return inorm(channels)
    if norm == "InstanceNormTrackStats":
        return inorm(channels, affine=True, track_running_stats=True, momentum=0.01)
    if norm == "GroupNorm":
        return nn.GroupNorm(min(32, channels), channels)
    if norm == "BatchNorm":
        return nn.BatchNorm2d(channels) if dim == 2 else nn.BatchNorm3d(channels)
    raise ValueError(f"Unsupported norm for torch mirror: {norm!r}")


def _conv_like(torch, weight: np.ndarray, dim: int):
    """A torch conv whose (out, in, *kernel) signature matches ``weight``,
    with the reference's same-padding for odd kernels."""
    nn = torch.nn
    out_c, in_c = weight.shape[:2]
    kernel = tuple(int(k) for k in weight.shape[2:])
    padding = tuple(k // 2 for k in kernel)
    conv = nn.Conv2d if dim == 2 else nn.Conv3d
    return conv(in_c, out_c, kernel_size=kernel, padding=padding)


def _double_conv(torch, state: Dict[str, np.ndarray], prefix: str, dim: int,
                 norm: Optional[str]):
    """The two-conv block as an nn.Sequential with the contract's child
    indices (norms at 0/3 and convs at 1/4; convs at 0/2 when norm is None)."""
    nn = torch.nn
    conv_idx = (0, 2) if norm is None else (1, 4)
    layers: List = []
    for j in conv_idx:
        w = state[f"{prefix}.block.{j}.weight"]
        if norm is not None:
            layers.append(_norm_layer(torch, norm, dim, int(w.shape[1])))
        layers.append(_conv_like(torch, w, dim))
        layers.append(nn.ReLU(inplace=True))
    return nn.Sequential(*layers)


def _scale_list(scale, dim: int) -> List[float]:
    if isinstance(scale, (int, float)):
        return [float(scale)] * dim
    return [float(s) for s in scale]


def build_torch_mirror(state: Dict[str, np.ndarray], *, dim: int,
                       scale_factors, norm: Optional[str],
                       final_activation: Optional[str]):
    """Build the torch module and strict-load ``state`` into it.

    ``state`` is the output of :func:`torch_state_dict_from_flax` (numpy
    values, reference naming); ``scale_factors`` is the encoder-ordered list
    of per-level downsampling factors.
    """
    import torch
    from torch import nn

    depth = len(scale_factors)
    n_enc = len({k.split(".")[2] for k in state if k.startswith("encoder.blocks.")})
    if n_enc != depth:
        raise ValueError(
            f"State dict carries {n_enc} encoder blocks but {depth} scale factors")

    interp_mode = "bilinear" if dim == 2 else "trilinear"

    class _Level(nn.Module):
        """One decoder level: upsample (interpolate + 1x1 conv), concat the
        encoder skip, double-conv."""

        def __init__(self, scale: List[float], conv, block):
            super().__init__()
            self.scale = scale
            self.conv = conv
            self.block = block

        def forward(self, x: torch.Tensor, skip: torch.Tensor) -> torch.Tensor:
            x = nn.functional.interpolate(
                x, scale_factor=self.scale, mode=interp_mode, align_corners=False)
            x = self.conv(x)
            return self.block(torch.cat([x, skip], dim=1))

    class _Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            pool = nn.MaxPool2d if dim == 2 else nn.MaxPool3d
            self.enc_blocks = nn.ModuleList(
                [_double_conv(torch, state, f"encoder.blocks.{i}", dim, norm)
                 for i in range(depth)])
            self.poolers = nn.ModuleList(
                [pool(tuple(int(s) for s in _scale_list(scale_factors[i], dim)))
                 for i in range(depth)])
            self.base = _double_conv(torch, state, "base", dim, norm)
            # decoder runs bottom-up: level i undoes encoder level depth-1-i
            self.levels = nn.ModuleList(
                [_Level(_scale_list(scale_factors[depth - 1 - i], dim),
                        _conv_like(torch, state[f"decoder.samplers.{i}.conv.weight"], dim),
                        _double_conv(torch, state, f"decoder.blocks.{i}", dim, norm))
                 for i in range(depth)])
            self.out_conv = _conv_like(torch, state["out_conv.weight"], dim)
            self.final_activation = (
                nn.Identity() if final_activation is None
                else getattr(nn, final_activation)())

        def forward(self, x: torch.Tensor) -> torch.Tensor:
            skips: List[torch.Tensor] = []
            for block, pool in zip(self.enc_blocks, self.poolers):
                s = block(x)
                skips.append(s)
                x = pool(s)
            x = self.base(x)
            for level, skip in zip(self.levels, reversed(skips)):
                x = level(x, skip)
            return self.final_activation(self.out_conv(x))

    mirror = _Mirror()

    # map the contract's key names onto the mirror's attribute layout
    torch_state = {}
    for key, value in state.items():
        name = key
        if name.startswith("encoder.blocks."):
            # encoder.blocks.<i>.block.<j>.X -> enc_blocks.<i>.<j>.X
            name = "enc_blocks." + name[len("encoder.blocks."):].replace(".block.", ".", 1)
        elif name.startswith("base.block."):
            name = "base." + name[len("base.block."):]
        elif name.startswith("decoder.samplers."):   # -> levels.<i>.conv.X
            idx, tail = name[len("decoder.samplers."):].split(".", 1)
            name = f"levels.{idx}.{tail}"
        elif name.startswith("decoder.blocks."):     # -> levels.<i>.block.<j>.X
            idx, tail = name[len("decoder.blocks."):].split(".", 1)
            name = f"levels.{idx}.{tail}"
        # .copy() also makes read-only jax exports writable for torch
        torch_state[name] = torch.from_numpy(np.asarray(value).copy())
    mirror.load_state_dict(torch_state, strict=True)
    mirror.eval()
    return mirror


def trace_torch_mirror(mirror, example: np.ndarray):
    """``torch.jit.trace`` the mirror on ``example`` (N, C, *spatial) and
    return (traced_module, traced_output ndarray)."""
    import torch

    tensor = torch.from_numpy(np.ascontiguousarray(example.astype("float32")))
    with torch.no_grad():
        traced = torch.jit.trace(mirror, tensor)
        out = traced(tensor).numpy()
    return traced, out
