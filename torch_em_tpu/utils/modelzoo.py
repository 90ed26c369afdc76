"""bioimage.io model export / import (reference torch_em/util/modelzoo.py).

``export_bioimageio_model`` (:510) turns a trained checkpoint into a
bioimage.io-style model package: rdf.yaml model description, weights, test
input/output tensors, preprocessing spec derived from the trainer's
normalizer, and tool configs (``get_mws_config`` :867,
``get_shallow2deep_config`` :879). ``import_bioimageio_model`` (:743) loads a
package back into a runnable model + normalizer.

The bioimageio.spec/bioimageio.core libraries are not available in this
environment, so the package is written directly (yaml + npy + the native
msgpack weights format, declared as weight entry ``jax``). When
bioimageio.core is importable, `_validate_model` round-trips through it.
"""

import json
import os
from typing import Callable, Dict, List, Optional, Tuple, Union

import numpy as np

from .util import get_normalizer, get_trainer

__all__ = [
    "export_bioimageio_model", "import_bioimageio_model", "get_default_citations",
    "get_mws_config", "get_shallow2deep_config", "export_parser_helper",
    "add_weight_formats", "convert_to_onnx", "main", "convert_main",
]


def normalize_with_batch(data, normalizer):
    """Normalize a batch sample-wise (reference modelzoo.py:34)."""
    if normalizer is None:
        return data
    normalized = [normalizer(da)[None] for da in data]
    return np.concatenate(normalized, axis=0)


def get_default_citations(model=None, model_output=None) -> List[Dict[str, str]]:
    """Default citations for the model export (reference modelzoo.py:48)."""
    citations = [{"text": "training library", "doi": "10.5281/zenodo.5108853"}]
    if model in ("UNet2d", "UNet3d", "AnisotropicUNet"):
        citations.append({"text": "architecture", "doi": "10.1007/978-3-319-24574-4_28"})
    elif model == "UNETR":
        citations.append({"text": "architecture", "doi": "10.48550/arXiv.2103.10504"})
    if model_output == "affinities":
        citations.append({"text": "segmentation algorithm", "doi": "10.1109/TPAMI.2020.2980827"})
    elif model_output == "boundaries":
        citations.append({"text": "segmentation algorithm", "doi": "10.1038/nmeth.4151"})
    return citations


def _get_preprocessing(trainer):
    """Derive the bioimage.io preprocessing spec from the trainer's normalizer
    (reference modelzoo.py:282)."""
    from ..transforms import raw as raw_transforms

    normalizer = get_normalizer(trainer)
    fn = getattr(normalizer, "func", normalizer)
    kwargs = getattr(normalizer, "keywords", {})

    name = getattr(fn, "__name__", str(fn))
    axes = "cyx" if trainer.train_loader.dataset.ndim == 2 else "czyx"
    if name == "standardize" or fn is raw_transforms.standardize:
        mode = "fixed" if ("mean" in kwargs and "std" in kwargs) else "per_sample"
        spec = {"name": "zero_mean_unit_variance", "kwargs": {"mode": mode, "axes": axes, **kwargs}}
    elif name in ("normalize", "normalize_percentile") or fn in (
        raw_transforms.normalize, raw_transforms.normalize_percentile
    ):
        if name == "normalize_percentile":
            spec = {"name": "scale_range", "kwargs": {
                "mode": "per_sample", "axes": axes,
                "min_percentile": kwargs.get("lower", 1.0),
                "max_percentile": kwargs.get("upper", 99.0),
            }}
        else:
            spec = {"name": "scale_range", "kwargs": {
                "mode": "per_sample", "axes": axes, "min_percentile": 0.0, "max_percentile": 100.0,
            }}
    else:
        return None
    return [spec]


def _get_input_data(trainer):
    """One input sample from the trainer's val loader (reference modelzoo.py:504)."""
    x, _ = next(iter(trainer.val_loader))
    return np.asarray(x[0:1])


def _write_weights(model, export_folder):
    import jax
    from flax import serialization as flax_serialization

    weights_path = os.path.join(export_folder, "weights.msgpack")
    state = flax_serialization.to_state_dict(jax.device_get(model.variables))
    with open(weights_path, "wb") as f:
        f.write(flax_serialization.msgpack_serialize(state))
    return weights_path


# reference constructor paths for the pytorch_state_dict weights entry
_TORCH_ARCHITECTURES = {
    "torch_em_tpu.models.unet.UNet2d": "torch_em.model.unet.UNet2d",
    "torch_em_tpu.models.unet.UNet3d": "torch_em.model.unet.UNet3d",
    "torch_em_tpu.models.unet.AnisotropicUNet": "torch_em.model.unet.AnisotropicUNet",
    "torch_em_tpu.models.unetr.UNETR": "torch_em.model.unetr.UNETR",
}


def _conv_w_np(kernel):
    kernel = np.asarray(kernel, dtype=np.float32)
    if kernel.ndim == 4:    # (kh, kw, I, O) -> (O, I, kh, kw)
        return kernel.transpose(3, 2, 0, 1)
    if kernel.ndim == 5:    # (kd, kh, kw, I, O) -> (O, I, kd, kh, kw)
        return kernel.transpose(4, 3, 0, 1, 2)
    if kernel.ndim == 2:    # dense 1x1: (I, O) -> (O, I, 1, 1)
        t = kernel.T
        return t.reshape(t.shape + (1, 1))
    raise ValueError(f"Unsupported kernel rank {kernel.ndim}")


def _torch_state_dict_unetr(model) -> Dict[str, np.ndarray]:
    """Flax→torch state dict for the 2D UNETR with a SAM ViT encoder
    (reference model/unetr.py:505, naming of the decoder pyramid at
    :580-640 and the encoder per segment-anything's ImageEncoderViT).

    Inverse of the encoder mapping in models/vit.py:load_sam_weights; the
    Deconv2DBlocks export their upsampler 1x1 conv, 3x3 conv, and BatchNorm
    affine + running stats (reference unetr.py:1004)."""
    import jax

    variables = jax.device_get(model.variables)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = {}

    def as32(a):
        return np.asarray(a, dtype=np.float32)

    # --- encoder: inverse SAM ViT mapping ---
    # (a plugged-in custom encoder keeps its field auto-name "encoder_module")
    enc = params.get("encoder") or params["encoder_module"]
    state["encoder.patch_embed.proj.weight"] = _conv_w_np(enc["patch_embed"]["kernel"])
    state["encoder.patch_embed.proj.bias"] = as32(enc["patch_embed"]["bias"])
    if "pos_embed" in enc:
        state["encoder.pos_embed"] = as32(enc["pos_embed"])
    n_blocks = len([k for k in enc if k.startswith("block")])
    for i in range(n_blocks):
        blk = enc[f"block{i}"]
        dst = f"encoder.blocks.{i}"
        for norm in ("norm1", "norm2"):
            state[f"{dst}.{norm}.weight"] = as32(blk[norm]["scale"])
            state[f"{dst}.{norm}.bias"] = as32(blk[norm]["bias"])
        for lin, tdst in (("qkv", "attn.qkv"), ("proj", "attn.proj")):
            state[f"{dst}.{tdst}.weight"] = as32(blk["attn"][lin]["kernel"]).T
            state[f"{dst}.{tdst}.bias"] = as32(blk["attn"][lin]["bias"])
        for rp in ("rel_pos_h", "rel_pos_w"):
            if rp in blk["attn"]:
                state[f"{dst}.attn.{rp}"] = as32(blk["attn"][rp])
        for lin, tdst in (("mlp_lin1", "mlp.lin1"), ("mlp_lin2", "mlp.lin2")):
            state[f"{dst}.{tdst}.weight"] = as32(blk[lin]["kernel"]).T
            state[f"{dst}.{tdst}.bias"] = as32(blk[lin]["bias"])
    for src, idx in (("neck_conv1", 0), ("neck_ln1", 1), ("neck_conv2", 2), ("neck_ln2", 3)):
        if src not in enc:
            continue
        if "conv" in src:
            state[f"encoder.neck.{idx}.weight"] = _conv_w_np(enc[src]["kernel"])
        else:
            state[f"encoder.neck.{idx}.weight"] = as32(enc[src]["scale"])
            state[f"encoder.neck.{idx}.bias"] = as32(enc[src]["bias"])

    # --- decoder pyramid ---
    def export_deconv(src, dst):
        node = params[src]
        st = batch_stats.get(src, {}).get("bn", {})
        state[f"{dst}.block.0.conv.weight"] = _conv_w_np(node["up"]["conv"]["kernel"])
        state[f"{dst}.block.0.conv.bias"] = as32(node["up"]["conv"]["bias"])
        state[f"{dst}.block.1.block.weight"] = _conv_w_np(node["conv"]["kernel"])
        state[f"{dst}.block.1.block.bias"] = as32(node["conv"]["bias"])
        state[f"{dst}.block.2.weight"] = as32(node["bn"]["scale"])
        state[f"{dst}.block.2.bias"] = as32(node["bn"]["bias"])
        state[f"{dst}.block.2.running_mean"] = as32(st.get("mean", np.zeros_like(node["bn"]["scale"])))
        state[f"{dst}.block.2.running_var"] = as32(st.get("var", np.ones_like(node["bn"]["scale"])))
        state[f"{dst}.block.2.num_batches_tracked"] = np.asarray(0, np.int64)

    def export_convblock(src, dst):
        # default InstanceNorm (param-free): convs at block.{1,4}
        block = params[src]
        for j, conv in enumerate(("conv0", "conv1")):
            state[f"{dst}.block.{1 + 3 * j}.weight"] = _conv_w_np(block[conv]["kernel"])
            state[f"{dst}.block.{1 + 3 * j}.bias"] = as32(block[conv]["bias"])

    use_skip = model.module.use_skip_connection
    export_deconv("deconv1", "deconv1")
    if use_skip:
        export_deconv("deconv2_0", "deconv2.0")
        export_deconv("deconv2_1", "deconv2.1")
        export_deconv("deconv3_0", "deconv3.0")
        export_deconv("deconv3_1", "deconv3.1")
        export_deconv("deconv3_2", "deconv3.2")
        export_convblock("deconv4", "deconv4")
    else:
        export_deconv("deconv2_0", "deconv2")
        export_deconv("deconv3_0", "deconv3")
        export_deconv("deconv4", "deconv4")

    export_convblock("base_block", "base")
    n_dec = len([k for k in params if k.startswith("decoder_blocks_")])
    for i in range(n_dec):
        export_convblock(f"decoder_blocks_{i}", f"decoder.blocks.{i}")
        sampler = params[f"decoder_samplers_{i}"]
        state[f"decoder.samplers.{i}.conv.weight"] = _conv_w_np(sampler["conv"]["kernel"])
        state[f"decoder.samplers.{i}.conv.bias"] = as32(sampler["conv"]["bias"])
    state["deconv_out.conv.weight"] = _conv_w_np(params["deconv_out"]["conv"]["kernel"])
    state["deconv_out.conv.bias"] = as32(params["deconv_out"]["conv"]["bias"])
    export_convblock("decoder_head", "decoder_head")
    state["out_conv.weight"] = _conv_w_np(params["out_conv"]["kernel"])
    state["out_conv.bias"] = as32(params["out_conv"]["bias"])
    return state


def torch_state_dict_from_flax(model) -> Optional[Dict[str, np.ndarray]]:
    """Convert a native UNet's flax parameter tree into a torch_em
    ``UNet2d/UNet3d/AnisotropicUNet`` state dict (numpy values).

    The reference's module naming (unet.py: ``encoder.blocks.<i>.block.{1,4}``
    conv weights — or ``block.{0,2}`` when ``norm=None`` — with norm modules
    at ``block.{0,3}``, ``decoder.samplers.<i>.conv``, ``out_conv``) is the
    behavioral contract for ilastik/deepimageJ interop
    (reference torch_em/util/modelzoo.py:158, model/unet.py:419-439).
    The default InstanceNorm is parameter-free on both sides; GroupNorm /
    InstanceNormTrackStats / BatchNorm affine params are exported from the
    auto-named flax norm child and running statistics from the
    ``batch_stats`` collection (torch ``running_mean/var`` +
    ``num_batches_tracked``).
    Upsampler note: this rebuild applies the 1x1 conv before the (bi/tri)linear
    interpolation — linear ops commute, so the weights transfer exactly.

    Returns None if the model is not a UNet-family model.
    """
    import jax

    factory = getattr(model, "factory", "") or ""
    if factory not in _TORCH_ARCHITECTURES:
        return None
    if factory == "torch_em_tpu.models.unetr.UNETR":
        return _torch_state_dict_unetr(model)

    variables = jax.device_get(model.variables)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    norm_kind = getattr(getattr(model, "module", None), "norm", "InstanceNorm")
    known_norms = (None, "InstanceNorm", "InstanceNormTrackStats", "GroupNorm", "BatchNorm")
    if norm_kind not in known_norms:
        raise ValueError(
            f"Cannot export norm={norm_kind!r} to a torch_em state dict; "
            f"supported: {known_norms}"
        )
    # reference ConvBlock layout (model/unet.py:419-439): with a norm the
    # convs sit at block.{1,4} behind norms at block.{0,3}; without, at {0,2}
    conv_idx = (0, 2) if norm_kind is None else (1, 4)
    norm_idx = (0, 3)

    def norm_children(tree, block_name, j):
        """Affine params / running stats of the j-th norm in a block: they
        nest under the auto-named flax child (e.g. norm0/GroupNorm_0)."""
        node = tree.get(block_name, {}).get(f"norm{j}")
        while isinstance(node, dict) and not (
            "scale" in node or "mean" in node or "bias" in node
        ):
            if len(node) != 1:
                return None
            node = next(iter(node.values()))
        return node if isinstance(node, dict) else None

    def conv_w(kernel):
        kernel = np.asarray(kernel, dtype=np.float32)
        if kernel.ndim == 4:    # (kh, kw, I, O) -> (O, I, kh, kw)
            return kernel.transpose(3, 2, 0, 1)
        if kernel.ndim == 5:    # (kd, kh, kw, I, O) -> (O, I, kd, kh, kw)
            return kernel.transpose(4, 3, 0, 1, 2)
        if kernel.ndim == 2:    # dense 1x1: (I, O) -> (O, I, 1, 1[, 1])
            t = kernel.T
            return t.reshape(t.shape + (1, 1))
        raise ValueError(f"Unsupported kernel rank {kernel.ndim}")

    spatial_rank = None
    state = {}
    consumed = set()

    def take(name):
        consumed.add(name)
        return params[name]

    def export_block(src, dst):
        nonlocal spatial_rank
        block = take(src)
        for j, conv in enumerate(("conv0", "conv1")):
            w = conv_w(block[conv]["kernel"])
            spatial_rank = w.ndim - 2
            state[f"{dst}.block.{conv_idx[j]}.weight"] = w
            state[f"{dst}.block.{conv_idx[j]}.bias"] = np.asarray(
                block[conv]["bias"], dtype=np.float32)
            if norm_kind in ("GroupNorm", "BatchNorm", "InstanceNormTrackStats"):
                affine = norm_children(params, src, j)
                if affine is None or "scale" not in affine:
                    raise ValueError(
                        f"norm={norm_kind} affine params not found for {src}/norm{j}; "
                        "cannot export a faithful torch state dict"
                    )
                state[f"{dst}.block.{norm_idx[j]}.weight"] = np.asarray(affine["scale"], np.float32)
                state[f"{dst}.block.{norm_idx[j]}.bias"] = np.asarray(affine["bias"], np.float32)
            if norm_kind in ("BatchNorm", "InstanceNormTrackStats"):
                stats = norm_children(batch_stats, src, j)
                if stats is None or "mean" not in stats:
                    raise ValueError(
                        f"norm={norm_kind} running stats not found for {src}/norm{j} "
                        "in the batch_stats collection"
                    )
                state[f"{dst}.block.{norm_idx[j]}.running_mean"] = np.asarray(stats["mean"], np.float32)
                state[f"{dst}.block.{norm_idx[j]}.running_var"] = np.asarray(stats["var"], np.float32)
                state[f"{dst}.block.{norm_idx[j]}.num_batches_tracked"] = np.asarray(0, np.int64)

    n_levels = len([k for k in params if k.startswith("encoder")])
    for i in range(n_levels):
        export_block(f"encoder{i}", f"encoder.blocks.{i}")
        export_block(f"decoder{i}", f"decoder.blocks.{i}")
        sampler = take(f"sampler{i}")
        w = conv_w(sampler["conv"]["kernel"])
        if w.ndim - 2 < spatial_rank:  # dense 1x1 emitted as 2D; pad to 3D
            w = w.reshape(w.shape[:2] + (1,) * spatial_rank)
        state[f"decoder.samplers.{i}.conv.weight"] = w
        state[f"decoder.samplers.{i}.conv.bias"] = np.asarray(sampler["conv"]["bias"], np.float32)

    export_block("base", "base")

    out = take("out_conv")
    w = conv_w(out["kernel"])
    if w.ndim - 2 < spatial_rank:
        w = w.reshape(w.shape[:2] + (1,) * spatial_rank)
    state["out_conv.weight"] = w
    state["out_conv.bias"] = np.asarray(out["bias"], np.float32)

    leftovers = set(params) - consumed
    if leftovers:
        raise ValueError(f"Unmapped parameter groups in torch export: {sorted(leftovers)}")
    return state


def load_torch_unet_state(model, torch_state, strict: bool = True):
    """Torch→flax direction (converse of :func:`torch_state_dict_from_flax`):
    map a reference torch_em ``UNet2d/UNet3d/AnisotropicUNet`` state dict onto
    the native model's variable tree and return the new variables.

    This is what lets a reference-produced bioimage.io package
    (``state_dict.pt`` written by torch_em's exporter, reference
    modelzoo.py:158-186) round-trip into this framework
    (:func:`import_bioimageio_model`). Conv kernels transpose
    ``(O, I, *k) -> (*k, I, O)`` (1x1 convs stored natively as dense
    ``(I, O)``); norm affine params and BatchNorm/TrackStats running
    statistics land in the auto-named flax norm child / the ``batch_stats``
    collection.
    """
    import jax

    variables = jax.device_get(model.variables)
    params = {k: v for k, v in variables["params"].items()}
    batch_stats = variables.get("batch_stats", {})
    norm_kind = getattr(getattr(model, "module", None), "norm", "InstanceNorm")
    conv_idx = (0, 2) if norm_kind is None else (1, 4)
    inv_conv = {conv_idx[0]: "conv0", conv_idx[1]: "conv1"}
    inv_norm = {0: 0, 3: 1}
    skipped = []

    def norm_child(tree, block_name, j):
        node = tree.get(block_name, {}).get(f"norm{j}")
        while isinstance(node, dict) and not (
            "scale" in node or "mean" in node or "bias" in node
        ):
            if len(node) != 1:
                return None
            node = next(iter(node.values()))
        return node if isinstance(node, dict) else None

    def set_leaf(node, key, value, name):
        if node is None or key not in node:
            skipped.append(name)
            return
        want = np.asarray(node[key])
        value = np.asarray(value, dtype=want.dtype)
        if want.ndim == 2 and value.ndim > 2:  # dense-backed 1x1 conv
            value = value.reshape(value.shape[0], value.shape[1]).T
        elif value.ndim == want.ndim and want.ndim > 2:
            n = want.ndim - 2
            value = value.transpose(tuple(range(2, 2 + n)) + (1, 0))
        if tuple(value.shape) != tuple(want.shape):
            skipped.append(name)
            return
        node[key] = value

    for name, tensor in torch_state.items():
        t = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else np.asarray(tensor)
        parts = name.split(".")
        if name.startswith(("encoder.blocks.", "decoder.blocks.")) or name.startswith("base.block."):
            if parts[0] == "base":
                src, j, leaf = "base", int(parts[2]), parts[3]
            else:
                src, j, leaf = f"{parts[0]}{parts[2]}", int(parts[4]), parts[5]
            if j in inv_conv and leaf in ("weight", "bias"):
                node = params.get(src, {}).get(inv_conv[j])
                set_leaf(node, "kernel" if leaf == "weight" else "bias", t, name)
            elif j in inv_norm:
                jn = inv_norm[j]
                if leaf in ("weight", "bias"):
                    set_leaf(norm_child(params, src, jn),
                             "scale" if leaf == "weight" else "bias", t, name)
                elif leaf in ("running_mean", "running_var"):
                    set_leaf(norm_child(batch_stats, src, jn),
                             "mean" if leaf == "running_mean" else "var", t, name)
                elif leaf != "num_batches_tracked":
                    skipped.append(name)
            else:
                skipped.append(name)
        elif name.startswith("decoder.samplers."):
            node = params.get(f"sampler{parts[2]}", {}).get("conv")
            set_leaf(node, "kernel" if parts[4] == "weight" else "bias", t, name)
        elif name.startswith("out_conv."):
            set_leaf(params.get("out_conv"), "kernel" if parts[1] == "weight" else "bias",
                     t, name)
        else:
            skipped.append(name)

    if skipped and strict:
        raise ValueError(
            f"load_torch_unet_state: {len(skipped)} unmatched tensors, e.g. "
            f"{skipped[:5]} — the imported model would not reproduce the source.")
    new_vars = dict(variables)
    new_vars["params"] = params
    if batch_stats:
        new_vars["batch_stats"] = batch_stats
    return new_vars


def _write_torch_weights(model, export_folder):
    """Emit reference-loadable ``weights.pt`` (torch state dict) for the UNet
    family; returns (path, architecture) or (None, None) for other models."""
    state = torch_state_dict_from_flax(model)
    if state is None:
        return None, None
    try:
        import torch
    except ImportError:
        return None, None
    weights_path = os.path.join(export_folder, "weights.pt")
    torch.save({k: torch.from_numpy(v.copy()) for k, v in state.items()}, weights_path)
    return weights_path, _TORCH_ARCHITECTURES[model.factory]


def export_bioimageio_model(
    checkpoint: str,
    output_path: str,
    input_data: Optional[np.ndarray] = None,
    name: Optional[str] = None,
    description: Optional[str] = None,
    authors: Optional[List[Dict]] = None,
    tags: Optional[List[str]] = None,
    license: str = "CC-BY-4.0",
    documentation: Optional[str] = None,
    git_repo: Optional[str] = None,
    cite: Optional[List[Dict]] = None,
    input_optional_parameters: bool = False,
    model_postprocessing: Optional[str] = None,
    for_deepimagej: bool = False,
    links: Optional[List[str]] = None,
    maintainers: Optional[List[Dict]] = None,
    min_shape=None,
    halo=None,
    checkpoint_name: str = "best",
    config: Dict = {},
) -> bool:
    """Export a trained model as a bioimage.io-style model package
    (reference modelzoo.py:510)."""
    import yaml

    trainer = get_trainer(checkpoint, name=checkpoint_name, device="cpu")
    model = trainer.model
    if model_postprocessing is not None:
        # rebuild the model with in-model postprocessing for deployment
        from ..trainer.serialization import resolve_path

        factory = resolve_path(model.factory)
        kwargs = dict(model.init_kwargs)
        kwargs["postprocessing"] = model_postprocessing
        new_model = factory(**kwargs)
        new_model.replace_variables(model.variables)
        model = new_model

    export_folder = output_path if not output_path.endswith(".zip") else output_path[:-4]
    os.makedirs(export_folder, exist_ok=True)

    if input_data is None:
        input_data = _get_input_data(trainer)
    # coerce to (N, C, *spatial)
    spatial_ndim = trainer.train_loader.dataset.ndim
    input_data = np.asarray(input_data)
    while input_data.ndim < spatial_ndim + 2:
        input_data = input_data[None]

    normalizer = get_normalizer(trainer)
    test_input = normalize_with_batch(input_data, normalizer)
    test_output = np.asarray(model(test_input))

    np.save(os.path.join(export_folder, "test_input.npy"), test_input)
    np.save(os.path.join(export_folder, "test_output.npy"), test_output)
    weights_path = _write_weights(model, export_folder)
    torch_weights_path, torch_arch = _write_torch_weights(model, export_folder)

    # model reconstruction manifest (framework-native weights entry)
    manifest = {
        "factory": getattr(model, "factory", None),
        "kwargs": json.loads(json.dumps(model.init_kwargs, default=str)),
    }
    with open(os.path.join(export_folder, "model_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)

    if documentation is None:
        doc_path = os.path.join(export_folder, "documentation.md")
        with open(doc_path, "w") as f:
            f.write(f"# {name or 'exported model'}\n\nExported from a tpu-em checkpoint.\n")
    else:
        doc_path = documentation

    ndim = test_input.ndim - 2
    axes = "bcyx" if ndim == 2 else "bczyx"
    preprocessing = _get_preprocessing(trainer)

    from datetime import datetime

    rdf = {
        "format_version": "0.4.10",
        "type": "model",
        # required by the 0.4 model spec (bioimageio.spec rejects rdfs
        # without it); ISO 8601 like the reference's build_model output
        "timestamp": datetime.now().isoformat(),
        "name": name or os.path.basename(checkpoint if isinstance(checkpoint, str) else "model"),
        "description": description or "Model exported from tpu-em.",
        "authors": authors or [{"name": "tpu-em"}],
        "cite": cite or get_default_citations(),
        "license": license,
        "documentation": os.path.basename(doc_path),
        "tags": tags or ["segmentation"],
        "inputs": [{
            "name": "input0", "axes": axes, "data_type": "float32",
            "shape": list(test_input.shape),
            **({"preprocessing": preprocessing} if preprocessing else {}),
        }],
        "outputs": [{
            "name": "output0", "axes": axes, "data_type": "float32",
            "shape": list(test_output.shape),
            **({"halo": list(halo)} if halo is not None else {}),
        }],
        "test_inputs": ["test_input.npy"],
        "test_outputs": ["test_output.npy"],
        "weights": {
            "jax": {"source": os.path.basename(weights_path),
                    "architecture": manifest["factory"]},
            **({"pytorch_state_dict": {
                "source": os.path.basename(torch_weights_path),
                "architecture": {
                    "callable": torch_arch.rsplit(".", 1)[-1],
                    "import_from": torch_arch.rsplit(".", 1)[0],
                    "kwargs": manifest["kwargs"],
                },
            }} if torch_weights_path is not None else {}),
        },
        "config": config,
    }
    if git_repo is not None:
        rdf["git_repo"] = git_repo
    if links:
        rdf["links"] = links
    if maintainers:
        rdf["maintainers"] = maintainers

    with open(os.path.join(export_folder, "rdf.yaml"), "w") as f:
        yaml.safe_dump(rdf, f)

    return _validate_model(export_folder)


def _validate_model(export_folder: str) -> bool:
    """Validate an exported package the way the reference's bioimageio.core
    round-trip does (reference modelzoo.py:602-614): (1) schema-level rdf
    validation against the vendored 0.4 model spec, (2) import the package
    and verify test input -> output.

    Packages whose only weight entry is the framework-native ``jax`` format
    (model families without a torch export) downgrade the spec's
    "no standard weight format" error to a warning — the package is valid for
    this framework but not portable to the official tooling.
    """
    import warnings

    from .bioimageio_spec import validate_model_rdf

    errors, spec_warnings = validate_model_rdf(export_folder)
    jax_only = ("no spec-defined weight format" in " ".join(errors))
    if jax_only:
        errors = [e for e in errors if "no spec-defined weight format" not in e]
        spec_warnings.append(
            "package carries only framework-native 'jax' weights; official "
            "bioimageio tooling needs add_weight_formats(..., ['pytorch_state_dict'])")
    for w in spec_warnings:
        warnings.warn(f"bioimageio spec: {w}")
    if errors:
        warnings.warn(f"bioimageio spec validation failed: {errors}")
        return False

    try:
        model, normalizer = import_bioimageio_model(export_folder)
        test_input = np.load(os.path.join(export_folder, "test_input.npy"))
        test_output = np.load(os.path.join(export_folder, "test_output.npy"))
        pred = np.asarray(model(test_input))
        return np.allclose(pred, test_output, atol=1e-4)
    except Exception as e:
        warnings.warn(f"Model validation failed: {e}")
        return False


def import_bioimageio_model(spec_path: str, return_spec: bool = False, device=None):
    """Load a model package back into a runnable model + normalizer
    (reference modelzoo.py:743).

    Handles both directions of the interop:

    - packages exported by this framework (``jax`` weights + manifest) restore
      natively;
    - packages exported by the **reference** (``pytorch_state_dict`` weights,
      a ``state_dict.pt`` from torch_em's exporter) are imported by mapping
      the architecture entry onto the native UNet family and converting the
      torch state dict (:func:`load_torch_unet_state`).

    ``spec_path`` may be a package folder, an ``rdf.yaml`` path, or a ``.zip``
    archive (the reference's export format).
    """
    import yaml
    from flax import serialization as flax_serialization

    from ..trainer.serialization import resolve_path

    if os.path.isfile(spec_path) and spec_path.endswith(".zip"):
        import tempfile
        from shutil import unpack_archive

        tmp_dir = tempfile.mkdtemp(prefix="tpu_em_import_")
        unpack_archive(spec_path, tmp_dir)
        folder = tmp_dir
    else:
        folder = spec_path if os.path.isdir(spec_path) else os.path.dirname(spec_path)

    rdf_path = next(
        (p for n in ("rdf.yaml", "bioimageio.yaml") if os.path.exists(p := os.path.join(folder, n))),
        None)
    if rdf_path is None:
        raise FileNotFoundError(f"No rdf.yaml / bioimageio.yaml in {folder}")
    with open(rdf_path) as f:
        rdf = yaml.safe_load(f)
    weights = rdf.get("weights", {})

    manifest_path = os.path.join(folder, "model_manifest.json")
    if "jax" in weights and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        factory = resolve_path(manifest["factory"])
        kwargs = {k: v for k, v in manifest["kwargs"].items()
                  if v is not None or k != "postprocessing"}
        model = factory(**kwargs)
        weights_file = os.path.join(folder, weights["jax"]["source"])
        with open(weights_file, "rb") as f:
            state = flax_serialization.msgpack_restore(f.read())
        variables = flax_serialization.from_state_dict(model.variables, state)
        model.replace_variables(variables)
    elif "pytorch_state_dict" in weights:
        model = _import_torch_package(folder, weights["pytorch_state_dict"])
    else:
        raise NotImplementedError(
            f"Package carries none of the supported weight formats "
            f"(jax, pytorch_state_dict): {sorted(weights)}")

    normalizer = _load_normalizer(rdf)
    if return_spec:
        return model, normalizer, rdf
    return model, normalizer


def _import_torch_package(folder, entry):
    """Build a native model from a reference-produced pytorch_state_dict
    weights entry (reference modelzoo.py:158: architecture callable + kwargs,
    ``state_dict.pt`` source)."""
    import torch

    from ..trainer.serialization import resolve_path

    arch = entry.get("architecture")
    if isinstance(arch, dict):
        callable_name = arch.get("callable") or ""
        kwargs = arch.get("kwargs") or entry.get("kwargs") or {}
    else:  # bioimageio 0.4 style: "unet.py:UNet2d" or dotted path
        callable_name = str(arch or "").replace(":", ".").rsplit(".", 1)[-1]
        kwargs = entry.get("kwargs") or {}
    native = {v.rsplit(".", 1)[-1]: k for k, v in _TORCH_ARCHITECTURES.items()}
    factory_path = native.get(callable_name.rsplit(".", 1)[-1])
    if factory_path is None:
        raise NotImplementedError(
            f"Cannot import torch architecture {callable_name!r}; "
            f"supported: {sorted(native)}")
    kwargs = {k: v for k, v in kwargs.items() if not (k == "postprocessing" and v is None)}
    model = resolve_path(factory_path)(**kwargs)

    source = os.path.basename(str(entry.get("source", "state_dict.pt")))
    state = torch.load(os.path.join(folder, source), map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model_state" in state:
        state = state["model_state"]
    model.replace_variables(load_torch_unet_state(model, state))
    return model


def _load_normalizer(rdf):
    """Reconstruct the normalizer from the preprocessing spec (reference :679)."""
    from functools import partial

    from ..transforms.raw import normalize, normalize_percentile, standardize

    preprocessing = rdf["inputs"][0].get("preprocessing")
    if not preprocessing:
        return standardize
    spec = preprocessing[0]
    # this framework's packages use "name"; bioimageio 0.5 rdfs use "id"
    name, kwargs = spec.get("name") or spec.get("id"), spec.get("kwargs", {})
    if name == "zero_mean_unit_variance":
        if kwargs.get("mode") == "fixed":
            return partial(standardize, mean=kwargs.get("mean"), std=kwargs.get("std"))
        return standardize
    if name == "scale_range":
        lower, upper = kwargs.get("min_percentile", 0.0), kwargs.get("max_percentile", 100.0)
        if lower == 0.0 and upper == 100.0:
            return normalize
        return partial(normalize_percentile, lower=lower, upper=upper)
    return standardize


def _build_mirror_for_package(folder):
    """Rebuild the packaged model and its torch mirror (UNet family only).

    Returns (model, mirror, example_input). Raises NotImplementedError for
    model families without a torch mapping or with torchscript-incompatible
    extras (side outputs / postprocessing)."""
    from .torch_mirror import build_torch_mirror

    model = _rebuild_model_from_package(folder)
    state = torch_state_dict_from_flax(model)
    factory = getattr(model, "factory", "") or ""
    if state is None or factory.rsplit(".", 1)[-1] not in ("UNet2d", "UNet3d", "AnisotropicUNet"):
        raise NotImplementedError(
            f"torchscript/onnx export is only available for the UNet family, "
            f"not {factory or type(model)}.")
    module = model.module
    if getattr(module, "return_side_outputs", False) or getattr(module, "postprocessing", None):
        raise NotImplementedError(
            "torchscript/onnx export does not support side outputs or postprocessing.")
    scale_factors = [list(sf) if isinstance(sf, (tuple, list)) else sf
                     for sf in module.scale_factors]
    mirror = build_torch_mirror(
        state, dim=module.dim, scale_factors=scale_factors, norm=module.norm,
        final_activation=module.final_activation)
    example_path = os.path.join(folder, "test_input.npy")
    if os.path.exists(example_path):
        example = np.load(example_path)
    else:
        spatial = tuple(int(np.prod([_sf if isinstance(_sf, int) else _sf[ax]
                                     for _sf in scale_factors])) * 2
                        for ax in range(module.dim))
        example = np.random.RandomState(0).rand(
            1, model.in_channels, *spatial).astype("float32")
    return model, mirror, example


def _export_torchscript(folder):
    """Trace the torch mirror and store it as the package's ``torchscript``
    weights entry (reference modelzoo.py:617-638), verifying the traced
    program against the native model on the package's test input."""
    import torch

    from .torch_mirror import trace_torch_mirror

    model, mirror, example = _build_mirror_for_package(folder)
    traced, out_ts = trace_torch_mirror(mirror, example)
    out_native = np.asarray(model(example))
    if not np.allclose(out_native, out_ts, atol=1e-4):
        raise RuntimeError(
            f"torchscript trace diverges from the native model "
            f"(max |d| = {np.abs(out_native - out_ts).max():.3e})")
    weights_path = os.path.join(folder, "weights_torchscript.pt")
    traced.save(weights_path)
    return weights_path, {"pytorch_version": str(torch.__version__)}


def convert_to_onnx(spec_path, opset_version=12):
    """Convert a package's UNet weights to ONNX via the torch mirror
    (reference modelzoo.py:791 converts its torch model the same way).

    Requires the ``onnx`` package (torch's exporter serializes through it);
    without it this raises with guidance rather than writing a broken file.
    """
    import torch

    folder = spec_path if os.path.isdir(spec_path) else os.path.dirname(spec_path)
    model, mirror, example = _build_mirror_for_package(folder)
    # same gate as the torchscript path: the mirror (what gets exported) must
    # reproduce the native model before anything is written into the package
    with torch.no_grad():
        out_mirror = mirror(torch.from_numpy(
            np.ascontiguousarray(example.astype("float32")))).numpy()
    out_native = np.asarray(model(example))
    if not np.allclose(out_native, out_mirror, atol=1e-4):
        raise RuntimeError(
            f"torch mirror diverges from the native model "
            f"(max |d| = {np.abs(out_native - out_mirror).max():.3e}); "
            f"refusing to export ONNX weights")
    out_path = os.path.join(folder, "weights.onnx")
    try:
        torch.onnx.export(
            mirror, (torch.from_numpy(np.ascontiguousarray(example.astype("float32"))),),
            out_path, opset_version=opset_version, dynamo=False,
            input_names=["input"], output_names=["output"])
    except Exception as e:
        if "onnx is not installed" in str(e).lower() or "onnxscript" in str(e):
            raise NotImplementedError(
                "ONNX conversion needs the 'onnx' package, which is not "
                "installed in this environment; the torchscript weight format "
                "(add_weight_formats(..., ['torchscript'])) covers the same "
                "consumers without it.") from e
        raise
    import yaml

    rdf_path = os.path.join(folder, "rdf.yaml")
    if os.path.exists(rdf_path):
        with open(rdf_path) as f:
            rdf = yaml.safe_load(f)
        rdf.setdefault("weights", {})["onnx"] = {
            "source": os.path.basename(out_path), "opset_version": opset_version}
        with open(rdf_path, "w") as f:
            yaml.safe_dump(rdf, f)
    return out_path


def _rebuild_model_from_package(folder):
    import importlib

    from flax import serialization as flax_serialization

    with open(os.path.join(folder, "model_manifest.json")) as f:
        manifest = json.load(f)
    mod_name, fn_name = manifest["factory"].rsplit(".", 1)
    factory = getattr(importlib.import_module(mod_name), fn_name)
    model = factory(**manifest["kwargs"])
    with open(os.path.join(folder, "weights.msgpack"), "rb") as f:
        state = flax_serialization.msgpack_restore(f.read())
    variables = flax_serialization.from_state_dict(model.variables, state)
    model.replace_variables(variables)
    return model


def add_weight_formats(model_path, additional_formats):
    """Add weight formats to an exported package (reference modelzoo.py:820).

    'jax' is native; 'pytorch_state_dict' / 'pytorch' rebuilds the model from
    the package and emits reference-loadable torch weights + rdf entry.
    """
    folder = model_path if os.path.isdir(model_path) else os.path.dirname(model_path)
    for fmt in additional_formats:
        if fmt == "jax":
            continue
        if fmt in ("pytorch_state_dict", "pytorch", "torch"):
            import yaml

            model = _rebuild_model_from_package(folder)
            weights_path, arch = _write_torch_weights(model, folder)
            if weights_path is None:
                raise NotImplementedError(
                    f"pytorch_state_dict export is only available for the UNet family, "
                    f"not {getattr(model, 'factory', type(model))}.")
            rdf_path = os.path.join(folder, "rdf.yaml")
            with open(rdf_path) as f:
                rdf = yaml.safe_load(f)
            with open(os.path.join(folder, "model_manifest.json")) as f:
                kwargs = json.load(f)["kwargs"]
            rdf.setdefault("weights", {})["pytorch_state_dict"] = {
                "source": os.path.basename(weights_path),
                "architecture": {
                    "callable": arch.rsplit(".", 1)[-1],
                    "import_from": arch.rsplit(".", 1)[0],
                    "kwargs": kwargs,
                },
            }
            with open(rdf_path, "w") as f:
                yaml.safe_dump(rdf, f)
        elif fmt == "torchscript":
            import yaml

            weights_path, extra = _export_torchscript(folder)
            rdf_path = os.path.join(folder, "rdf.yaml")
            with open(rdf_path) as f:
                rdf = yaml.safe_load(f)
            rdf.setdefault("weights", {})["torchscript"] = {
                "source": os.path.basename(weights_path), **extra}
            with open(rdf_path, "w") as f:
                yaml.safe_dump(rdf, f)
        elif fmt == "onnx":
            convert_to_onnx(folder)
        else:
            raise NotImplementedError(f"Weight format {fmt} is not supported for jax models yet.")


def get_mws_config(offsets, config=None) -> Dict:
    """Mutex-watershed tool config (reference modelzoo.py:867)."""
    mws_config = {"offsets": offsets}
    config = {} if config is None else config
    config.update({"mws": mws_config})
    return config


def get_shallow2deep_config(rf_path, config=None) -> Dict:
    """Shallow2Deep tool config (reference modelzoo.py:879)."""
    import pickle

    if os.path.isdir(rf_path):
        import glob

        rf_candidates = sorted(glob.glob(os.path.join(rf_path, "*.pkl")))
        assert rf_candidates, f"No rf found in {rf_path}"
        rf_path = rf_candidates[0]
    with open(rf_path, "rb") as f:
        rf = pickle.load(f)
    shallow2deep_config = {
        "ndim": getattr(rf, "ndim", None),
        "features": getattr(rf, "feature_config", None),
    }
    config = {} if config is None else config
    config.update({"shallow2deep": shallow2deep_config})
    return config


def export_parser_helper():
    """Argparse helper for the export CLI (reference modelzoo.py:855)."""
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--checkpoint", required=True)
    parser.add_argument("-i", "--input", required=True)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("-a", "--affs_to_bd", default=0, type=int)
    parser.add_argument("-f", "--additional_formats", type=str, nargs="+")
    return parser


def _load_data(path, key):
    from .io import load_data

    data = load_data(path, key)
    return np.asarray(data[:])


def main():
    """CLI: torch_em.export_bioimageio_model (reference modelzoo.py:635)."""
    parser = export_parser_helper()
    args = parser.parse_args()

    if "," in args.input:
        path, key = args.input.split(",")
    else:
        path, key = args.input, None
    input_data = _load_data(path, key) if key else np.load(path) if path.endswith(".npy") \
        else _load_data(path, None)

    postprocessing = None
    if bool(args.affs_to_bd):
        postprocessing = "affinities_to_boundaries2d"

    export_bioimageio_model(
        args.checkpoint, args.output, input_data, model_postprocessing=postprocessing,
    )
    if args.additional_formats:
        add_weight_formats(args.output, args.additional_formats)


def convert_main():
    """CLI: weight conversion (reference modelzoo.py:836)."""
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", required=True)
    parser.add_argument("-w", "--weight_format", required=True)
    args = parser.parse_args()
    add_weight_formats(args.model, [args.weight_format])
