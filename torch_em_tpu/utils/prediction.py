"""Tiled inference: padding-based and halo-based block-wise prediction.

Rebuild of torch_em/util/prediction.py: ``predict_with_padding`` (:18) and
``predict_with_halo`` (:142) with the same semantics — halo blocks, border
padding, mask/skip_block, multi-output channel splitting, grid_shift, roi.

TPU-first redesign:
- blocking math is plain numpy (replaces nifty.tools.blocking, :225),
- every block has the same static shape (block + 2*halo), so one jitted
  forward is compiled once and reused for all blocks,
- blocks are batched (``batch_size``) to fill the MXU, and host-side block
  loading overlaps device compute via a thread pool (the reference's
  per-device thread farm, :309, generalized to jax devices).
"""

import weakref
from collections import deque
from concurrent import futures
from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from ..transforms.raw import standardize

__all__ = ["Blocking", "predict_with_padding", "predict_with_halo"]


# Jitted halo-forwards cached per Model instance so repeated predict_with_halo
# calls (grid search, validation sweeps, per-volume loops) reuse the XLA
# executable instead of recompiling — the round-1 bench paid a full recompile
# on every call. Keyed on everything that changes the traced computation.
_HALO_FORWARD_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()

# Device-resident copies of model.variables, cached per Model instance so
# repeated calls don't re-ship ~100MB of parameters host->device every time.
# Invalidated when model.variables is replaced (id changes).
_DEV_VARS_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _get_device_variables(model, device):
    try:
        entry = _DEV_VARS_CACHE.get(model)
    except TypeError:
        entry = None
    if entry is None or entry[0] != id(model.variables):
        entry = (id(model.variables), {})
        try:
            _DEV_VARS_CACHE[model] = entry
        except TypeError:
            pass
    per_dev = entry[1]
    if device not in per_dev:
        per_dev[device] = jax.device_put(model.variables, device)
    return per_dev[device]


def _get_halo_forward(model, ndim, halo, block_shape, output_dtype, device_standardize):
    try:
        cache = _HALO_FORWARD_CACHE.setdefault(model, {})
    except TypeError:  # unhashable/unweakrefable model wrapper
        cache = {}
    key = (tuple(halo), tuple(block_shape), int(ndim), str(output_dtype), bool(device_standardize))
    fn = cache.get(key)
    if fn is not None:
        return fn

    inner_crop = tuple(slice(ha, ha + bs) for ha, bs in zip(halo, block_shape))

    def fwd(v, inp):
        if device_standardize:
            # fold the default host-side `standardize` preprocess into the
            # compiled step: per-item zero-mean/unit-std over all non-batch axes
            axes = tuple(range(1, inp.ndim))
            mean = jnp.mean(inp, axis=axes, keepdims=True)
            inp = inp - mean
            std = jnp.std(inp, axis=axes, keepdims=True)
            inp = inp / (std + 1e-7)
        out = model.module.apply(v, inp, train=False)
        out = out[0] if isinstance(out, (list, tuple)) else out
        spatial_offset = out.ndim - ndim
        crop = (slice(None),) * spatial_offset + inner_crop
        out = out[crop]
        if output_dtype is not None:
            # cast on device: halves the device->host readback volume for f16
            out = out.astype(output_dtype)
        return out

    fn = jax.jit(fwd)
    cache[key] = fn
    return fn


class Blocking:
    """Grid decomposition of a volume into blocks (replaces nifty.tools.blocking)."""

    def __init__(self, start: Sequence[int], stop: Sequence[int], block_shape: Sequence[int]):
        self.start = tuple(int(s) for s in start)
        self.stop = tuple(int(s) for s in stop)
        self.block_shape = tuple(int(b) for b in block_shape)
        self.blocks_per_axis = tuple(
            int(np.ceil((sp - st) / bs)) for st, sp, bs in zip(self.start, self.stop, self.block_shape)
        )
        self.n_blocks = int(np.prod(self.blocks_per_axis))

    @property
    def numberOfBlocks(self):  # nifty API parity
        return self.n_blocks

    def get_block(self, block_id: int) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
        coords = np.unravel_index(block_id, self.blocks_per_axis)
        begin = tuple(st + c * bs for st, c, bs in zip(self.start, coords, self.block_shape))
        end = tuple(min(b + bs, sp) for b, bs, sp in zip(begin, self.block_shape, self.stop))
        return begin, end

    def getBlock(self, block_id: int):  # nifty API parity
        begin, end = self.get_block(block_id)

        class _B:
            pass

        b = _B()
        b.begin, b.end = list(begin), list(end)
        b.shape = [e - s for s, e in zip(begin, end)]
        return b


def predict_with_padding(
    model,
    input_: np.ndarray,
    min_divisible: Tuple[int, ...],
    device=None,
    with_channels: bool = False,
    prediction_function: Optional[Callable] = None,
) -> np.ndarray:
    """Pad input to divisibility, run a single forward, crop back
    (reference prediction.py:18)."""
    if with_channels:
        assert len(min_divisible) + 1 == input_.ndim, f"{min_divisible}, {input_.ndim}"
        min_divisible_ = (1,) + tuple(min_divisible)
    else:
        assert len(min_divisible) == input_.ndim
        min_divisible_ = tuple(min_divisible)

    if any(sh % md != 0 for sh, md in zip(input_.shape, min_divisible_)):
        pad_width = tuple(
            (0, 0 if sh % md == 0 else md - sh % md) for sh, md in zip(input_.shape, min_divisible_)
        )
        crop_padding = tuple(slice(0, sh) for sh in input_.shape)
        input_ = np.pad(input_, pad_width, mode="reflect")
    else:
        crop_padding = None

    ndim = input_.ndim
    ndim_model = 1 + ndim if with_channels else 2 + ndim
    expand_dim = (None,) * (ndim_model - ndim)
    model_input = input_[expand_dim]
    output = model(model_input) if prediction_function is None else prediction_function(model, model_input)
    if isinstance(output, (list, tuple)):
        output = output[0]
    output = np.asarray(output)

    if crop_padding is not None:
        crop_padding = (slice(None),) * (output.ndim - len(crop_padding)) + crop_padding
        output = output[crop_padding]
    return output


def _pad_for_shift_left(arr, pad_vox, with_channels, mode="constant", constant_values=0.0):
    pad_width = tuple((pl, 0) for pl in pad_vox)
    if with_channels:
        pad_width = ((0, 0),) + pad_width
    kwargs = {"constant_values": constant_values} if mode == "constant" else {}
    return np.pad(arr, pad_width, mode=mode, **kwargs), tuple(pad_vox)


def _crop_after_shift_left(arr, pad_left, with_channels, original_shape_spatial):
    spatial_slices = tuple(slice(st, st + sh) for st, sh in zip(pad_left, original_shape_spatial))
    return arr[(slice(None),) + spatial_slices] if with_channels else arr[spatial_slices]


def _load_block(input_, offset, block_shape, halo, padding_mode="reflect", with_channels=False):
    """Read block + halo, padding at the volume borders (reference prediction.py:95)."""
    shape = input_.shape
    if with_channels:
        shape = shape[1:]

    starts = [off - ha for off, ha in zip(offset, halo)]
    stops = [off + bs + ha for off, bs, ha in zip(offset, block_shape, halo)]

    pad_left = None
    pad_right = None
    if any(start < 0 for start in starts):
        pad_left = tuple(abs(start) if start < 0 else 0 for start in starts)
        starts = [max(0, start) for start in starts]
    if any(stop > shape[i] for i, stop in enumerate(stops)):
        pad_right = tuple(stop - shape[i] if stop > shape[i] else 0 for i, stop in enumerate(stops))
        stops = [min(shape[i], stop) for i, stop in enumerate(stops)]

    bb = tuple(slice(start, stop) for start, stop in zip(starts, stops))
    data = np.asarray(input_[(slice(None),) + bb] if with_channels else input_[bb])

    ndim = len(shape)
    if pad_left is not None or pad_right is not None:
        pad_left = (0,) * ndim if pad_left is None else pad_left
        pad_right = (0,) * ndim if pad_right is None else pad_right
        pad_width = tuple((pl, pr) for pl, pr in zip(pad_left, pad_right))
        if with_channels:
            pad_width = ((0, 0),) + pad_width
        data = np.pad(data, pad_width, mode=padding_mode)
        bb = tuple(slice(b.start - pl, b.stop + pr) for b, pl, pr in zip(bb, pad_left, pad_right))
    return data, bb


def _get_device_block_forward(model, ndim, halo, block_shape, slice_shape, batch,
                              output_dtype, device_standardize):
    """Jitted fixed-shape forward for the device-resident tiled path: slices
    `batch` blocks out of the padded device volume, standardizes, runs the
    model, crops the halo. Cached like _get_halo_forward."""
    try:
        cache = _HALO_FORWARD_CACHE.setdefault(model, {})
    except TypeError:
        cache = {}
    key = ("device", tuple(halo), tuple(block_shape), tuple(slice_shape), int(batch),
           int(ndim), str(output_dtype), bool(device_standardize))
    fn = cache.get(key)
    if fn is not None:
        return fn

    inner = tuple(slice(h, h + b) for h, b in zip(halo, block_shape))

    def _batch_body(v, vol, starts):
        blks = []
        for i in range(batch):
            st = (jnp.int32(0),) + tuple(starts[i, d] for d in range(ndim))
            blks.append(jax.lax.dynamic_slice(vol, st, slice_shape))
        x = jnp.stack(blks)  # (B, C, *block+2halo)
        if device_standardize:
            axes = tuple(range(1, x.ndim))
            mean = jnp.mean(x, axis=axes, keepdims=True)
            x = x - mean
            x = x / (jnp.std(x, axis=axes, keepdims=True) + 1e-7)
        out = model.module.apply(v, x, train=False)
        out = out[0] if isinstance(out, (list, tuple)) else out
        out = out[(slice(None), slice(None)) + inner]
        if output_dtype is not None:
            out = out.astype(output_dtype)
        return out  # (B, C_out, *block)

    def fwd(v, vol, starts):  # starts: (S, B, ndim) — S batches in ONE dispatch
        def step(_, sb):
            return None, _batch_body(v, vol, sb)
        _, outs = jax.lax.scan(step, None, starts)
        return outs  # (S, B, C_out, *block)

    fn = jax.jit(fwd)
    cache[key] = fn
    return fn


def _predict_with_halo_on_device(input_dev, model, block_shape, halo, with_channels,
                                 device_standardize, output_dtype, batch_size):
    """Tiled halo inference for a device-resident volume: the volume is padded
    once in HBM, blocks are sliced/assembled entirely on device, and the
    prediction is returned as a device array — zero per-block host<->device
    traffic (the TPU-native block scan of SURVEY.md §7 step 6).

    Matches the host path exactly on all interior voxels. At the outer volume
    border the reflect padding is computed from the whole volume rather than
    per loaded block (the reference's convention, prediction.py:95), which can
    differ within a receptive field of the border when a partial edge block is
    thinner than the required pad."""
    ndim = input_dev.ndim - (1 if with_channels else 0)
    spatial = tuple(input_dev.shape[1:] if with_channels else input_dev.shape)
    block_shape, halo = tuple(block_shape), tuple(halo)
    grid = tuple(int(np.ceil(s / b)) for s, b in zip(spatial, block_shape))
    padded_sp = tuple(g * b for g, b in zip(grid, block_shape))
    n_out = model.out_channels or 1

    vol = input_dev if with_channels else input_dev[None]
    pad_width = ((0, 0),) + tuple(
        (h, ps - s + h) for h, ps, s in zip(halo, padded_sp, spatial))
    vol_p = jnp.pad(vol.astype(jnp.float32), pad_width, mode="reflect")

    slice_shape = (vol_p.shape[0],) + tuple(b + 2 * h for b, h in zip(block_shape, halo))
    starts_all = np.stack(np.meshgrid(
        *[np.arange(g) * b for g, b in zip(grid, block_shape)], indexing="ij",
    ), -1).reshape(-1, ndim).astype(np.int32)
    n_blocks = len(starts_all)
    batch = max(1, min(int(batch_size), n_blocks))

    fwd = _get_device_block_forward(
        model, ndim, halo, block_shape, slice_shape, batch, output_dtype, device_standardize)
    variables = _get_device_variables(model, list(input_dev.devices())[0])

    # Pack the block grid as (S, B, ndim) batches and run S scan steps per
    # dispatch. Dispatching scans of power-of-two length (32, 16, ... 1)
    # amortizes the per-dispatch gap over up to 32 batches while keeping the
    # set of compiled executables bounded across volume sizes.
    n_steps = int(np.ceil(n_blocks / batch))
    pad_n = n_steps * batch - n_blocks
    if pad_n:  # pad with repeats to keep the executable's shape
        starts_all = np.concatenate([starts_all, np.repeat(starts_all[-1:], pad_n, axis=0)])
    starts_all = starts_all.reshape(n_steps, batch, ndim)

    outs, i = [], 0
    while i < n_steps:
        c = 1 << int(np.floor(np.log2(n_steps - i)))
        c = min(c, 32)
        out = fwd(variables, vol_p, jnp.asarray(starts_all[i:i + c]))
        outs.append(out.reshape((c * batch,) + out.shape[2:]))
        i += c

    a = jnp.concatenate(outs, axis=0)[:n_blocks] if len(outs) > 1 else outs[0][:n_blocks]
    a = a.reshape(grid + (n_out,) + block_shape)
    perm = (ndim,) + tuple(x for i in range(ndim) for x in (i, ndim + 1 + i))
    a = a.transpose(perm).reshape((n_out,) + padded_sp)
    return a[(slice(None),) + tuple(slice(0, s) for s in spatial)]


def predict_with_halo(
    input_,
    model,
    gpu_ids: Optional[List[Union[str, int]]] = None,
    block_shape: Tuple[int, ...] = None,
    halo: Tuple[int, ...] = None,
    output=None,
    preprocess: Optional[Callable] = standardize,
    postprocess: Optional[Callable] = None,
    with_channels: bool = False,
    skip_block: Optional[Callable] = None,
    mask=None,
    disable_tqdm: bool = False,
    tqdm_desc: str = "predict with halo",
    prediction_function: Optional[Callable] = None,
    roi: Optional[Tuple[slice, ...]] = None,
    iter_list: Optional[List[int]] = None,
    grid_shift: Optional[Tuple[float, ...]] = None,
    batch_size: int = 1,
    devices: Optional[List] = None,
    n_threads: Optional[int] = None,
    output_dtype=None,
):
    """Block-wise prediction with halo (reference prediction.py:142).

    ``gpu_ids`` is kept for API parity; on TPU pass ``devices`` (jax devices)
    or leave None for the default device. All blocks share one static shape so
    the forward compiles once (cached across calls); ``batch_size`` packs
    multiple blocks into one forward to fill the MXU, and host block loading is
    double-buffered against device compute.

    If ``input_`` is already a device-resident ``jax.Array`` (and no host-side
    hooks — mask/skip/custom pre/postprocess/roi — are requested), the fully
    on-device block-scan path is used: blocks are sliced and reassembled in
    HBM and a device array is returned, with zero per-block host traffic.
    """
    if devices is None:
        if gpu_ids is None or all(g in ("cpu", None) for g in (gpu_ids or [None])):
            devices = [jax.devices()[0]]
        else:
            avail = jax.devices()
            devices = [avail[int(g) % len(avail)] if not isinstance(g, str) or g.isdigit() else avail[0]
                       for g in gpu_ids]
    n_workers = len(devices)

    shape0 = input_.shape
    shape_spatial0 = shape0[1:] if with_channels else shape0
    ndim = len(shape_spatial0)
    assert len(block_shape) == len(halo) == ndim

    if (isinstance(input_, jax.Array) and prediction_function is None and mask is None
            and skip_block is None and roi is None and grid_shift is None
            and output is None and iter_list is None and postprocess is None
            and (preprocess is standardize or preprocess is None) and len(devices) == 1):
        return _predict_with_halo_on_device(
            input_, model, block_shape, halo, with_channels,
            device_standardize=preprocess is standardize,
            output_dtype=output_dtype, batch_size=batch_size,
        )

    input_eff = input_
    mask_eff = mask
    if grid_shift is not None:
        assert len(grid_shift) == ndim, "grid_shift must match number of spatial dims"
        pad_vox = tuple(int(np.rint(abs(gs) * bs)) for gs, bs in zip(grid_shift, block_shape))
        if not isinstance(input_eff, np.ndarray):
            raise TypeError("grid_shift padding currently requires input_ to be a numpy array")
        input_eff, pad_left = _pad_for_shift_left(
            input_eff, pad_vox, with_channels=with_channels, mode="constant", constant_values=0
        )
        if mask_eff is not None:
            if not isinstance(mask_eff, np.ndarray):
                raise TypeError("grid_shift padding currently requires mask to be a numpy array")
            mask_eff, _ = _pad_for_shift_left(mask_eff, pad_vox, with_channels=False,
                                              mode="constant", constant_values=0)
    else:
        pad_left = (0,) * ndim

    shape_eff = input_eff.shape
    shape_spatial_eff = shape_eff[1:] if with_channels else shape_eff

    if roi is None:
        blocking = Blocking([0] * ndim, shape_spatial_eff, block_shape)
    else:
        assert len(roi) == ndim
        blocking_start = [0 if ro.start is None else ro.start for ro in roi]
        blocking_stop = [sh if ro.stop is None else ro.stop for ro, sh in zip(roi, shape_spatial_eff)]
        blocking = Blocking(blocking_start, blocking_stop, block_shape)

    if output is None:
        n_out = model.out_channels
        if n_out is None:
            n_out = 1
        output = np.zeros((n_out,) + tuple(shape_spatial_eff), dtype="float32")
    elif grid_shift:
        raise ValueError(
            "grid_shift is not supported together with a user-provided `output`. "
            "Pass `output=None` or disable `grid_shift`."
        )

    n_blocks = blocking.n_blocks
    iteration_ids = list(range(n_blocks)) if iter_list is None else list(iter_list)

    # The forward crops the halo ON DEVICE so only the inner block is fetched
    # back (device->host readback is a bottleneck of tiled inference); when the
    # preprocess is the default `standardize`, it is folded into the compiled
    # step too, so the host only loads and ships raw blocks.
    device_standardize = preprocess is standardize and prediction_function is None
    batch_size = max(1, int(batch_size))

    def _load_one(block_id):
        """Host side of one block: mask/skip checks, load, (custom) preprocess.

        Returns None for skipped blocks, else (block_id, begin, end,
        mask_block-or-None, block array in model layout without batch dim).
        """
        begin, end = blocking.get_block(block_id)
        offset = list(begin)
        block_shape_actual = [e - b for b, e in zip(begin, end)]
        inner_bb = tuple(slice(ha, ha + bs) for ha, bs in zip(halo, block_shape_actual))

        mask_block = None
        if mask_eff is not None:
            mask_block, _ = _load_block(mask_eff, offset, block_shape, halo, with_channels=False)
            mask_block = mask_block[inner_bb].astype(bool)
            if mask_block.sum() == 0:
                return None

        inp, _ = _load_block(input_eff, offset, block_shape, halo, with_channels=with_channels)
        if skip_block is not None and skip_block(inp):
            return None
        if preprocess is not None and not device_standardize:
            inp = preprocess(inp)
        if not with_channels:
            inp = inp[None]  # add channel dim; batch dim is added by stacking
        return block_id, begin, end, mask_block, np.ascontiguousarray(inp, dtype=np.float32)

    def _write_one(meta, prediction):
        """Write one block's (inner, already halo-cropped) prediction."""
        _, begin, end, mask_block, _ = meta
        if postprocess is not None:
            prediction = postprocess(prediction)
        actual = tuple(slice(0, e - b) for b, e in zip(begin, end))
        lead = (slice(None),) * (prediction.ndim - ndim)
        prediction = prediction[lead + actual]

        if mask_block is not None:
            if prediction.ndim == ndim + 1:
                mb = np.broadcast_to(mask_block[None], prediction.shape)
            else:
                mb = mask_block
            prediction = np.where(mb, prediction, 0)

        bb = tuple(slice(beg, e) for beg, e in zip(begin, end))
        if isinstance(output, list):  # multiple outputs, split prediction channels
            for out, channel_slice in output:
                this_bb = bb if out.ndim == ndim else (slice(None),) + bb
                out[this_bb] = prediction[channel_slice]
        else:
            out_bb = (slice(None),) + bb if output.ndim == ndim + 1 else bb
            output[out_bb] = prediction

    if prediction_function is not None:
        # custom prediction callables run per block, unbatched (API parity)
        def predict_block(block_id):
            payload = _load_one(block_id)
            if payload is None:
                return
            _, begin, end, _, inp = payload
            block_shape_actual = [e - b for b, e in zip(begin, end)]
            inner_bb = tuple(slice(ha, ha + bs) for ha, bs in zip(halo, block_shape_actual))
            prediction = prediction_function(model, jnp.asarray(inp[None]))
            if isinstance(prediction, (list, tuple)):
                prediction = prediction[0]
            prediction = np.asarray(prediction).squeeze(0)
            if postprocess is not None:
                prediction = postprocess(prediction)
            inner_bb_pred = (slice(None),) + inner_bb if prediction.ndim == ndim + 1 else inner_bb
            prediction = prediction[inner_bb_pred]

            meta = (payload[0], begin, end, payload[3], None)
            _, begin, end, mask_block, _ = meta
            if mask_block is not None:
                mb = np.broadcast_to(mask_block[None], prediction.shape) \
                    if prediction.ndim == ndim + 1 else mask_block
                prediction = np.where(mb, prediction, 0)
            bb = tuple(slice(beg, e) for beg, e in zip(begin, end))
            if isinstance(output, list):
                for out, channel_slice in output:
                    this_bb = bb if out.ndim == ndim else (slice(None),) + bb
                    out[this_bb] = prediction[channel_slice]
            else:
                out_bb = (slice(None),) + bb if output.ndim == ndim + 1 else bb
                output[out_bb] = prediction

        pool_size = max(4 * n_workers, 4) if n_threads is None else n_threads
        with futures.ThreadPoolExecutor(pool_size) as tp:
            list(tqdm(
                tp.map(predict_block, iteration_ids), total=len(iteration_ids),
                disable=disable_tqdm, desc=tqdm_desc,
            ))
    else:
        # batched + double-buffered pipeline: a loader thread pool keeps a
        # bounded lookahead of host blocks; the main thread stacks them into
        # fixed-size batches (padding the last one so ONE executable serves
        # every call), dispatches asynchronously round-robin over devices, and
        # drains results two-deep so host writes overlap device compute.
        forward = _get_halo_forward(model, ndim, halo, block_shape, output_dtype, device_standardize)
        vars_per_dev = [_get_device_variables(model, d) for d in devices]

        n_load_threads = max(4, 2 * batch_size) if n_threads is None else n_threads
        lookahead = max(2 * batch_size * max(n_workers, 1), n_load_threads)
        pending = deque()  # (dev_out, [meta...])
        max_inflight = max(2 * n_workers, 2)
        pbar = tqdm(total=len(iteration_ids), disable=disable_tqdm, desc=tqdm_desc)

        def _drain_one():
            dev_out, metas = pending.popleft()
            host_out = np.asarray(dev_out)
            for i, meta in enumerate(metas):
                _write_one(meta, host_out[i])
            pbar.update(len(metas))

        with futures.ThreadPoolExecutor(n_load_threads) as load_pool:
            load_q = deque()
            next_submit = 0

            def _submit_more():
                nonlocal next_submit
                while next_submit < len(iteration_ids) and len(load_q) < lookahead:
                    load_q.append(load_pool.submit(_load_one, iteration_ids[next_submit]))
                    next_submit += 1

            batch_payloads = []
            dispatch_idx = 0
            _submit_more()
            while load_q or batch_payloads:
                if load_q:
                    payload = load_q.popleft().result()
                    _submit_more()
                    if payload is None:
                        pbar.update(1)
                    else:
                        batch_payloads.append(payload)
                flush = len(batch_payloads) == batch_size or (not load_q and batch_payloads)
                if flush:
                    stacked = np.stack([p[4] for p in batch_payloads])
                    if len(batch_payloads) < batch_size:
                        pad = batch_size - len(batch_payloads)
                        stacked = np.concatenate(
                            [stacked, np.zeros((pad,) + stacked.shape[1:], stacked.dtype)])
                    widx = dispatch_idx % n_workers
                    dispatch_idx += 1
                    dev_out = forward(
                        vars_per_dev[widx], jax.device_put(stacked, devices[widx]))
                    pending.append((dev_out, list(batch_payloads)))
                    batch_payloads = []
                    while len(pending) > max_inflight:
                        _drain_one()
            while pending:
                _drain_one()
        pbar.close()

    if grid_shift is not None:
        output = _crop_after_shift_left(
            output, pad_left, with_channels=(output.ndim == ndim + 1),
            original_shape_spatial=tuple(shape_spatial0),
        )
    return output
