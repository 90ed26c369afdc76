"""Benchmark: UNet3d (CREMI anisotropic config) training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The tracked number is train patches/sec/chip for the CREMI north-star config
(AnisotropicUNet, patch (32, 256, 256), bf16 compute / f32 params) —
BASELINE.md: the reference publishes no throughput numbers, so vs_baseline
is null and the driver records absolute values per round.

Section order is budget-aware for a COLD compilation cache (round-4 VERDICT
item 1): the primary scan metric compiles first, tiled inference immediately
after, then the loader modes — each optional section records WHY it was
skipped.  ``BENCH_SECTIONS=train,inference,loader`` (env) selects the
OPTIONAL sections (inference, loader) explicitly so a budget-starved driver
can sweep them across runs; the primary train metric always runs — the JSON
headline requires it.
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
# in-repo pre-populated compilation cache (committed): a driver round-end run
# starts from a fresh /tmp, so the multi-minute cold XLA compiles of the scan
# step / inference blocks are what ate the budget in rounds 3-4. The cache is
# keyed on compiler version + device fingerprint, so a mismatched environment
# simply misses and compiles as before.
_CACHE_DIR = os.path.join(_REPO, "experiments", "perf", "bench_xla_cache")
_FLOPS_FILE = os.path.join(_REPO, "experiments", "perf", "bench_nominal_flops.json")

_T0 = time.perf_counter()


def _mark(phase):
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {phase}",
          file=sys.stderr, flush=True)


def main():
    import jax

    # persistent compilation cache: repeated bench runs (and the driver's
    # round-end run) skip the multi-minute XLA compiles
    try:
        cache = _CACHE_DIR if os.path.isdir(_CACHE_DIR) else "/tmp/jax_bench_cache"
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from torch_em_tpu.loss import DiceLoss
    from torch_em_tpu.models import AnisotropicUNet
    from torch_em_tpu.models.unet import perf_options
    from torch_em_tpu.trainer.optimizers import OptimizerSpec

    patch = tuple(int(x) for x in os.environ.get("BENCH_PATCH", "32,256,256").split(","))
    batch_size = int(os.environ.get("BENCH_BATCH", "1"))
    n_warmup, n_steps = 3, 15
    sections = set(os.environ.get("BENCH_SECTIONS", "train,inference,loader").split(","))
    # the axon device claim can queue behind stale claims for many minutes
    # (measured: 26 min after an unclean client death) — acquire the device
    # FIRST and start the wall-clock budget only once it responds, so the
    # claim wait cannot eat the section budget
    _mark("acquiring device")
    jax.block_until_ready(jax.device_put(np.zeros(8, np.float32), jax.devices()[0]))
    _mark("device acquired")
    # wall-clock budget: optional sections (tiled inference, loader modes) are
    # skipped once exceeded so the primary metric always prints before a
    # driver timeout even with a cold compilation cache. The clock starts
    # AFTER model/optimizer init (below) — like the device claim, init is
    # mandatory overhead with high contention variance (measured 100-340 s),
    # and the budget exists to apportion the OPTIONAL work.
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "460"))

    def over_budget():
        return time.perf_counter() - t_start > budget_s

    # PHASE_WPAD: pad the shifted phase grid's odd W (129) to a sublane
    # multiple with dead zero columns so the grid keeps its (8x128) tiling
    # (exactness-verified in tests/test_unet.py::TestPhaseWpad). The round-4
    # in-run A/B never fit the driver budget; the winner measured on the
    # tracked config is now committed statically (experiments/perf logs,
    # round 5) and BENCH_PHASE_WPAD=0/1 still forces a side for re-audits.
    use_wpad = os.environ.get("BENCH_PHASE_WPAD", "1") == "1"

    model = AnisotropicUNet(
        in_channels=1, out_channels=1,
        scale_factors=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]],
        initial_features=32, final_activation="Sigmoid", anisotropic_kernel=True,
        dtype=jnp.bfloat16,
    )
    loss_obj = DiceLoss()
    tx = OptimizerSpec("adamw", lr=1e-4).build()

    device = jax.devices()[0]
    variables = jax.device_put(model.variables, device)
    opt_state = jax.device_put(tx.init(variables["params"]), device)
    jax.block_until_ready(jax.tree_util.tree_leaves(variables)[0])
    _mark("model+optimizer initialized; budget starts")
    t_start = time.perf_counter()

    def train_step(variables, opt_state, x, y):
        def loss_fn(p):
            pred = model.module.apply({"params": p}, x, train=True)
            return loss_obj(pred, y)

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        updates, opt_state_new = tx.update(grads, opt_state, variables["params"])
        params = jax.tree_util.tree_map(lambda p, u: p + u, variables["params"], updates)
        return {"params": params}, opt_state_new, loss

    # MFU must count the *model's* nominal FLOPs: the width-packed conv
    # lowering executes more than the nominal conv FLOPs (trading them for
    # MXU utilization), so cost-analyze a lowering with packing disabled.
    def nominal_flops():
        abstract = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype),
            (variables, opt_state,
             np.zeros((batch_size, 1) + patch, np.float32),
             np.zeros((batch_size, 1) + patch, np.float32)))
        with perf_options(packing=False):
            # cost analysis of the unoptimized HLO = nominal model FLOPs; lower
            # for the CPU backend on abstract shapes (no device, no compile —
            # the axon TPU plugin does not implement lowered cost analysis)
            for backend in ("cpu", None):
                try:
                    lowered = jax.jit(train_step, backend=backend).lower(*abstract)
                    cost = lowered.cost_analysis()
                    if cost and float(cost.get("flops", 0.0)) > 0:
                        return float(cost["flops"])
                except Exception:
                    continue
            return 0.0

    # the nominal-FLOP count for a (patch, batch, model) config is a pure
    # function of the model definition; the committed value skips the CPU
    # lowering + cost analysis (~1-2 min on a contended 1-core host) on the
    # default config. The key carries the parameter count as a model
    # fingerprint so a changed bench model invalidates the memo instead of
    # silently reusing stale FLOPs for the MFU number.
    n_params = sum(int(np.prod(np.shape(p)))
                   for p in jax.tree_util.tree_leaves(variables["params"]))
    flops_key = f"{'x'.join(map(str, patch))}_bs{batch_size}_p{n_params}"
    flops_per_step = 0.0
    try:
        with open(_FLOPS_FILE) as f:
            flops_per_step = float(json.load(f).get(flops_key, 0.0))
    except Exception:
        pass
    if not flops_per_step:
        _mark("computing nominal flops (no committed value)")
        try:
            flops_per_step = nominal_flops()
        except Exception:
            flops_per_step = 0.0
        if flops_per_step > 0:
            try:  # best-effort memoization for later runs in the same checkout
                table = {}
                if os.path.exists(_FLOPS_FILE):
                    with open(_FLOPS_FILE) as f:
                        table = json.load(f)
                table[flops_key] = flops_per_step
                with open(_FLOPS_FILE, "w") as f:
                    json.dump(table, f, indent=1)
            except Exception:
                pass
    _mark(f"nominal flops ready ({flops_per_step:.3e})")

    rng = np.random.default_rng(0)

    # ---- primary metric: multi-step scan execution (trainer
    # steps_per_execution feature) — k staged batches consumed by ONE jitted
    # lax.scan dispatch, eliminating the per-step host dispatch gap through
    # the device tunnel. Compiled FIRST so the headline number always lands.
    scan_k = int(os.environ.get("BENCH_SCAN_K", "32"))

    def scan_steps(variables, opt_state, xs, ys):
        def body(carry, batch):
            v, o = carry
            xb, yb = batch
            v, o, loss = train_step(v, o, xb, yb)
            return (v, o), loss

        (variables, opt_state), losses = jax.lax.scan(
            body, (variables, opt_state), (xs, ys))
        return variables, opt_state, losses

    scan_step = jax.jit(scan_steps, donate_argnums=(0, 1))
    xs = jax.device_put(
        rng.random((scan_k, batch_size, 1) + patch, dtype=np.float32), device)
    ys = jax.device_put(
        (rng.random((scan_k, batch_size, 1) + patch) > 0.5).astype(np.float32), device)
    # the perf flags are read at trace time, so the context must cover the
    # compiling first call; the timed calls below reuse the executable
    _mark("compiling scan step")
    with perf_options(phase_wpad=use_wpad):
        variables, opt_state, losses = scan_step(variables, opt_state, xs, ys)
        jax.block_until_ready(losses)  # compile + warmup
    _mark("scan step compiled+warm")
    n_scan_calls = 2
    t0 = time.perf_counter()
    for _ in range(n_scan_calls):
        variables, opt_state, losses = scan_step(variables, opt_state, xs, ys)
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / (n_scan_calls * scan_k)

    steps_per_sec = 1.0 / dt
    patches_per_sec = steps_per_sec * batch_size
    mvoxels_per_sec = patches_per_sec * np.prod(patch) / 1e6
    # v5e peak: 197 TFLOP/s bf16
    mfu = (flops_per_step * steps_per_sec) / 197e12 if flops_per_step else None

    # optional sections record WHY they were skipped (never silently null —
    # round-3 VERDICT item: the driver artifact must be self-explaining)
    skips = {}

    # ---- secondary metric: tiled-inference throughput (Mvoxel/s) on a
    # synthetic volume — immediately after the primary so it fits the budget
    # even from a cold cache (round-4 VERDICT item 1).
    inference_mvoxps = None
    try:
        if "inference" not in sections:
            raise RuntimeError("disabled via BENCH_SECTIONS")
        if over_budget():
            raise TimeoutError("budget exceeded before tiled-inference section")
        _mark("tiled-inference section")
        from torch_em_tpu.utils.prediction import predict_with_halo

        volume = rng.random((64, 512, 512), dtype=np.float32)
        fwd_model = AnisotropicUNet(
            in_channels=1, out_channels=1,
            scale_factors=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]],
            initial_features=32, final_activation="Sigmoid", anisotropic_kernel=True,
            dtype=jnp.bfloat16,
        )
        # Device-resident block-scan path (volume in HBM, prediction in HBM):
        # apples-to-apples with the training metric above, which also runs on
        # device-resident tensors. The host-e2e path is bounded by the axon
        # tunnel's ~20MB/s host<->device bandwidth in this environment, which
        # measures the tunnel, not the framework.
        vol_dev = jax.device_put(volume, device)
        out = predict_with_halo(vol_dev, fwd_model, gpu_ids=None,
                                block_shape=(32, 512, 512), halo=(4, 32, 32),
                                disable_tqdm=True, output_dtype="float16")
        jax.block_until_ready(out)  # warmup (compile)
        t0 = time.perf_counter()
        out = predict_with_halo(vol_dev, fwd_model, gpu_ids=None,
                                block_shape=(32, 512, 512), halo=(4, 32, 32),
                                disable_tqdm=True, output_dtype="float16")
        jax.block_until_ready(out)
        dt_inf = time.perf_counter() - t0
        inference_mvoxps = float(np.prod(volume.shape) / dt_inf / 1e6)
    except Exception as e:
        skips["tiled_inference"] = f"{type(e).__name__}: {e}"

    # ---- secondary metric: patches/s with the REAL host data path in the
    # loop (SegmentationDataset over h5 + AffinityTransform + prefetching
    # loader feeding a per-step jitted train step) — measures whether the
    # host keeps up with the device (SURVEY hard part #2). Uses one affinity
    # offset so the y shape matches the compiled step.
    loader_patches_per_sec = None
    loader_process_patches_per_sec = None
    loader_device_patches_per_sec = None
    dt_dispatch = None
    try:
        if "loader" not in sections:
            raise RuntimeError("disabled via BENCH_SECTIONS")
        if over_budget():
            raise TimeoutError("budget exceeded before loader section")
        _mark("loader section")
        import shutil
        import tempfile

        import h5py

        from torch_em_tpu.data import DataLoader as TemLoader, SegmentationDataset
        from torch_em_tpu.transforms.label import AffinityTransform

        # per-step executable (the loader modes feed individual steps); its
        # timing doubles as the single-dispatch diagnostic, so the scan-vs-
        # dispatch comparison costs no extra compile
        with perf_options(phase_wpad=use_wpad):
            step = jax.jit(train_step, donate_argnums=(0, 1))
            x1 = jax.device_put(
                rng.random((batch_size, 1) + patch, dtype=np.float32), device)
            y1 = jax.device_put(
                (rng.random((batch_size, 1) + patch) > 0.5).astype(np.float32), device)
            for _ in range(n_warmup):
                variables, opt_state, loss = step(variables, opt_state, x1, y1)
            jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            variables, opt_state, loss = step(variables, opt_state, x1, y1)
        jax.block_until_ready(loss)
        dt_dispatch = (time.perf_counter() - t0) / n_steps

        tmpdir = tempfile.mkdtemp(prefix="bench_loader_")
        h5_path = os.path.join(tmpdir, "vol.h5")
        with h5py.File(h5_path, "w") as f:
            f.create_dataset("raw", data=rng.random((64, 512, 512), dtype=np.float32),
                             chunks=(32, 128, 128))
            f.create_dataset("labels",
                             data=rng.integers(1, 500, (64, 512, 512)).astype("uint32"),
                             chunks=(32, 128, 128))
        n_loader_steps = 8

        def run_loader(loader, use_step):
            it = iter(loader)
            nonlocal variables, opt_state
            loss = None
            for k in range(2 + n_loader_steps):
                if k == 2:
                    jax.block_until_ready(loss)
                    t0 = time.perf_counter()
                xb, yb = next(it)
                xb = jax.device_put(xb, device)
                yb = jax.device_put(yb, device)
                variables, opt_state, loss = use_step(variables, opt_state, xb, yb)
            jax.block_until_ready(loss)
            return n_loader_steps * batch_size / (time.perf_counter() - t0)

        def make_host_ds():
            return SegmentationDataset(
                h5_path, "raw", h5_path, "labels", patch_shape=patch,
                label_transform=AffinityTransform(offsets=[[-1, 0, 0]], add_mask=False),
                label_dtype="float32", n_samples=2 * (2 + n_loader_steps),
            )

        # (a) host transforms, thread workers
        loader_patches_per_sec = run_loader(
            TemLoader(make_host_ds(), batch_size=batch_size, shuffle=True, num_workers=2),
            step)

        # (b) raw labels + the label transform FUSED INSIDE the jitted train
        # step — the trainer's own device_label_transform path
        # (trainer/default_trainer.py:_compute_loss), not a separate dispatch
        if over_budget():
            skips["loader_device_transform"] = "budget exceeded"
        else:
            from torch_em_tpu.ops.device import DeviceAffinityTransform

            dev_trafo = DeviceAffinityTransform(offsets=[[-1, 0, 0]])

            def train_step_fused(variables, opt_state, x, ylab):
                y = dev_trafo(ylab)

                def loss_fn(p):
                    pred = model.module.apply({"params": p}, x, train=True)
                    return loss_obj(pred, y)

                loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
                updates, opt_state_new = tx.update(grads, opt_state, variables["params"])
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u, variables["params"], updates)
                return {"params": params}, opt_state_new, loss

            with perf_options(phase_wpad=use_wpad):
                step_fused = jax.jit(train_step_fused, donate_argnums=(0, 1))
                ds_raw = SegmentationDataset(
                    h5_path, "raw", h5_path, "labels", patch_shape=patch,
                    label_dtype="int32", n_samples=2 * (2 + n_loader_steps),
                )
                loader_device_patches_per_sec = run_loader(
                    TemLoader(ds_raw, batch_size=batch_size, shuffle=True, num_workers=2),
                    step_fused)

        # (c) host transforms, spawn-process workers — only meaningful on
        # many-core hosts; recorded either way for the comparison. Last:
        # least informative on a 1-core host.
        if over_budget():
            skips["loader_process_workers"] = "budget exceeded"
        else:
            ploader = TemLoader(make_host_ds(), batch_size=batch_size, shuffle=True,
                                num_workers=2, worker_mode="process")
            try:
                loader_process_patches_per_sec = run_loader(ploader, step)
            finally:
                ploader.shutdown()
        shutil.rmtree(tmpdir, ignore_errors=True)
    except Exception as e:
        skips["loader"] = f"{type(e).__name__}: {e}"

    _mark("emitting JSON")
    print(json.dumps({
        "metric": "unet3d_train_patches_per_sec_chip",
        "value": round(patches_per_sec, 4),
        "unit": "patches/s",
        "vs_baseline": None,
        "details": {
            "patch": list(patch), "batch_size": batch_size,
            "mvoxels_per_sec": round(float(mvoxels_per_sec), 2),
            "s_per_iter": round(dt, 4),
            "steps_per_execution": scan_k,
            "s_per_iter_single_dispatch":
            None if dt_dispatch is None else round(dt_dispatch, 4),
            "phase_wpad_used": bool(use_wpad),
            "mfu_vs_v5e_peak": None if mfu is None else round(float(mfu), 4),
            "patches_per_sec_with_loader": None if loader_patches_per_sec is None
            else round(float(loader_patches_per_sec), 4),
            "patches_per_sec_with_loader_process_workers":
            None if loader_process_patches_per_sec is None
            else round(float(loader_process_patches_per_sec), 4),
            "patches_per_sec_with_loader_device_transform":
            None if loader_device_patches_per_sec is None
            else round(float(loader_device_patches_per_sec), 4),
            # loader numbers are host-bound in this environment: the loader
            # modes need host cores to overlap IO/transform with the device
            "host_cpu_count": os.cpu_count(),
            "tiled_inference_mvoxels_per_sec": None if inference_mvoxps is None
            else round(inference_mvoxps, 2),
            "skipped_sections": skips or None,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
