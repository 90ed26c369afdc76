"""DefaultTrainer: the training loop.

TPU-native rebuild of torch_em/trainer/default_trainer.py:24. Semantics kept
from the reference: ``fit(iterations|epochs)`` (:643) with per-epoch train ->
validate -> ReduceLROnPlateau.step(metric) -> best/latest/epoch-k checkpoints
-> early stopping; resume via ``load_from_checkpoint`` and the
``overwrite_training=False`` completed-guard (:636); checkpoints carry the
full serialized constructor data so ``from_checkpoint`` (:282) rebuilds a
fully trainable trainer; lower-metric-is-better convention.

TPU-first redesign (SURVEY.md §7):
- one jitted train step ``(variables, opt_state, x, y, rng) -> ...`` with
  donated buffers; bf16 compute / f32 params replaces AMP+GradScaler (no
  scaler needed on TPU),
- the host loader runs ahead (threaded prefetch) and per-iteration scalars
  stay on device, flushed to the logger in batches so logging never blocks
  the device pipeline (hard part #9),
- LR plateau scheduling mutates an optax ``inject_hyperparams`` scalar, so no
  recompile on LR change.
"""

import contextlib
import json
import os
import time
import warnings
from datetime import datetime
from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization as flax_serialization
from tqdm import tqdm

from ..models.base import Model
from .optimizers import OptimizerSpec, ReduceLROnPlateau, get_learning_rate
from .serialization import deserialize_value, serialize_value, serialize_value_or_pickle
from .tensorboard_logger import TensorboardLogger


def _resolve_device(device):
    if device is None:
        return jax.devices()[0]
    if isinstance(device, str):
        if device in ("cuda", "gpu"):  # torch-API affordance
            device = "tpu"
        try:
            return jax.devices(device)[0]
        except RuntimeError:
            return jax.devices()[0]
    return device


class DefaultTrainer:
    """Trainer for a segmentation network (reference default_trainer.py:24).

    Args:
        name: The name of the checkpoint that will be created by the trainer.
        train_loader: The data loader containing the training data.
        val_loader: The data loader containing the validation data.
        model: The model to train (a torch_em_tpu ``Model``).
        loss: The loss function for training (callable on jnp arrays).
        optimizer: An ``OptimizerSpec`` (serializable optax factory).
        metric: The metric for validation (callable; lower = better).
        device: jax device (or "cpu"/"tpu") for training.
        lr_scheduler: ``ReduceLROnPlateau`` instance or None.
        log_image_interval: Frequency (iterations) for image logging.
        mixed_precision: Whether to compute in bfloat16 (params stay f32).
        early_stopping: Epochs without improvement before stopping.
        logger: The logger class.
        logger_kwargs: Keyword arguments for the logger class.
        id_: Unique identifier for the trainer.
        save_root: Alternative root folder for checkpoints/logs.
        compile_model: Accepted for API parity (jit is always on).
        rank: Rank for distributed training (only rank 0 writes checkpoints).
    """

    def __init__(
        self,
        name: Optional[str],
        train_loader=None,
        val_loader=None,
        model: Optional[Model] = None,
        loss=None,
        optimizer: Optional[OptimizerSpec] = None,
        metric=None,
        device=None,
        lr_scheduler: Optional[ReduceLROnPlateau] = None,
        log_image_interval: int = 100,
        mixed_precision: bool = True,
        early_stopping: Optional[int] = None,
        logger=TensorboardLogger,
        logger_kwargs: Optional[Dict[str, Any]] = None,
        id_: Optional[str] = None,
        save_root: Optional[str] = None,
        compile_model: Optional[Union[bool, str]] = None,
        rank: Optional[int] = None,
        seed: int = 42,
        device_label_transform=None,
        steps_per_execution: int = 1,
    ):
        from .wandb_logger import WandbLogger

        if name is None and not (logger is not None and issubclass(logger, WandbLogger)):
            raise TypeError("Name cannot be None if not using the WandbLogger")

        self._generate_name = name is None
        self.name = name
        self.id_ = id_ or name
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.model = model
        self.loss = loss
        self.optimizer = optimizer if isinstance(optimizer, OptimizerSpec) or optimizer is None \
            else optimizer
        self.metric = metric
        self.device = _resolve_device(device)
        self.lr_scheduler = lr_scheduler
        self.log_image_interval = log_image_interval
        self.save_root = save_root
        self.compile_model = compile_model
        self.rank = rank
        self.seed = seed
        # jittable batched label transform applied to y INSIDE the train/val
        # steps (e.g. ops.device.DeviceAffinityTransform): the loader ships
        # raw labels and the device derives the targets — removes GIL-bound
        # host label transforms from the data path (SURVEY hard part #2)
        self.device_label_transform = device_label_transform
        # multi-step execution: stage k batches and run ONE jitted lax.scan
        # over them (the `steps_per_execution` pattern).  Eliminates the
        # per-step host dispatch gap (~1.5 ms/step through the device tunnel);
        # image logging coarsens to chunk boundaries (the last sub-step's
        # prediction is logged).  k=1 keeps the classic per-batch dispatch.
        self.steps_per_execution = max(1, int(steps_per_execution))

        self._iteration = 0
        self._epoch = 0
        self._best_epoch = 0

        self.mixed_precision = mixed_precision
        self.early_stopping = early_stopping
        self.train_time = 0.0
        self._step_flops = None

        self.logger_class = logger
        self.logger_kwargs = logger_kwargs
        self.logger = None

        # jax state
        self.variables = None
        self.opt_state = None
        self._tx = None
        self._train_step = None
        self._val_step = None
        self._rng = jax.random.PRNGKey(seed)

        self._explicit_init_kwargs = {
            "name": name, "train_loader": train_loader, "val_loader": val_loader, "model": model,
            "loss": loss, "optimizer": self.optimizer, "metric": metric,
            "device": None if device is None else str(device),
            "lr_scheduler": lr_scheduler, "log_image_interval": log_image_interval,
            "mixed_precision": mixed_precision, "early_stopping": early_stopping,
            "logger": logger, "logger_kwargs": logger_kwargs, "id_": id_, "save_root": save_root,
            "compile_model": compile_model, "seed": seed,
            "device_label_transform": device_label_transform,
            "steps_per_execution": steps_per_execution,
        }
        # subclasses with **kwargs must populate self._kwargs (reference :483-491)
        self._kwargs = getattr(self, "_kwargs", {})

    # ------------------------------------------------------------------ misc
    @property
    def checkpoint_folder(self):
        assert self.id_ is not None
        save_root = getattr(self, "save_root", None)
        return os.path.join("./checkpoints", self.id_) if save_root is None else \
            os.path.join(save_root, "checkpoints", self.id_)

    @property
    def iteration(self):
        return self._iteration

    @property
    def epoch(self):
        return self._epoch

    # ------------------------------------------------------- jitted stepping
    def _module_for_compute(self):
        module = self.model.module
        if self.mixed_precision and hasattr(module, "dtype"):
            module = module.clone(dtype=jnp.bfloat16)
        return module

    def _compute_loss(self, module, variables, x, y, rng, train=True):
        if self.device_label_transform is not None:
            y = self.device_label_transform(y)
        state = {k: v for k, v in variables.items() if k != "params"}
        mutable = list(state.keys()) if (train and state) else False
        rngs = {"dropout": rng} if rng is not None else None
        out = module.apply(variables, x, train=train, rngs=rngs, mutable=mutable)
        if mutable:
            pred, new_state = out
        else:
            pred, new_state = out, state
        if getattr(self.loss, "needs_rng", False):
            loss = self.loss(pred, y, rng=rng if rng is not None else jax.random.PRNGKey(0))
        else:
            loss = self.loss(pred, y)
        return loss, (pred, new_state)

    def _build_steps(self):
        module = self._module_for_compute()
        tx = self._tx

        def train_step(variables, opt_state, x, y, rng):
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                return self._compute_loss(module, {"params": p, **state}, x, y, rng, train=True)

            (loss, (pred, new_state)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = self._reduce_grads(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return {"params": params, **new_state}, opt_state, loss, pred

        def val_step(variables, x, y):
            loss, (pred, _) = self._compute_loss(module, variables, x, y, None, train=False)
            if self.metric is not None and not getattr(self.metric, "host_metric", False):
                yt = y if self.device_label_transform is None else self.device_label_transform(y)
                metric = self.metric(pred, yt)
            else:
                metric = loss
            return loss, metric, pred

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._val_step = jax.jit(val_step)

        if self.steps_per_execution > 1:
            def scan_steps(variables, opt_state, xs, ys, rngs):
                # first sub-step unrolled so the carried prediction buffer has
                # a concrete shape without stacking k predictions in HBM
                variables, opt_state, loss0, pred = train_step(
                    variables, opt_state, xs[0], ys[0], rngs[0])

                def body(carry, batch):
                    v, o, _ = carry
                    xb, yb, rb = batch
                    v, o, loss_b, pred_b = train_step(v, o, xb, yb, rb)
                    return (v, o, pred_b), loss_b

                (variables, opt_state, pred), losses = jax.lax.scan(
                    body, (variables, opt_state, pred),
                    (xs[1:], ys[1:], rngs[1:]))
                losses = jnp.concatenate([loss0[None], losses])
                return variables, opt_state, losses, pred

            self._scan_step = jax.jit(scan_steps, donate_argnums=(0, 1))
        else:
            self._scan_step = None

    def _reduce_grads(self, grads):
        """Hook for data-parallel gradient reduction (overridden by DP training)."""
        return grads

    # ----------------------------------------------------------- init & fit
    def _initialize(self, iterations, load_from_checkpoint, epochs=None):
        assert self.train_loader is not None
        assert self.val_loader is not None
        assert self.model is not None
        assert self.loss is not None
        assert self.metric is not None
        if sum((iterations is not None, epochs is not None)) != 1:
            raise ValueError("Exactly one of 'iterations' or 'epochs' has to be specified.")

        if load_from_checkpoint is not None:
            self.load_checkpoint(load_from_checkpoint)

        if iterations is None:
            epochs_ = epochs
            iterations = epochs_ * len(self.train_loader)
        else:
            epochs_ = int(np.ceil(iterations / len(self.train_loader)))
        self.max_iteration = self._iteration + iterations
        self.max_epoch = self._epoch + epochs_

        if self.optimizer is None:
            self.optimizer = OptimizerSpec("adamw", lr=1e-4)
        if self._tx is None:
            self._tx = self.optimizer.build()

        # move model variables to the training device
        if self.model.variables is None:
            self.model.initialize()
        if self.variables is None:
            self.variables = jax.device_put(self.model.variables, self.device)
        if self.opt_state is None:
            self.opt_state = jax.device_put(self._tx.init(self.variables["params"]), self.device)

        if self.lr_scheduler is not None:
            self.lr_scheduler.attach(self)

        self._build_steps()

        if self.logger is None and self.logger_class is not None:
            logger_kwargs = self.logger_kwargs or {}
            self.logger = self.logger_class(self, self.save_root, **logger_kwargs)
        if self.id_ is None:
            self.id_ = self.name

        os.makedirs(self.checkpoint_folder, exist_ok=True)

        best_metric = np.inf
        return best_metric

    # ------------------------------------------------------------- chkpting
    def _checkpoint_path(self, name):
        return os.path.join(self.checkpoint_folder, f"{name}.ckpt")

    def _build_init(self) -> Dict[str, Any]:
        kwargs = dict(self._explicit_init_kwargs)
        kwargs.update(self._kwargs)
        init = {}
        for k, v in kwargs.items():
            if k in ("logger",):
                init[k] = None if v is None else serialize_value(v)
                continue
            try:
                init[k] = serialize_value_or_pickle(v)
            except ValueError as e:
                warnings.warn(f"Could not serialize trainer kwarg {k}: {e}")
                init[k] = None
        return {"trainer_class": f"{type(self).__module__}.{type(self).__name__}", "kwargs": init}

    def save_checkpoint(self, name, current_metric, best_metric, train_time=0.0, **extra_save_dict):
        """Persist model/optimizer state + bookkeeping + constructor manifest
        (reference default_trainer.py:570)."""
        if self.rank not in (None, 0):
            return
        save_dict = {
            "iteration": self._iteration,
            "epoch": self._epoch,
            "best_epoch": self._best_epoch,
            "best_metric": float(best_metric),
            "current_metric": float(current_metric),
            "train_time": float(train_time),
            "timestamp": datetime.now().strftime("%d-%m-%Y (%H:%M:%S)"),
            "model_state": flax_serialization.to_state_dict(jax.device_get(self.variables)),
            # optimizer state is an optax NamedTuple tree; store its leaves and
            # restore by unflattening a freshly initialized state
            "optimizer_state": [
                np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(jax.device_get(self.opt_state))
            ],
            "init": json.dumps(self._build_init()),
        }
        if self.lr_scheduler is not None:
            save_dict["scheduler_state"] = self.lr_scheduler.state_dict()
        save_dict.update(extra_save_dict)
        blob = flax_serialization.msgpack_serialize(save_dict)
        path = self._checkpoint_path(name)
        with open(path, "wb") as f:
            f.write(blob)

    @staticmethod
    def _load_save_dict(path):
        if os.path.isdir(path):
            raise ValueError(f"Expected a checkpoint file, got directory {path}")
        if not path.endswith(".ckpt") and not os.path.exists(path):
            path = path + ".ckpt"
        with open(path, "rb") as f:
            return flax_serialization.msgpack_restore(f.read())

    def load_checkpoint(self, checkpoint="best"):
        """Load a checkpoint into this trainer (reference default_trainer.py:597)."""
        if checkpoint in ("best", "latest") or not os.path.exists(str(checkpoint)):
            path = self._checkpoint_path(checkpoint)
        else:
            path = str(checkpoint)
        if not os.path.exists(path):
            raise ValueError(f"Checkpoint {path} does not exist.")
        save_dict = self._load_save_dict(path)

        self._iteration = int(save_dict["iteration"])
        self._epoch = int(save_dict["epoch"])
        self._best_epoch = int(save_dict["best_epoch"])
        self.best_metric = float(save_dict["best_metric"])
        self.current_metric = float(save_dict["current_metric"])
        self.train_time = float(save_dict.get("train_time", 0.0))

        if self.model.variables is None:
            self.model.initialize()
        variables = flax_serialization.from_state_dict(
            jax.device_get(self.model.variables), save_dict["model_state"]
        )
        self.variables = jax.device_put(variables, self.device)
        self.model.replace_variables(jax.device_get(self.variables))

        if self.optimizer is None:
            self.optimizer = OptimizerSpec("adamw", lr=1e-4)
        self._tx = self.optimizer.build()
        fresh_opt = self._tx.init(self.variables["params"])
        flat, treedef = jax.tree_util.tree_flatten(fresh_opt)
        saved_leaves = save_dict["optimizer_state"]
        if len(saved_leaves) == len(flat):
            restored = [
                np.asarray(s, dtype=getattr(f, "dtype", None)).reshape(np.shape(f))
                for s, f in zip(saved_leaves, flat)
            ]
            self.opt_state = jax.device_put(jax.tree_util.tree_unflatten(treedef, restored), self.device)
        else:
            warnings.warn("Optimizer state in checkpoint does not match; reinitializing optimizer.")
            self.opt_state = jax.device_put(fresh_opt, self.device)

        if self.lr_scheduler is not None and "scheduler_state" in save_dict:
            self.lr_scheduler.load_state_dict(save_dict["scheduler_state"])
        return save_dict

    @classmethod
    def from_checkpoint(cls, checkpoint_folder, name="best", device=None):
        """Rebuild a fully functional trainer from a checkpoint alone
        (reference default_trainer.py:282)."""
        path = os.path.join(checkpoint_folder, f"{name}.ckpt")
        save_dict = cls._load_save_dict(path)
        init = json.loads(save_dict["init"])
        from .serialization import resolve_path

        trainer_cls = resolve_path(init["trainer_class"])
        kwargs = {k: deserialize_value(v) for k, v in init["kwargs"].items()}
        if device is not None:
            kwargs["device"] = device
        save_root = kwargs.get("save_root")
        expected_folder = os.path.join("./checkpoints" if save_root is None else
                                       os.path.join(save_root, "checkpoints"), kwargs.get("id_") or kwargs["name"])
        trainer = trainer_cls(**kwargs)
        # point the trainer at the folder we actually loaded from
        trainer.id_ = kwargs.get("id_") or kwargs["name"]
        if os.path.abspath(expected_folder) != os.path.abspath(checkpoint_folder):
            trainer.save_root = os.path.dirname(os.path.dirname(os.path.abspath(checkpoint_folder)))
            trainer.id_ = os.path.basename(os.path.abspath(checkpoint_folder))
        trainer.load_checkpoint(path)
        return trainer

    def _verify_if_training_completed(self, checkpoint="latest"):
        ckpt_path = self._checkpoint_path(checkpoint)
        if not os.path.exists(ckpt_path):
            return False
        save_dict = self._load_save_dict(ckpt_path)
        return int(save_dict["iteration"]) >= getattr(self, "max_iteration", np.inf)

    # ------------------------------------------------------------- training
    def _to_device(self, batch):
        return jax.device_put(np.asarray(batch), self.device)

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _train_epoch(self, progress, profile_dir=None, log_mfu=False):
        n_iter = 0
        t_per_iter = time.time()
        scalar_buffer = []
        tracing = False

        def flush():
            if self.logger is None:
                scalar_buffer.clear()
                return
            for step, loss_dev, lr, images in scalar_buffer:
                x_, y_, pred_ = images if images is not None else (None, None, None)
                self.logger.log_train(step, np.asarray(loss_dev), lr, x_, y_, pred_)
            scalar_buffer.clear()

        lr = get_learning_rate(self.opt_state)
        # subclasses overriding _build_steps may not build a scan step; they
        # silently run per-batch in that case
        if self.steps_per_execution > 1 and getattr(self, "_scan_step", None) is not None:
            return self._train_epoch_scan(
                progress, lr, scalar_buffer, flush, log_mfu, profile_dir)
        for x, y in self.train_loader:
            x = self._to_device(x)
            y = self._to_device(y)
            if profile_dir is not None:
                # capture a jax.profiler trace of steps [3, 8) (post-compile)
                if n_iter == 3 and not tracing:
                    jax.profiler.start_trace(profile_dir)
                    tracing = True
                elif n_iter == 8 and tracing:
                    jax.block_until_ready(self.variables)
                    jax.profiler.stop_trace()
                    tracing = False
            if log_mfu and self._step_flops is None and n_iter == 0:
                from ..utils.profiling import estimate_step_flops

                self._step_flops = estimate_step_flops(
                    self._train_step, self.variables, self.opt_state, x, y, self._next_rng()
                ) or 0.0
            self.variables, self.opt_state, loss, pred = self._train_step(
                self.variables, self.opt_state, x, y, self._next_rng()
            )
            want_images = (self._iteration % self.log_image_interval) == 0
            scalar_buffer.append(
                (self._iteration, loss, lr, (x, y, pred) if want_images else None)
            )
            if len(scalar_buffer) >= 50 or want_images:
                flush()

            self._iteration += 1
            n_iter += 1
            if progress is not None:
                progress.update(1)
            if self._iteration >= self.max_iteration:
                break
        flush()
        if tracing:
            jax.block_until_ready(self.variables)
            jax.profiler.stop_trace()

        t_per_iter = (time.time() - t_per_iter) / max(n_iter, 1)
        if log_mfu and self._step_flops:
            self._print_mfu(t_per_iter)
        return t_per_iter

    def _train_epoch_scan(self, progress, lr, scalar_buffer, flush, log_mfu,
                          profile_dir=None):
        """Multi-step execution: consume the loader in chunks of
        ``steps_per_execution`` and run each chunk as one jitted lax.scan
        dispatch.  Short tails (epoch end / max_iteration boundary) fall back
        to per-batch dispatch so iteration counts stay exact.  With
        ``profile_dir`` the second chunk (post-compile) is traced."""
        k = self.steps_per_execution
        n_iter = 0
        chunk_idx = 0
        tracing = False
        t_per_iter = time.time()
        loader_it = iter(self.train_loader)
        exhausted = False
        while not exhausted and self._iteration < self.max_iteration:
            if profile_dir is not None:
                if chunk_idx == 1 and not tracing:
                    jax.block_until_ready(self.variables)
                    jax.profiler.start_trace(profile_dir)
                    tracing = True
                elif chunk_idx == 2 and tracing:
                    jax.block_until_ready(self.variables)
                    jax.profiler.stop_trace()
                    tracing = False
            chunk_idx += 1
            batches = []
            budget = min(k, self.max_iteration - self._iteration)
            while len(batches) < budget:
                try:
                    batches.append(next(loader_it))
                except StopIteration:
                    exhausted = True
                    break
            if not batches:
                break

            if len(batches) == k:
                xs = self._to_device(np.stack([np.asarray(b[0]) for b in batches]))
                ys = self._to_device(np.stack([np.asarray(b[1]) for b in batches]))
                rngs = jnp.stack([self._next_rng() for _ in range(k)])
                if log_mfu and self._step_flops is None:
                    from ..utils.profiling import estimate_step_flops

                    self._step_flops = estimate_step_flops(
                        self._train_step, self.variables, self.opt_state,
                        xs[0], ys[0], rngs[0]
                    ) or 0.0
                self.variables, self.opt_state, losses, pred = self._scan_step(
                    self.variables, self.opt_state, xs, ys, rngs
                )
                want_images = any(
                    (self._iteration + j) % self.log_image_interval == 0 for j in range(k)
                )
                for j in range(k):
                    scalar_buffer.append((self._iteration + j, losses[j], lr, None))
                if want_images:
                    xb, yb = batches[-1]
                    scalar_buffer[-1] = (
                        self._iteration + k - 1, losses[k - 1], lr,
                        (np.asarray(xb), np.asarray(yb), pred),
                    )
                self._iteration += k
                n_iter += k
                if progress is not None:
                    progress.update(k)
            else:
                for xb, yb in batches:
                    xb = self._to_device(xb)
                    yb = self._to_device(yb)
                    self.variables, self.opt_state, loss, pred = self._train_step(
                        self.variables, self.opt_state, xb, yb, self._next_rng()
                    )
                    want_images = (self._iteration % self.log_image_interval) == 0
                    scalar_buffer.append(
                        (self._iteration, loss, lr, (xb, yb, pred) if want_images else None)
                    )
                    self._iteration += 1
                    n_iter += 1
                    if progress is not None:
                        progress.update(1)
                    if self._iteration >= self.max_iteration:
                        break
            if len(scalar_buffer) >= 50:
                flush()
        flush()
        if tracing:
            jax.block_until_ready(self.variables)
            jax.profiler.stop_trace()

        t_per_iter = (time.time() - t_per_iter) / max(n_iter, 1)
        if log_mfu and self._step_flops:
            self._print_mfu(t_per_iter)
        return t_per_iter

    def _print_mfu(self, t_per_iter):
        from ..utils.profiling import mfu

        util = mfu(self._step_flops, t_per_iter, self.device)
        if util is not None:
            print(f"train step: {self._step_flops / 1e9:.1f} GFLOP, "
                  f"{t_per_iter:.4f} s/it, MFU {100 * util:.1f}%")

    def _validate(self):
        metric_list, loss_list = [], []
        last = None
        for x, y in self.val_loader:
            x = self._to_device(x)
            y = self._to_device(y)
            loss, metric, pred = self._val_step(self.variables, x, y)
            if self.metric is not None and getattr(self.metric, "host_metric", False):
                metric = self.metric(np.asarray(pred), np.asarray(y))
            metric_list.append(metric)
            loss_list.append(loss)
            last = (x, y, pred)
        metric_val = float(np.mean([np.asarray(m) for m in metric_list]))
        loss_val = float(np.mean([np.asarray(l) for l in loss_list]))
        if self.logger is not None and last is not None:
            self.logger.log_validation(self._iteration, metric_val, loss_val, *last)
        return metric_val

    def fit(
        self,
        iterations: Optional[int] = None,
        load_from_checkpoint: Optional[str] = None,
        epochs: Optional[int] = None,
        save_every_kth_epoch: Optional[int] = None,
        progress=None,
        overwrite_training: bool = True,
        profile_dir: Optional[str] = None,
        log_mfu: bool = False,
    ):
        """Run training (reference default_trainer.py:643); exactly one of
        'iterations' or 'epochs' must be given.

        ``profile_dir`` captures a jax.profiler trace of a few post-compile
        steps of each epoch; ``log_mfu`` prints step FLOPs / measured MFU
        (SURVEY §5.1 counters)."""
        best_metric = self._initialize(iterations, load_from_checkpoint, epochs)

        if not overwrite_training:
            if load_from_checkpoint is not None:
                raise ValueError(
                    "We do not support 'overwrite_training=False' and 'load_from_checkpoint' at the same time."
                )
            if self._verify_if_training_completed():
                print(
                    f"The model is trained for {self.max_iteration} iterations / {self.max_epoch} epochs "
                    "and 'overwrite_training' is set to 'False'."
                )
                return

        print(
            "Start fitting for", self.max_iteration - self._iteration,
            "iterations /", self.max_epoch - self._epoch, "epochs",
        )
        print("with", len(self.train_loader), "iterations per epoch")

        total_iterations = epochs * len(self.train_loader) if iterations is None else iterations
        own_progress = progress is None
        if own_progress:
            progress = tqdm(total=total_iterations, desc=f"Epoch {self._epoch}", leave=True)

        msg = "Epoch %i: average [s/it]: %f, current metric: %f, best metric: %f"
        current_metric = np.inf
        train_time_start = time.time()

        while self._epoch < self.max_epoch and self._iteration < self.max_iteration:
            self.train_loader.set_epoch(self._epoch)
            t_per_iter = self._train_epoch(progress, profile_dir=profile_dir, log_mfu=log_mfu)
            current_metric = self._validate()
            self.current_metric = current_metric

            if self.lr_scheduler is not None:
                self.lr_scheduler.step(current_metric)

            total_train_time = (time.time() - train_time_start) + self.train_time
            if current_metric < best_metric:
                best_metric = current_metric
                self._best_epoch = self._epoch
                self.save_checkpoint("best", current_metric, best_metric, train_time=total_train_time)

            self.save_checkpoint("latest", current_metric, best_metric, train_time=total_train_time)
            if save_every_kth_epoch is not None and (self._epoch + 1) % save_every_kth_epoch == 0:
                self.save_checkpoint(
                    f"epoch-{self._epoch + 1}", current_metric, best_metric, train_time=total_train_time
                )

            if self.early_stopping is not None:
                epochs_since_best = self._epoch - self._best_epoch
                if epochs_since_best > self.early_stopping:
                    print("Stopping training because there has been no improvement for",
                          self.early_stopping, "epochs")
                    break

            self._epoch += 1
            progress.set_description(
                msg % (self._epoch, t_per_iter, current_metric, best_metric), refresh=True
            )

        if own_progress:
            progress.close()
        print(f"Finished training after {self._epoch} epochs / {self._iteration} iterations.")
        print(f"The best epoch is number {self._best_epoch}.")

        # sync final params back to the model wrapper
        self.model.replace_variables(jax.device_get(self.variables))

        if self._generate_name:
            self.name = None
        if self.logger is not None and hasattr(self.logger, "get_wandb"):
            self.logger.get_wandb().finish()
