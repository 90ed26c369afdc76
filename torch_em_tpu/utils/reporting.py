"""Training summary reports (reference torch_em/util/reporting.py)."""

from typing import Optional

__all__ = ["get_training_summary"]


def _get_n_images(loader) -> str:
    dataset = loader.dataset
    if hasattr(dataset, "datasets"):
        return str(sum(_count(ds) for ds in dataset.datasets))
    return str(_count(dataset))


def _count(ds):
    if hasattr(ds, "raw_images"):
        return len(ds.raw_images)
    return 1


def _get_training_summary(trainer, lr):
    n_iterations = trainer.iteration
    batches_per_iter = trainer.train_loader.batch_size
    loss = trainer.loss
    loss_name = type(loss).__name__
    return {
        "n_iterations": n_iterations,
        "batch_size": batches_per_iter,
        "loss": loss_name,
        "optimizer": getattr(trainer.optimizer, "name", "adamw"),
        "learning_rate": lr,
        "n_train_images": _get_n_images(trainer.train_loader),
        "n_val_images": _get_n_images(trainer.val_loader),
    }


def get_training_summary(trainer, lr: Optional[float] = None, to_md: bool = False,
                         lower_case: bool = False):
    """Markdown (or dict) summary of a training run (reference reporting.py:54)."""
    if lr is None:
        try:
            from ..trainer.optimizers import get_learning_rate

            lr = get_learning_rate(trainer.opt_state)
        except Exception:
            lr = getattr(trainer.optimizer, "lr", None)
    summary = _get_training_summary(trainer, lr)
    if lower_case:
        summary = {k.lower(): v for k, v in summary.items()}
    if not to_md:
        return summary
    lines = ["# Training Summary", ""]
    for k, v in summary.items():
        lines.append(f"- **{k}**: {v}")
    return "\n".join(lines)
