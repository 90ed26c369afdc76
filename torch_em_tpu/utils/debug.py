"""Debug viewers for loaders and trainers (reference torch_em/util/debug.py).

``check_loader`` (:154) / ``check_trainer`` (:119) visualize samples (and
optionally predictions) via matplotlib (napari is not available in this
environment; the napari code path is import-guarded like the reference's).
"""

from typing import Optional

import numpy as np

__all__ = ["check_loader", "check_trainer"]


def _to_2d(im):
    im = np.asarray(im)
    while im.ndim > 2:
        im = im[im.shape[0] // 2]
    return im


def _check_plt(loader, n_samples, instance_labels, model=None, save_path=None):
    """Matplotlib sample viewer (reference debug.py:11)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img_size = 5
    fig_paths = []
    for ii, sample in enumerate(loader):
        if ii >= n_samples:
            break
        x, y = sample if isinstance(sample, (tuple, list)) else (sample, None)
        n_cols = 2 + int(y is not None) + int(model is not None)
        fig, ax = plt.subplots(1, n_cols, figsize=(n_cols * img_size, img_size))
        raw = _to_2d(x[0])
        ax[0].set_title("raw")
        ax[0].imshow(raw, cmap="gray")
        col = 1
        if y is not None:
            target = _to_2d(y[0])
            ax[col].set_title("target")
            if instance_labels:
                from .util import get_random_colors

                ax[col].imshow(target, cmap=get_random_colors(target), interpolation="nearest")
            else:
                ax[col].imshow(target)
            col += 1
        if model is not None:
            pred = np.asarray(model(np.asarray(x)))
            ax[col].set_title("prediction")
            ax[col].imshow(_to_2d(pred[0]))
            col += 1
        ax[-1].set_title("histogram")
        ax[-1].hist(np.asarray(x).ravel(), bins=32)
        if save_path is not None:
            path = f"{save_path}_sample{ii}.png"
            fig.savefig(path)
            fig_paths.append(path)
        plt.close(fig)
    return fig_paths


def check_trainer(trainer, n_samples: int = 4, instance_labels: bool = False,
                  split: str = "val", loader: Optional[object] = None, plt: bool = True,
                  save_path: Optional[str] = None):
    """Check a trainer by visualizing predictions on its loader
    (reference debug.py:119)."""
    if loader is None:
        loader = trainer.val_loader if split == "val" else trainer.train_loader
    model = trainer.model
    return _check_plt(loader, n_samples, instance_labels, model=model, save_path=save_path)


def check_loader(loader, n_samples: int = 4, instance_labels: bool = False, plt: bool = True,
                 save_path: Optional[str] = None):
    """Check a data loader by visualizing samples (reference debug.py:154)."""
    return _check_plt(loader, n_samples, instance_labels, save_path=save_path)
