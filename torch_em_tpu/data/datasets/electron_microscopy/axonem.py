"""AxonEM dataset: axon instance segmentation in human / mouse cortex EM
(reference torch_em/data/datasets/electron_microscopy/axonem.py).

Used for the AxonEM challenge (https://axonem.grand-challenge.org/);
publication: https://arxiv.org/abs/2107.05451
"""

import os
from glob import glob
from typing import List, Sequence, Tuple, Union

from ... import DataLoader
from ....segmentation import default_segmentation_dataset, get_data_loader
from .. import util

URLS = {
    "human": "https://huggingface.co/datasets/pytc/AxonEM/resolve/main/EM30-H-train-9vol-pad-20-512-512.zip",
    "mouse": "https://huggingface.co/datasets/pytc/AxonEM/resolve/main/EM30-M-train-9vol-pad-20-512-512.zip",
}
CHECKSUMS = {
    "human": "0b53d155ff62f5e24c552bf90adce329fcf9a8fefd5c697f8bcd0312a61fda60",
    "mouse": "dae06b5dabe388ab7a0ff4e51548174f041a338d0d06bd665586aa7fdd43bac2",
}


def get_axonem_data(path: Union[os.PathLike, str], samples: Sequence[str],
                    download: bool = False) -> str:
    """Download the AxonEM training data for the given samples
    ('human' and/or 'mouse')."""
    if isinstance(samples, str):
        samples = [samples]
    os.makedirs(path, exist_ok=True)
    for sample in samples:
        assert sample in URLS, f"Invalid AxonEM sample: {sample}"
        sample_folder = os.path.join(path, sample)
        if os.path.exists(sample_folder):
            continue
        zip_path = os.path.join(path, f"{sample}.zip")
        util.download_source(zip_path, URLS[sample], download, CHECKSUMS[sample])
        util.unzip(zip_path, sample_folder)
    return path


def get_axonem_paths(path: Union[os.PathLike, str], samples: Sequence[str],
                     download: bool = False) -> Tuple[List[str], List[str]]:
    """Get paths to the AxonEM image and label volumes."""
    if isinstance(samples, str):
        samples = [samples]
    get_axonem_data(path, samples, download)
    image_paths, label_paths = [], []
    for sample in samples:
        curr_images = sorted(glob(os.path.join(path, sample, "im_*.h5")))
        image_paths.extend(curr_images)
        label_paths.extend([p.replace("im_", "seg_") for p in curr_images])
    return image_paths, label_paths


def get_axonem_dataset(path: Union[os.PathLike, str], patch_shape: Tuple[int, int, int],
                       samples: Sequence[str] = ("human", "mouse"),
                       download: bool = False, **kwargs):
    """Get the AxonEM dataset for axon instance segmentation."""
    image_paths, label_paths = get_axonem_paths(path, samples, download)
    kwargs = util.ensure_transforms(ndim=3, **kwargs)
    return default_segmentation_dataset(image_paths, "main", label_paths, "main",
                                        patch_shape, **kwargs)


def get_axonem_loader(path: Union[os.PathLike, str], patch_shape: Tuple[int, int, int],
                      batch_size: int, samples: Sequence[str] = ("human", "mouse"),
                      download: bool = False, **kwargs) -> DataLoader:
    """Get the AxonEM data loader."""
    ds_kwargs, loader_kwargs = util.split_kwargs(default_segmentation_dataset, **kwargs)
    ds = get_axonem_dataset(path, patch_shape, samples=samples, download=download, **ds_kwargs)
    return get_data_loader(ds, batch_size=batch_size, **loader_kwargs)
