"""AimSeg dataset: myelinated axon segmentation in TEM
(reference torch_em/data/datasets/electron_microscopy/aimseg.py).

Located at https://zenodo.org/records/8351731;
publication: https://doi.org/10.1371/journal.pcbi.1010845
"""

import os
from glob import glob
from pathlib import Path
from typing import List, Optional, Tuple, Union

from ... import DataLoader
from ....segmentation import default_segmentation_dataset, get_data_loader
from .. import util

URLS = [
    "https://zenodo.org/records/8351731/files/Control_Dataset.rar",
    "https://zenodo.org/records/8351731/files/Validation_Dataset_v1.rar",
]
CHECKSUMS = [
    "ecd569a5f91166a09d93d29a10e2ddd2eaa3e82df531785b7aa243e426467673",
    "647216eb09a644be8980224a52d8168fa2fa5a1fd0537fb1e5d6102ec30e396d",
]


def get_aimseg_data(path: Union[os.PathLike, str], download: bool = False):
    """Download the AimSeg data (rar archives)."""
    for url, checksum in zip(URLS, CHECKSUMS):
        rarfname = url.rsplit("/")[-1]
        if os.path.exists(os.path.join(path, Path(rarfname).stem)):
            continue
        os.makedirs(path, exist_ok=True)
        util.download_source(os.path.join(path, rarfname), url, download, checksum)
        util.unzip_rarfile(os.path.join(path, rarfname), path)


def get_aimseg_paths(path: Union[os.PathLike, str], split: Optional[str] = None,
                     targets: str = "instances",
                     download: bool = False) -> Tuple[List[str], List[str]]:
    """Get paths to the AimSeg images and labels (split: 'control' /
    'validation' / None for both; targets: 'instances' / 'semantic')."""
    get_aimseg_data(path, download)
    if targets == "instances":
        dirname = "GroundTruth_Instance"
    elif targets == "semantic":
        dirname = "GroundTruth_Semantic"
    else:
        raise ValueError(f"'{targets}' is not a valid target choice.")
    if split and split not in ("control", "validation"):
        raise ValueError(f"'{split}' is not a valid split choice.")

    raw_paths, label_paths = [], []
    if split != "validation":
        raw_paths.extend(util.natsorted(glob(os.path.join(path, "Control_Dataset", "Images", "*.tif"))))
        label_paths.extend(util.natsorted(glob(os.path.join(path, "Control_Dataset", dirname, "*.tif"))))
    if split != "control":
        raw_paths.extend(util.natsorted(
            glob(os.path.join(path, "Validation_Dataset_v1", "Images", "*.tif"))))
        label_paths.extend(util.natsorted(
            glob(os.path.join(path, "Validation_Dataset_v1", dirname, "*.tif"))))
    assert raw_paths and len(raw_paths) == len(label_paths)
    return raw_paths, label_paths


def get_aimseg_dataset(path: Union[os.PathLike, str], patch_shape: Tuple[int, int],
                       split: Optional[str] = None, targets: str = "instances",
                       download: bool = False, **kwargs):
    """Get the AimSeg dataset for axon/myelin segmentation."""
    raw_paths, label_paths = get_aimseg_paths(path, split, targets, download)
    kwargs = util.ensure_transforms(ndim=2, **kwargs)
    return default_segmentation_dataset(raw_paths, None, label_paths, None, patch_shape,
                                        is_seg_dataset=False, ndim=2, **kwargs)


def get_aimseg_loader(path: Union[os.PathLike, str], patch_shape: Tuple[int, int],
                      batch_size: int, split: Optional[str] = None,
                      targets: str = "instances", download: bool = False,
                      **kwargs) -> DataLoader:
    """Get the AimSeg data loader."""
    ds_kwargs, loader_kwargs = util.split_kwargs(default_segmentation_dataset, **kwargs)
    ds = get_aimseg_dataset(path, patch_shape, split=split, targets=targets,
                            download=download, **ds_kwargs)
    return get_data_loader(ds, batch_size=batch_size, **loader_kwargs)
