"""AxonDeepSeg datasets: axon and myelin segmentation in SEM and TEM
(reference torch_em/data/datasets/electron_microscopy/axondeepseg.py).

Publication: https://doi.org/10.1038/s41598-018-22181-4
"""

import os
from glob import glob
from shutil import rmtree
from typing import List, Union

import numpy as np

from ... import DataLoader
from ....segmentation import default_segmentation_dataset, get_data_loader
from ....utils.io import load_image
from .. import util

URLS = {
    "sem": "https://github.com/axondeepseg/data_axondeepseg_sem/archive/refs/heads/master.zip",
    "tem": "https://osf.io/download/uewd9",
}
CHECKSUMS = {
    "sem": "12f2f03834c41720badf00131bb7b7a2127e532cf78e01fbea398e1ff800779b",
    "tem": "e4657280808f3b80d3bf1fba87d1cbbf2455f519baf1a7b16d2ddf2e54739a95",
}


def _preprocess_sem_data(out_path):
    import h5py

    data_root = os.path.join(out_path, "data_axondeepseg_sem-master")
    assert os.path.exists(data_root)
    raw_paths = []
    for folder in sorted(glob(os.path.join(data_root, "sub-rat*"))):
        raw_paths.extend(sorted(glob(os.path.join(folder, "micr", "*.png"))))
    label_paths = []
    for folder in sorted(glob(os.path.join(data_root, "derivatives", "labels", "sub-rat*"))):
        label_paths.extend(sorted(glob(os.path.join(folder, "micr", "*axonmyelin-manual.png"))))
    assert len(raw_paths) == len(label_paths)
    for i, (rp, lp) in enumerate(zip(raw_paths, label_paths)):
        with h5py.File(os.path.join(out_path, f"sem_data_{i}.h5"), "w") as f:
            raw = np.asarray(load_image(rp))
            if raw.ndim == 3:
                raw = raw[..., 0]
            raw = 255 - raw  # invert so axons appear bright like the TEM data
            f.create_dataset("raw", data=raw, compression="gzip")
            labels = np.asarray(load_image(lp))
            if labels.ndim == 3:
                labels = labels[..., 0]
            new_labels = np.zeros_like(labels)
            new_labels[(labels == 127) | (labels == 128)] = 1  # myelin
            new_labels[labels == 255] = 2                      # axon
            f.create_dataset("labels", data=new_labels, compression="gzip")
    rmtree(data_root)


def _preprocess_tem_data(out_path):
    import h5py

    data_root = os.path.join(out_path, "TEM_dataset")
    folders = [os.path.join(data_root, f) for f in os.listdir(data_root)
               if os.path.isdir(os.path.join(data_root, f))]
    for i, folder in enumerate(folders):
        with h5py.File(os.path.join(out_path, f"tem_{i}.h5"), "w") as f:
            f.create_dataset("raw", data=np.asarray(load_image(os.path.join(folder, "image.png"))),
                             compression="gzip")
            labels = np.asarray(load_image(os.path.join(folder, "mask.png")))
            new_labels = np.zeros_like(labels)
            new_labels[labels == 128] = 1
            new_labels[labels == 255] = 2
            f.create_dataset("labels", data=new_labels, compression="gzip")
    rmtree(data_root)


def get_axondeepseg_data(path: Union[str, os.PathLike], name: str,
                         download: bool = False) -> str:
    """Download the AxonDeepSeg data ('sem' / 'tem')."""
    assert name in URLS, f"Invalid name: {name}"
    out_path = os.path.join(path, name)
    if os.path.exists(out_path) and glob(os.path.join(out_path, "*.h5")):
        return out_path
    os.makedirs(out_path, exist_ok=True)
    zip_path = os.path.join(path, f"{name}.zip")
    util.download_source(zip_path, URLS[name], download, CHECKSUMS[name])
    util.unzip(zip_path, out_path)
    if name == "sem":
        _preprocess_sem_data(out_path)
    else:
        _preprocess_tem_data(out_path)
    return out_path


def get_axondeepseg_paths(path: Union[str, os.PathLike], name: str,
                          download: bool = False) -> List[str]:
    """Get paths to the AxonDeepSeg volumes."""
    data_root = get_axondeepseg_data(path, name, download)
    paths = glob(os.path.join(data_root, "*.h5"))
    paths.sort()
    return paths


def get_axondeepseg_dataset(path: Union[str, os.PathLike], name: str, patch_shape,
                            download: bool = False, one_hot_encoding=False, **kwargs):
    """Get the AxonDeepSeg dataset for axon/myelin segmentation."""
    paths = get_axondeepseg_paths(path, name, download)
    kwargs = util.ensure_transforms(ndim=2, **kwargs)
    if one_hot_encoding:
        from ....transforms import OneHotTransform

        if isinstance(one_hot_encoding, bool):
            class_ids = [0, 1, 2]
        elif isinstance(one_hot_encoding, int):
            class_ids = list(range(one_hot_encoding))
        else:
            class_ids = list(one_hot_encoding)
        kwargs["label_transform"] = OneHotTransform(class_ids=class_ids)
    return default_segmentation_dataset(paths, "raw", paths, "labels", patch_shape,
                                        ndim=2, **kwargs)


def get_axondeepseg_loader(path: Union[str, os.PathLike], name: str, patch_shape,
                           batch_size: int, download: bool = False,
                           one_hot_encoding=False, **kwargs) -> DataLoader:
    """Get the AxonDeepSeg data loader."""
    ds_kwargs, loader_kwargs = util.split_kwargs(default_segmentation_dataset, **kwargs)
    ds = get_axondeepseg_dataset(path, name, patch_shape, download=download,
                                 one_hot_encoding=one_hot_encoding, **ds_kwargs)
    return get_data_loader(ds, batch_size=batch_size, **loader_kwargs)
