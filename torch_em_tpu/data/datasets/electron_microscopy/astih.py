"""ASTIH dataset: axon and myelin segmentation across TEM/SEM/bright-field
microscopy, >60k manually segmented fibers (reference
torch_em/data/datasets/electron_microscopy/astih.py).

Described at https://axondeepseg.github.io/ASTIH/; publication
https://openreview.net/forum?id=ExBq9A8Ypk. Data is hosted on DANDI and
fetched via its REST API.
"""

import io
import os
from glob import glob
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from ... import DataLoader
from ....segmentation import default_segmentation_dataset, get_data_loader
from ....transforms.label import OneHotTransform
from .. import util

DANDI_API = "https://api.dandiarchive.org/api"

DATASETS = {
    "TEM1": {"dandi_id": "001436", "version": "0.250512.1625",
             "description": "TEM Images of Corpus Callosum in Control and Cuprizone-Intoxicated Mice",
             "test_subjects": ["sub-nyuMouse26"], "file_ext": "png"},
    "TEM2": {"dandi_id": "001350", "version": "0.250511.1527",
             "description": "TEM Images of Corpus Callosum in Flox/SRF-cKO Mice",
             "test_subjects": None,  # external test set
             "test_url": "https://github.com/axondeepseg/data_axondeepseg_srf_testing/archive/refs/tags/r20250513-neurips2025.zip",  # noqa
             "file_ext": "png"},
    "SEM1": {"dandi_id": "001442", "version": "0.250512.1626",
             "description": "SEM Images of Rat Spinal Cord",
             "test_subjects": ["sub-rat6"], "file_ext": "png"},
    "BF1": {"dandi_id": "001440", "version": "0.250509.1913",
            "description": "BF Images of Rat Nerves at Different Regeneration Stages",
            "test_subjects": ["sub-uoftRat02", "sub-uoftRat07"], "file_ext": "png"},
    "BF2": {"dandi_id": "001630", "version": "0.251127.1424",
            "description": "Bright-Field Images of Rabbit Nerves",
            "test_subjects": ["sub-22G132040x3"], "file_ext": "tif"},
}

DATASET_NAMES = list(DATASETS.keys())
LABEL_CLASSES = {"background": 0, "myelin": 1, "axon": 2}


def _list_dandi_assets(dandi_id, version):
    import requests

    all_assets = []
    url = f"{DANDI_API}/dandisets/{dandi_id}/versions/{version}/assets/?page_size=200"
    while url:
        r = requests.get(url)
        r.raise_for_status()
        data = r.json()
        all_assets.extend(data["results"])
        url = data.get("next")
    return all_assets


def _find_image_label_pairs(assets, file_ext):
    """Pair `/micr/` images with their `_seg-axonmyelin-manual.png` labels."""
    label_map = {}
    for a in assets:
        p = a["path"]
        if "axonmyelin-manual.png" in p:
            stem = os.path.basename(p).replace("_seg-axonmyelin-manual.png", "")
            label_map[stem] = a
    pairs = []
    for a in assets:
        p = a["path"]
        if "/micr/" in p and not p.startswith("derivatives") and p.endswith(f".{file_ext}"):
            stem = os.path.basename(p).rsplit(".", 1)[0]
            if stem in label_map:
                pairs.append({"subject": p.split("/")[0], "image_asset": a,
                              "label_asset": label_map[stem], "stem": stem})
    return pairs


def _preprocess_label(label):
    """Map label values to: 0=background, 1=myelin (127/128), 2=axon (255)."""
    if label.ndim == 3:
        label = label[..., 0]
    new_label = np.zeros_like(label)
    new_label[(label == 127) | (label == 128)] = 1
    new_label[label == 255] = 2
    return new_label


def _download_and_preprocess(out_path, dataset_info, split, download):
    import h5py
    import requests
    from PIL import Image

    if not download:
        raise RuntimeError(f"Cannot find the data at {out_path}, but download was set to False")
    os.makedirs(out_path, exist_ok=True)

    test_subjects = dataset_info["test_subjects"]
    assets = _list_dandi_assets(dataset_info["dandi_id"], dataset_info["version"])
    pairs = _find_image_label_pairs(assets, dataset_info["file_ext"])
    if len(pairs) == 0:
        raise RuntimeError(f"No image-label pairs found for DANDI:{dataset_info['dandi_id']}")

    if test_subjects is not None:
        if split == "train":
            pairs = [p for p in pairs if p["subject"] not in test_subjects]
        else:
            pairs = [p for p in pairs if p["subject"] in test_subjects]
    elif split == "test":
        raise NotImplementedError(
            "The test set for this dataset is hosted externally; "
            "use the ASTIH repository's get_data.py script for the test split."
        )

    for pair in pairs:
        h5_path = os.path.join(out_path, f"{pair['stem']}.h5")
        if os.path.exists(h5_path):
            continue
        img_data = requests.get(f"{DANDI_API}/assets/{pair['image_asset']['asset_id']}/download/").content
        raw = np.asarray(Image.open(io.BytesIO(img_data)))
        if raw.ndim == 3:
            raw = raw[..., 0]
        lbl_data = requests.get(f"{DANDI_API}/assets/{pair['label_asset']['asset_id']}/download/").content
        label = _preprocess_label(np.asarray(Image.open(io.BytesIO(lbl_data))))
        assert raw.shape == label.shape, f"Shape mismatch: {raw.shape} vs {label.shape}"
        with h5py.File(h5_path, "w") as f:
            f.create_dataset("raw", data=raw, compression="gzip")
            f.create_dataset("labels", data=label, compression="gzip")


def get_astih_data(path: Union[os.PathLike, str], name: str, split: str,
                   download: bool = False) -> str:
    """Download one ASTIH sub-dataset ('TEM1'/'TEM2'/'SEM1'/'BF1'/'BF2') split."""
    assert name in DATASETS, f"Invalid name: {name}; choose from {DATASET_NAMES}"
    assert split in ("train", "test")
    out_path = os.path.join(str(path), name, split)
    if os.path.exists(out_path) and len(glob(os.path.join(out_path, "*.h5"))) > 0:
        return out_path
    _download_and_preprocess(out_path, DATASETS[name], split, download)
    return out_path


def get_astih_paths(path: Union[os.PathLike, str],
                    name: Optional[Union[str, Sequence[str]]] = None,
                    split: str = "train", download: bool = False) -> List[str]:
    """Get paths to the preprocessed ASTIH h5 files."""
    names = DATASET_NAMES if name is None else ([name] if isinstance(name, str) else list(name))
    all_paths = []
    for nn in names:
        data_root = get_astih_data(path, nn, split, download)
        all_paths.extend(sorted(glob(os.path.join(data_root, "*.h5"))))
    return all_paths


def get_astih_dataset(path: Union[os.PathLike, str], patch_shape: Tuple[int, int],
                      name: Optional[Union[str, Sequence[str]]] = None,
                      split: str = "train", download: bool = False,
                      label_classes: Optional[Sequence[str]] = None, **kwargs):
    """Dataset for axon/myelin segmentation (0=background, 1=myelin, 2=axon);
    ``label_classes`` selects classes for one-hot encoding."""
    all_paths = get_astih_paths(path, name, split, download)

    if label_classes is not None:
        class_ids = []
        for cls_name in label_classes:
            if cls_name not in LABEL_CLASSES:
                raise ValueError(f"Invalid class name: '{cls_name}'. Choose from {list(LABEL_CLASSES.keys())}.")
            class_ids.append(LABEL_CLASSES[cls_name])
        msg = "'label_classes' is set, but 'label_transform' is in the kwargs. It will be over-ridden."
        kwargs = util.update_kwargs(kwargs, "label_transform", OneHotTransform(class_ids=class_ids), msg=msg)

    return default_segmentation_dataset(
        raw_paths=all_paths, raw_key="raw",
        label_paths=all_paths, label_key="labels",
        patch_shape=patch_shape, **kwargs,
    )


def get_astih_loader(path: Union[os.PathLike, str], patch_shape: Tuple[int, int],
                     batch_size: int, name: Optional[Union[str, Sequence[str]]] = None,
                     split: str = "train", download: bool = False,
                     label_classes: Optional[Sequence[str]] = None, **kwargs) -> DataLoader:
    """DataLoader for axon/myelin segmentation in the ASTIH dataset."""
    ds_kwargs, loader_kwargs = util.split_kwargs(default_segmentation_dataset, **kwargs)
    ds = get_astih_dataset(path, patch_shape, name=name, split=split, download=download,
                           label_classes=label_classes, **ds_kwargs)
    return get_data_loader(ds, batch_size=batch_size, **loader_kwargs)
