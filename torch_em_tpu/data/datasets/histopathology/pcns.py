"""PCNS dataset: nucleus instance segmentation in H&E histopathology patches
of fourteen TCGA cancer types (reference
torch_em/data/datasets/histopathology/pcns.py).

1,365 manually annotated 400x400 patches at 40x magnification (BLCA, BRCA,
CESC, COAD, GBM, LUAD, LUSC, PAAD, PRAD, READ, SKCM, STAD, UCEC, UVM).
Requires manual download of 'manual_segmentation_data.tar.gz' from
https://www.cancerimagingarchive.net/analysis-result/pan-cancer-nuclei-seg/.
Data DOI https://doi.org/10.7937/TCIA.2019.4A4DKP9U; publication
https://doi.org/10.1038/s41597-020-0528-1.
"""

import io
import json
import os
import shutil
import tarfile
from glob import glob
from typing import List, Optional, Tuple, Union

import numpy as np

from ... import DataLoader
from ....segmentation import default_segmentation_dataset, get_data_loader
from ....utils.io import load_image
from .. import util

CROSSWALK_URL = (
    "https://www.cancerimagingarchive.net/wp-content/uploads/"
    "Pan-Cancer-Nuclei-Seg_1365patches_to_TCGA-ID_readme.txt"
)

BOX_URL = "https://stonybrookmedicine.app.box.com/v/cnn-nuclear-segmentations-2019/file/586046955275"

CANCER_TYPES = [
    "blca", "brca", "cesc", "coad", "gbm", "luad", "lusc",
    "paad", "prad", "read", "skcm", "stad", "ucec", "uvm",
]


def _load_crosswalk(path: str):
    """Parse the TCIA crosswalk readme (Patch-ID -> cancer type)."""
    import pandas as pd

    crosswalk_path = os.path.join(path, "pcns_crosswalk.txt")
    if not os.path.exists(crosswalk_path):
        util.download_source(path=crosswalk_path, url=CROSSWALK_URL, download=True)

    with open(crosswalk_path, "rb") as f:
        raw = f.read()
    if raw[:2] == b"\x1f\x8b":
        import gzip
        content = gzip.decompress(raw).decode("utf-8")
    else:
        content = raw.decode("utf-8")

    lines = content.split("\n")
    csv_start = next((i for i, line in enumerate(lines) if line.startswith("Patch-ID,")), None)
    if csv_start is None:
        raise RuntimeError("Failed to parse the PCNS crosswalk file. Re-download it and try again.")

    df = pd.read_csv(io.StringIO("\n".join(lines[csv_start:])))
    df = df.dropna(subset=["Patch-ID", "CancerType"])
    df["Patch-ID"] = df["Patch-ID"].astype(int)
    df["CancerType"] = df["CancerType"].str.lower()
    return df


def _create_split_csv(path: str, all_patch_ids: List[int], split: str) -> List[int]:
    """Persist a random 80/20 train/test split of patch ids."""
    import pandas as pd

    csv_path = os.path.join(path, "pcns_split.csv")
    if os.path.exists(csv_path):
        df = pd.read_csv(csv_path)
        df[split] = df[split].apply(lambda x: json.loads(x.replace("'", '"')))
        return df.iloc[0][split]

    ids = list(all_patch_ids)
    np.random.shuffle(ids)
    n_test = int(round(0.2 * len(ids)))
    split_ids = {"train": sorted(ids[n_test:]), "test": sorted(ids[:n_test])}
    pd.DataFrame.from_dict([split_ids]).to_csv(csv_path, index=False)
    return split_ids[split]


def _create_samples(path: str, extract_dir: str, crosswalk_df) -> str:
    """Build per-patch h5 files: raw RGB (3, H, W), corrected instance mask,
    and the three per-annotator masks (zero-filled where absent)."""
    import h5py

    preprocessed_dir = os.path.join(path, "preprocessed_data")
    if os.path.exists(preprocessed_dir):
        return preprocessed_dir
    os.makedirs(preprocessed_dir, exist_ok=True)

    crop_paths = {
        int(os.path.basename(p).split("_crop")[0]): p
        for p in glob(os.path.join(extract_dir, "**", "*_crop.png"), recursive=True)
    }
    ct_map = {int(row["Patch-ID"]): str(row["CancerType"]).lower()
              for _, row in crosswalk_df.iterrows()}
    valid_ids = [pid for pid in crop_paths
                 if os.path.exists(crop_paths[pid].replace("_crop.png", "_labeled_mask_corrected.png"))]

    for patch_id in sorted(valid_ids):
        image_path = crop_paths[patch_id]
        mask_path = image_path.replace("_crop.png", "_labeled_mask_corrected.png")
        raw = np.asarray(load_image(image_path))[..., :3].transpose(2, 0, 1)
        mask = np.asarray(load_image(mask_path)).astype(np.int32)
        h, w = mask.shape

        with h5py.File(os.path.join(preprocessed_dir, f"{patch_id}.h5"), "w") as f:
            f.create_dataset("raw", data=raw, compression="gzip")
            f.create_dataset("labels/instances", data=mask, compression="gzip")
            has_all = True
            for k in range(3):
                common_path = image_path.replace("_crop.png", f"_labeled_mask_common{k}.png")
                if os.path.exists(common_path):
                    common_mask = np.asarray(load_image(common_path)).astype(np.int32)
                else:
                    common_mask = np.zeros((h, w), dtype=np.int32)
                    has_all = False
                f.create_dataset(f"labels/common{k}", data=common_mask, compression="gzip")
            f.attrs["cancer_type"] = ct_map.get(patch_id, "unknown")
            f.attrs["has_common"] = has_all
    return preprocessed_dir


def get_pcns_data(path: Union[os.PathLike, str], download: bool = False) -> str:
    """Extract the manually-downloaded PCNS tarball and build per-sample h5s."""
    path = os.path.normpath(str(path))
    preprocessed_dir = os.path.join(path, "preprocessed_data")
    if os.path.exists(preprocessed_dir):
        return preprocessed_dir

    tar_path = os.path.join(path, "manual_segmentation_data.tar.gz")
    if download:
        raise RuntimeError(
            "The PCNS dataset cannot be downloaded automatically. "
            f"Please download 'manual_segmentation_data.tar.gz' manually from {BOX_URL} "
            f"and place it at '{tar_path}'.")
    if not os.path.exists(tar_path):
        raise RuntimeError(
            "The PCNS dataset requires manual download. "
            f"Please download 'manual_segmentation_data.tar.gz' from {BOX_URL} "
            f"and place it at '{tar_path}'.")

    extract_dir = os.path.join(path, "_raw")
    os.makedirs(extract_dir, exist_ok=True)
    with tarfile.open(tar_path, "r:gz") as tar:
        tar.extractall(path=extract_dir)

    crosswalk_df = _load_crosswalk(path)
    _create_samples(path, extract_dir, crosswalk_df)
    shutil.rmtree(extract_dir)
    return preprocessed_dir


def get_pcns_paths(path: Union[os.PathLike, str], split: str,
                   cancer_type: Optional[Union[str, List[str]]] = None,
                   download: bool = False) -> List[str]:
    """Per-sample h5 paths for a split, optionally filtered by cancer type."""
    if split not in ("train", "test"):
        raise ValueError(f"'{split}' is not a valid split. Choose from 'train' or 'test'.")

    preprocessed_dir = get_pcns_data(path, download)
    crosswalk_df = _load_crosswalk(os.path.normpath(str(path)))
    split_ids = set(_create_split_csv(os.path.normpath(str(path)),
                                      crosswalk_df["Patch-ID"].tolist(), split))

    if cancer_type is not None:
        if isinstance(cancer_type, str):
            cancer_type = [cancer_type]
        cancer_type = [ct.lower() for ct in cancer_type]
        invalid = [ct for ct in cancer_type if ct not in CANCER_TYPES]
        if invalid:
            raise ValueError(f"Invalid cancer type(s): {invalid}. Choose from {CANCER_TYPES}.")
        type_ids = set(crosswalk_df[crosswalk_df["CancerType"].isin(cancer_type)]["Patch-ID"].tolist())
        split_ids = split_ids & type_ids

    volume_paths = [os.path.join(preprocessed_dir, f"{pid}.h5") for pid in sorted(split_ids)
                    if os.path.exists(os.path.join(preprocessed_dir, f"{pid}.h5"))]
    if not volume_paths:
        raise RuntimeError(f"No samples found for split='{split}', cancer_type={cancer_type!r}.")
    return volume_paths


def get_pcns_dataset(path: Union[os.PathLike, str], patch_shape: Tuple[int, int],
                     split: str, cancer_type: Optional[Union[str, List[str]]] = None,
                     download: bool = False, **kwargs):
    """Dataset for nucleus instance segmentation over PCNS patches."""
    volume_paths = get_pcns_paths(path, split, cancer_type, download)
    return default_segmentation_dataset(
        raw_paths=volume_paths, raw_key="raw",
        label_paths=volume_paths, label_key="labels/instances",
        patch_shape=patch_shape, ndim=2, with_channels=True, **kwargs,
    )


def get_pcns_loader(path: Union[os.PathLike, str], batch_size: int,
                    patch_shape: Tuple[int, int], split: str,
                    cancer_type: Optional[Union[str, List[str]]] = None,
                    download: bool = False, **kwargs) -> DataLoader:
    """DataLoader for nucleus instance segmentation over PCNS patches."""
    ds_kwargs, loader_kwargs = util.split_kwargs(default_segmentation_dataset, **kwargs)
    ds = get_pcns_dataset(path, patch_shape, split, cancer_type, download, **ds_kwargs)
    return get_data_loader(ds, batch_size, **loader_kwargs)
