"""Tests for the dataset-zoo machinery (no downloads, reference §4 pattern)."""

import os

import numpy as np
import pytest

from torch_em_tpu.data.datasets import util
from torch_em_tpu.segmentation import default_segmentation_dataset


class TestZooUtil:
    def test_split_kwargs(self):
        ds_kwargs, loader_kwargs = util.split_kwargs(
            default_segmentation_dataset, sampler=None, shuffle=True, num_workers=2, n_samples=10,
        )
        assert set(ds_kwargs) == {"sampler", "n_samples"}
        assert set(loader_kwargs) == {"shuffle", "num_workers"}

    def test_add_instance_label_transform(self):
        from torch_em_tpu.transforms import AffinityTransform, BoundaryTransform

        kwargs, dtype = util.add_instance_label_transform(
            {}, add_binary_target=True, offsets=[[-1, 0], [0, -1]],
        )
        assert isinstance(kwargs["label_transform2"], AffinityTransform)
        assert dtype == "float32"

        kwargs, _ = util.add_instance_label_transform({}, add_binary_target=True, boundaries=True)
        assert isinstance(kwargs["label_transform"], BoundaryTransform)

    def test_download_gate(self, tmp_path):
        with pytest.raises(RuntimeError):
            util.download_source(str(tmp_path / "missing.zip"), "https://example.com/x.zip",
                                 download=False)

    def test_checksum(self, tmp_path):
        p = tmp_path / "file.bin"
        p.write_bytes(b"hello world")
        checksum = util.get_checksum(str(p))
        assert len(checksum) == 64
        util._check_checksum(str(p), checksum)  # should not raise
        with pytest.raises(RuntimeError):
            util._check_checksum(str(p), "0" * 64)

    def test_unzip(self, tmp_path):
        import zipfile

        zip_path = tmp_path / "archive.zip"
        with zipfile.ZipFile(zip_path, "w") as f:
            f.writestr("content.txt", "data")
        util.unzip(str(zip_path), str(tmp_path / "out"))
        assert (tmp_path / "out" / "content.txt").exists()
        assert not zip_path.exists()  # removed after unpacking

    def test_xml_rasterization(self, tmp_path):
        xml = """<?xml version="1.0"?>
        <Annotations><Annotation><Regions><Region>
            <Vertices>
                <Vertex X="2" Y="2"/><Vertex X="10" Y="2"/>
                <Vertex X="10" Y="10"/><Vertex X="2" Y="10"/>
            </Vertices>
        </Region></Regions></Annotation></Annotations>"""
        xml_path = tmp_path / "ann.xml"
        xml_path.write_text(xml)
        labels = util.generate_labeled_array_from_xml((16, 16), str(xml_path))
        assert labels.shape == (16, 16)
        assert labels.max() == 1
        assert labels[5, 5] == 1


class TestLivecellCoco:
    def test_polygon_and_rle_decoding(self):
        from torch_em_tpu.data.datasets.light_microscopy.livecell import (
            _annotation_to_mask, _annotations_to_instances,
        )

        shape = (32, 32)
        poly_ann = {"segmentation": [[2, 2, 20, 2, 20, 20, 2, 20]], "area": 324, "iscrowd": 0}
        mask = _annotation_to_mask(poly_ann, shape)
        assert mask.shape == shape and mask[10, 10]

        # uncompressed RLE: column-major runs
        rle_ann = {"segmentation": {"size": [32, 32], "counts": [10, 100, 32 * 32 - 110]},
                   "area": 100, "iscrowd": 0}
        mask = _annotation_to_mask(rle_ann, shape)
        assert mask.sum() == 100

        seg = _annotations_to_instances({"height": 32, "width": 32}, [poly_ann, rle_ann])
        assert seg.shape == shape
        assert seg.max() >= 1


class TestZooModules:
    def test_all_modules_import_and_expose_loaders(self):
        """Every dataset module must import cleanly and expose get_*_loader."""
        import importlib
        import pkgutil

        import torch_em_tpu.data.datasets as zoo

        n_modules = 0
        for pkg in pkgutil.walk_packages(zoo.__path__, zoo.__name__ + "."):
            if pkg.ispkg or pkg.name.rsplit(".", 1)[-1] in ("util",):
                continue
            mod = importlib.import_module(pkg.name)
            loaders = [k for k in dir(mod) if k.startswith("get_") and k.endswith("_loader")]
            assert loaders, f"{pkg.name} exposes no get_*_loader"
            n_modules += 1
        assert n_modules >= 205, f"only {n_modules} dataset modules"

    def test_every_module_has_a_layout_test(self):
        """206/206: each zoo module must be exercised by at least one
        fabricated-layout test in this file (by name — a few modules are
        covered inside tests named after a sibling, e.g. shared families)."""
        import pkgutil
        import re

        import torch_em_tpu.data.datasets as zoo

        mods = {pkg.name.rsplit(".", 1)[-1]
                for pkg in pkgutil.walk_packages(zoo.__path__, zoo.__name__ + ".")
                if not pkg.ispkg and pkg.name.rsplit(".", 1)[-1] != "util"}
        src = open(os.path.join(os.path.dirname(__file__), "test_datasets_zoo.py")).read()
        missing = sorted(m for m in mods
                         if not re.search(r"\b" + re.escape(m) + r"\b", src))
        assert not missing, f"zoo modules without a layout test: {missing}"


class TestZooLayouts:
    """Functional layout tests against fabricated folder trees (no downloads)
    for the north-star datasets (reference layouts: dsb.py, cremi.py, snemi.py)."""

    def test_dsb_reduced_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.dsb import get_dsb_loader, get_dsb_paths

        rng = np.random.default_rng(0)
        for split in ("train", "test"):
            for sub in ("images", "masks"):
                (tmp_path / split / sub).mkdir(parents=True)
            for i in range(3):
                raw = (rng.random((64, 64)) * 255).astype("uint8")
                lab = rng.integers(0, 3, (64, 64)).astype("uint8")
                Image.fromarray(raw).save(tmp_path / split / "images" / f"im{i}.tif")
                Image.fromarray(lab).save(tmp_path / split / "masks" / f"im{i}.tif")

        raw_paths, label_paths = get_dsb_paths(str(tmp_path), source="reduced", split="train")
        assert len(raw_paths) == len(label_paths) == 3
        # both splits when split=None
        raw_paths, _ = get_dsb_paths(str(tmp_path), source="reduced")
        assert len(raw_paths) == 6

        loader = get_dsb_loader(str(tmp_path), patch_shape=(1, 32, 32), batch_size=2,
                                split="train", boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape == (2, 2, 32, 32)  # fg + boundary channels

    def test_dsb_full_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.dsb import _merge_instances, get_dsb_paths

        rng = np.random.default_rng(1)
        # fabricate the extracted train-hand layout: full/<id>/{images,masks}
        for i, kind in enumerate(["fluo", "histo"]):
            id_ = f"sample{i:03d}"
            (tmp_path / "full" / id_ / "images").mkdir(parents=True)
            (tmp_path / "full" / id_ / "masks").mkdir(parents=True)
            if kind == "fluo":  # grayscale stored as RGBA with equal channels
                g = (rng.random((48, 48)) * 255).astype("uint8")
                rgba = np.stack([g, g, g, np.full_like(g, 255)], axis=-1)
            else:
                rgba = (rng.random((48, 48, 4)) * 255).astype("uint8")
                rgba[..., -1] = 255
            Image.fromarray(rgba).save(tmp_path / "full" / id_ / "images" / f"{id_}.png")
            for m in range(2):
                mask = np.zeros((48, 48), dtype="uint8")
                mask[10 * m:10 * m + 8, 10:20] = 255
                Image.fromarray(mask).save(tmp_path / "full" / id_ / "masks" / f"m{m}.png")

        _merge_instances(str(tmp_path))
        raw_paths, label_paths = get_dsb_paths(str(tmp_path), source="full")
        assert len(raw_paths) == len(label_paths) == 2
        fluo_paths, _ = get_dsb_paths(str(tmp_path), source="full", domain="fluo")
        assert len(fluo_paths) == 1
        # merged instances hold both objects
        merged = np.asarray(Image.open(label_paths[0]))
        assert set(np.unique(merged)) == {0, 1, 2}

    def test_cremi_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.cremi import get_cremi_loader

        rng = np.random.default_rng(2)
        for sample in ("A", "B"):
            with h5py.File(tmp_path / f"sample_{sample}.h5", "w") as f:
                f.create_dataset("volumes/raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
                f.create_dataset("volumes/labels/neuron_ids",
                                 data=rng.integers(1, 5, (8, 64, 64)).astype("uint64"))

        loader = get_cremi_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                  samples=("A", "B"), boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[0] == 1 and y.shape[-3:] == (4, 32, 32)

    def test_snemi_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.snemi import get_snemi_loader

        rng = np.random.default_rng(3)
        with h5py.File(tmp_path / "snemi_train.h5", "w") as f:
            f.create_dataset("volumes/raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("volumes/labels/neuron_ids",
                             data=rng.integers(1, 5, (8, 64, 64)).astype("uint64"))

        loader = get_snemi_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                  sample="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)

    def test_lucchi_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.lucchi import get_lucchi_loader

        rng = np.random.default_rng(4)
        with h5py.File(tmp_path / "lucchi_train.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels", data=(rng.random((8, 64, 64)) > 0.7).astype("uint8"))

        loader = get_lucchi_loader(str(tmp_path), split="train", patch_shape=(4, 32, 32),
                                   batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)

    def test_microns_nuclei_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.microns_nuclei import (
            get_microns_nuclei_loader,
        )

        rng = np.random.default_rng(5)
        split_dir = tmp_path / "train"
        split_dir.mkdir()
        for i in range(2):
            with h5py.File(split_dir / f"crop{i}.h5", "w") as f:
                f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
                f.create_dataset("labels/nuclei",
                                 data=rng.integers(0, 4, (8, 64, 64)).astype("uint32"))

        loader = get_microns_nuclei_loader(str(tmp_path), split="train",
                                           patch_shape=(4, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)

    def test_kasthuri_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.kasthuri import get_kasthuri_loader

        rng = np.random.default_rng(6)
        with h5py.File(tmp_path / "kasthuri_train.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels", data=(rng.random((8, 64, 64)) > 0.7).astype("int8"))
        loader = get_kasthuri_loader(str(tmp_path), split="train", patch_shape=(4, 32, 32),
                                     batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)

    def test_vnc_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.vnc import get_vnc_mito_loader

        rng = np.random.default_rng(7)
        for fname in ("vnc_train.h5", "vnc_test.h5"):
            with h5py.File(tmp_path / fname, "w") as f:
                f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
                f.create_dataset("labels/mitochondria",
                                 data=rng.integers(0, 3, (8, 64, 64)).astype("uint32"))
        loader = get_vnc_mito_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                     boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)

    def test_livecell_layout(self, tmp_path):
        """Fabricated LIVECell layout: image folder tree + COCO polygon
        annotations (reference livecell.py: images/livecell_train_val_images/
        <cell_type>/<file>.tif + train.json)."""
        import json

        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.livecell import (
            get_livecell_loader, get_livecell_paths,
        )

        rng = np.random.default_rng(9)
        im_dir = tmp_path / "images" / "livecell_train_val_images" / "A172"
        im_dir.mkdir(parents=True)
        images, annotations = [], []
        for i in range(2):
            fname = f"A172_Phase_A7_1_00d00h00m_{i}.tif"
            arr = (rng.random((64, 64)) * 255).astype("uint8")
            Image.fromarray(arr).save(im_dir / fname)
            images.append({"id": i, "file_name": fname, "height": 64, "width": 64})
            # two rectangular cells per image, as COCO polygons
            for j in range(2):
                x0, y0 = 8 + 24 * j, 8 + 20 * j
                poly = [x0, y0, x0 + 16, y0, x0 + 16, y0 + 14, x0, y0 + 14]
                annotations.append({
                    "id": 10 * i + j, "image_id": i, "segmentation": [poly],
                    "area": 16 * 14, "iscrowd": 0,
                })
        with open(tmp_path / "train.json", "w") as f:
            json.dump({"images": images, "annotations": annotations}, f)

        image_paths, seg_paths = get_livecell_paths(str(tmp_path), split="train")
        assert len(image_paths) == len(seg_paths) == 2
        seg = np.asarray(Image.open(seg_paths[0]))
        assert seg.max() >= 2  # both instances rasterized

        # cell-type filtering
        filtered, _ = get_livecell_paths(str(tmp_path), split="train", cell_types=["A172"])
        assert len(filtered) == 2 and all("A172" in p for p in filtered)

        loader = get_livecell_loader(str(tmp_path), split="train", patch_shape=(64, 64),
                                     batch_size=1, boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 64, 64)
        assert y.shape[0] == 1 and y.shape[-2:] == (64, 64)

    def test_plantseg_ovules_layout(self, tmp_path):
        """Fabricated PlantSeg layout: <name>_<split>/*.h5 with raw/label
        (reference plantseg.py)."""
        import h5py

        from torch_em_tpu.data.datasets.light_microscopy.plantseg import (
            get_plantseg_loader, get_plantseg_paths,
        )

        rng = np.random.default_rng(10)
        for name, split in (("ovules", "train"), ("root", "val")):
            d = tmp_path / f"{name}_{split}"
            d.mkdir()
            for i in range(2):
                with h5py.File(d / f"vol{i}.h5", "w") as f:
                    f.create_dataset("raw", data=rng.random((8, 64, 64)).astype("float32"))
                    f.create_dataset("label",
                                     data=rng.integers(1, 5, (8, 64, 64)).astype("uint32"))

        assert len(get_plantseg_paths(str(tmp_path), "ovules", "train")) == 2
        loader = get_plantseg_loader(str(tmp_path), "ovules", "train",
                                     patch_shape=(4, 32, 32), batch_size=1, boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[0] == 1 and y.shape[-3:] == (4, 32, 32)

    def test_mitoem_layout(self, tmp_path):
        """Fabricated MitoEM layout: <sample>_<split>.h5 with raw/labels
        (reference mitoem.py)."""
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.mitoem import (
            get_mitoem_loader, get_mitoem_paths,
        )

        rng = np.random.default_rng(11)
        for sample in ("rat", "human"):
            with h5py.File(tmp_path / f"{sample}_train.h5", "w") as f:
                f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
                f.create_dataset("labels", data=rng.integers(0, 4, (8, 64, 64)).astype("uint32"))

        paths = get_mitoem_paths(str(tmp_path), splits="train", samples=("rat", "human"))
        assert len(paths) == 2
        loader = get_mitoem_loader(str(tmp_path), splits="train", samples=("rat",),
                                   patch_shape=(4, 32, 32), batch_size=1, boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)

    def test_covid_if_layout(self, tmp_path):
        """Fabricated Covid-IF layout: flat *.h5 with multiscale-style keys
        (reference covid_if.py)."""
        import h5py

        from torch_em_tpu.data.datasets.light_microscopy.covid_if import (
            get_covid_if_loader, get_covid_if_paths,
        )

        rng = np.random.default_rng(12)
        for i in range(4):
            with h5py.File(tmp_path / f"gt_image_{i:03d}.h5", "w") as f:
                f.create_dataset("raw/serum_IgG/s0",
                                 data=rng.random((64, 64)).astype("float32"))
                f.create_dataset("raw/nuclei/s0",
                                 data=rng.random((64, 64)).astype("float32"))
                f.create_dataset("labels/cells/s0",
                                 data=rng.integers(0, 4, (64, 64)).astype("uint32"))
                f.create_dataset("labels/nuclei/s0",
                                 data=rng.integers(0, 3, (64, 64)).astype("uint32"))

        assert len(get_covid_if_paths(str(tmp_path))) == 4
        # sample_range slicing
        assert len(get_covid_if_paths(str(tmp_path), sample_range=(1, 3))) == 2

        for target in ("cells", "nuclei"):
            loader = get_covid_if_loader(str(tmp_path), patch_shape=(32, 32),
                                         batch_size=1, target=target, boundaries=True)
            x, y = next(iter(loader))
            assert x.shape == (1, 1, 32, 32)
            assert y.shape[-2:] == (32, 32)

    def test_mouse_embryo_layout(self, tmp_path):
        """Fabricated mouse-embryo layout: <Name>/<split>/*.h5 with the
        nuclei val->test split rename (reference mouse_embryo.py)."""
        import h5py

        from torch_em_tpu.data.datasets.light_microscopy.mouse_embryo import (
            get_mouse_embryo_loader, get_mouse_embryo_paths,
        )

        rng = np.random.default_rng(13)
        for name, split in (("Membrane", "train"), ("Membrane", "val"),
                            ("Nuclei", "train"), ("Nuclei", "test")):
            d = tmp_path / name / split
            d.mkdir(parents=True)
            for i in range(2):
                with h5py.File(d / f"vol{i}.h5", "w") as f:
                    f.create_dataset("raw", data=rng.random((8, 64, 64)).astype("float32"))
                    f.create_dataset("label",
                                     data=rng.integers(1, 5, (8, 64, 64)).astype("uint32"))

        assert len(get_mouse_embryo_paths(str(tmp_path), "membrane", "train")) == 2
        # the nuclei data has a test instead of a val split
        assert len(get_mouse_embryo_paths(str(tmp_path), "nuclei", "val")) == 2

        loader = get_mouse_embryo_loader(str(tmp_path), "membrane", "train",
                                         patch_shape=(4, 32, 32), batch_size=1,
                                         boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_monuseg_layout(self, tmp_path):
        """Fabricated MoNuSeg layout (histopathology domain): extracted
        'MoNuSeg 2018 Training Data' with per-image tif + Aperio-style xml
        polygon annotations, rasterized into split/{images,labels}/*.png on
        first access (reference histopathology/monuseg.py)."""
        pytest.importorskip("PIL")
        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.monuseg import (
            ORGAN_SPLITS, get_monuseg_loader, get_monuseg_paths,
        )

        rng = np.random.default_rng(21)
        root = tmp_path / "MoNuSeg 2018 Training Data"
        root.mkdir()
        xml = """<?xml version="1.0"?>
        <Annotations><Annotation><Regions><Region>
            <Vertices>
                <Vertex X="8" Y="8"/><Vertex X="40" Y="8"/>
                <Vertex X="40" Y="40"/><Vertex X="8" Y="40"/>
            </Vertices>
        </Region></Regions></Annotation></Annotations>"""
        # one breast and one kidney image so the organ filter has work to do
        names = [ORGAN_SPLITS["breast"][0], ORGAN_SPLITS["kidney"][0]]
        for name in names:
            Image.fromarray(
                (rng.random((64, 64, 3)) * 255).astype("uint8")).save(root / f"{name}.tif")
            (root / f"{name}.xml").write_text(xml)

        image_paths, label_paths = get_monuseg_paths(str(tmp_path), split="train")
        assert len(image_paths) == 2 and len(label_paths) == 2
        # rasterized label actually contains the polygon instance
        lab = np.asarray(Image.open(label_paths[0]))
        assert lab.max() == 1 and lab[20, 20] == 1
        # organ filter narrows to the matching TCGA ids
        breast_imgs, _ = get_monuseg_paths(str(tmp_path), split="train",
                                           organ_type=["breast"])
        assert len(breast_imgs) == 1 and names[0] in breast_imgs[0]

        loader = get_monuseg_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                    split="train", boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_amos_layout(self, tmp_path):
        """Fabricated AMOS layout (medical domain): amos22/{imagesTr,labelsTr}
        NIfTI-gz volumes, CT/MRI modality split on the patient id (< 500 = CT;
        reference medical/amos.py) — exercises the pure-numpy NIfTI reader."""
        from torch_em_tpu.data.datasets.medical.amos import (
            get_amos_loader, get_amos_paths,
        )
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(22)
        im_dir = tmp_path / "amos22" / "imagesTr"
        gt_dir = tmp_path / "amos22" / "labelsTr"
        im_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for pid in (1, 2, 507):  # two CT patients, one MRI
            save_nifti(str(im_dir / f"amos_{pid:04d}.nii.gz"),
                       rng.random((12, 48, 48)).astype("float32"))
            save_nifti(str(gt_dir / f"amos_{pid:04d}.nii.gz"),
                       rng.integers(0, 5, (12, 48, 48)).astype("uint8"))

        image_paths, gt_paths = get_amos_paths(str(tmp_path), split="train")
        assert len(image_paths) == 3 and len(gt_paths) == 3
        ct_imgs, ct_gts = get_amos_paths(str(tmp_path), split="train", modality="CT")
        assert len(ct_imgs) == 2 and len(ct_gts) == 2
        mri_imgs, _ = get_amos_paths(str(tmp_path), split="train", modality="MRI")
        assert len(mri_imgs) == 1 and "0507" in mri_imgs[0]
        with pytest.raises(ValueError):
            get_amos_paths(str(tmp_path), split="not-a-split")

        loader = get_amos_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                 split="train", modality="CT")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_psfhs_layout(self, tmp_path):
        """Fabricated PSFHS layout: PSFHS/{image_mha,label_mha}/*.mha RGB
        ultrasound images — drives the pure-numpy MetaImage reader through a
        zoo module (reference medical/psfhs.py)."""
        from torch_em_tpu.data.datasets.medical.psfhs import (
            get_psfhs_loader, get_psfhs_paths,
        )
        from torch_em_tpu.utils.medical_io import save_mha

        rng = np.random.default_rng(23)
        im_dir = tmp_path / "PSFHS" / "image_mha"
        lab_dir = tmp_path / "PSFHS" / "label_mha"
        im_dir.mkdir(parents=True)
        lab_dir.mkdir(parents=True)
        for i in range(4):
            save_mha(str(im_dir / f"{i:05d}.mha"),
                     (rng.random((64, 64, 3)) * 255).astype("uint8"))
            save_mha(str(lab_dir / f"{i:05d}.mha"),
                     rng.integers(0, 3, (64, 64)).astype("uint8"))

        raw_paths, label_paths = get_psfhs_paths(str(tmp_path), split="train")
        assert len(raw_paths) == 4 and len(label_paths) == 4
        with pytest.raises(ValueError):
            get_psfhs_paths(str(tmp_path), split="not-a-split")

        loader = get_psfhs_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                  split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_sega_layout(self, tmp_path):
        """Fabricated SegA layout: KiTS/<case>/*.nrrd + *.seg.nrrd volumes,
        converted to NIfTI on first access — drives the pure-numpy NRRD
        reader incl. the 4D layer-axis squeeze (reference medical/sega.py)."""
        from torch_em_tpu.data.datasets.medical.sega import (
            get_sega_loader, get_sega_paths,
        )
        from torch_em_tpu.utils.medical_io import load_nifti, save_nrrd

        rng = np.random.default_rng(24)
        for case in ("K1", "K2"):
            d = tmp_path / "KiTS" / case
            d.mkdir(parents=True)
            save_nrrd(str(d / f"{case}.nrrd"), rng.random((12, 48, 48)).astype("float32"))
            # 3D-Slicer-style segmentation nrrd with a leading layer axis
            save_nrrd(str(d / f"{case}.seg.nrrd"),
                      rng.integers(0, 2, (1, 12, 48, 48)).astype("uint8"))

        image_paths, gt_paths = get_sega_paths(str(tmp_path), data_choice="kits")
        assert len(image_paths) == 2 and len(gt_paths) == 2
        # the layer axis was squeezed away in the converted labels
        assert load_nifti(gt_paths[0]).ndim == 3

        loader = get_sega_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                 data_choice="kits")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_isbi_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.isbi2012 import get_isbi_loader

        rng = np.random.default_rng(8)
        with h5py.File(tmp_path / "isbi.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels/gt_segmentation",
                             data=rng.integers(1, 5, (8, 64, 64)).astype("uint32"))
            f.create_dataset("labels/membranes",
                             data=(rng.random((8, 64, 64)) > 0.7).astype("uint8"))
        loader = get_isbi_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                 boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        # original membrane labels path
        loader2 = get_isbi_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                  use_original_labels=True)
        x2, y2 = next(iter(loader2))
        assert x2.shape == (1, 1, 4, 32, 32)

    def test_platynereis_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.platynereis import (
            get_platynereis_nuclei_loader, get_platynereis_paths)

        rng = np.random.default_rng(9)
        nuc = tmp_path / "nuclei"
        nuc.mkdir()
        # get_platynereis_data requires the full file count on disk
        for i in range(1, 13):
            with h5py.File(nuc / f"train_data_nuclei_{i:02d}.h5", "w") as f:
                f.create_dataset("volumes/raw",
                                 data=(rng.random((8, 48, 48)) * 255).astype("uint8"))
                f.create_dataset("volumes/labels/nucleus_instance_labels",
                                 data=rng.integers(0, 4, (8, 48, 48)).astype("uint64"))

        paths = get_platynereis_paths(str(tmp_path), sample_ids=None, name="nuclei")
        assert len(paths) == 12
        loader = get_platynereis_nuclei_loader(
            str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
            sample_ids=[1, 2], boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_deepbacs_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.deepbacs import (
            get_deepbacs_loader, get_deepbacs_paths)

        rng = np.random.default_rng(10)
        # the 'training'/'source'+'target' archive variant
        for sub in ("source", "target"):
            (tmp_path / "mixed" / "training" / sub).mkdir(parents=True)
            (tmp_path / "mixed" / "test" / sub).mkdir(parents=True)
        for split in ("training", "test"):
            for i in range(3):
                raw = (rng.random((64, 64)) * 255).astype("uint8")
                lab = rng.integers(0, 4, (64, 64)).astype("uint8")
                Image.fromarray(raw).save(tmp_path / "mixed" / split / "source" / f"im{i}.tif")
                Image.fromarray(lab).save(tmp_path / "mixed" / split / "target" / f"im{i}.tif")

        image_paths, label_paths = get_deepbacs_paths(str(tmp_path), "mixed", "train")
        assert len(image_paths) == len(label_paths) == 3
        loader = get_deepbacs_loader(str(tmp_path), "train", patch_shape=(32, 32),
                                     batch_size=2, bac_type="mixed")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape == (2, 1, 32, 32)

    def test_uro_cell_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.uro_cell import (
            get_uro_cell_loader, get_uro_cell_paths)

        rng = np.random.default_rng(11)
        # two volumes with lyso labels, one without (must be filtered out)
        for name, with_lyso in (("fib1", True), ("fib2", True), ("fib3", False)):
            with h5py.File(tmp_path / f"{name}.h5", "w") as f:
                f.create_dataset("raw", data=(rng.random((8, 48, 48)) * 255).astype("uint8"))
                if with_lyso:
                    f.create_dataset("labels/lyso",
                                     data=rng.integers(0, 3, (8, 48, 48)).astype("uint32"))

        paths = get_uro_cell_paths(str(tmp_path), "lyso")
        assert len(paths) == 2
        loader = get_uro_cell_loader(str(tmp_path), "lyso", patch_shape=(4, 32, 32),
                                     batch_size=1, boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_neurips_cellseg_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.neurips_cell_seg import (
            get_neurips_cellseg_supervised_loader, get_neurips_cellseg_unsupervised_loader)

        rng = np.random.default_rng(12)
        train = tmp_path / "Training-labeled"
        (train / "images").mkdir(parents=True)
        (train / "labels").mkdir(parents=True)
        for i in range(2):
            # the challenge mixes grayscale and RGB modalities
            if i == 0:
                raw = (rng.random((64, 64)) * 255).astype("uint8")
            else:
                raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
            lab = rng.integers(0, 4, (64, 64)).astype("uint8")
            Image.fromarray(raw).save(train / "images" / f"cell_{i:05d}.png")
            Image.fromarray(lab).save(train / "labels" / f"cell_{i:05d}_label.png")

        loader = get_neurips_cellseg_supervised_loader(
            str(tmp_path), "train", patch_shape=(32, 32), batch_size=2)
        x, y = next(iter(loader))
        # make_rgb=True: both modalities arrive as 3-channel
        assert x.shape == (2, 3, 32, 32)
        assert y.shape == (2, 1, 32, 32)

        unl = tmp_path / "release-part1"
        unl.mkdir()
        for i in range(2):
            raw = (rng.random((64, 64)) * 255).astype("uint8")
            Image.fromarray(raw).save(unl / f"unl_{i:05d}.png")
        uloader = get_neurips_cellseg_unsupervised_loader(
            str(tmp_path), patch_shape=(32, 32), batch_size=2)
        xu = next(iter(uloader))
        assert xu.shape == (2, 3, 32, 32)

    def test_gonuclear_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.light_microscopy.gonuclear import (
            get_gonuclear_loader, get_gonuclear_paths)

        rng = np.random.default_rng(13)
        data = tmp_path / "gonuclear_datasets"
        data.mkdir()
        for sample in ("1135", "1136"):
            with h5py.File(data / f"{sample}.h5", "w") as f:
                f.create_dataset("raw/cells", data=(rng.random((8, 48, 48)) * 255).astype("uint8"))
                f.create_dataset("raw/nuclei", data=(rng.random((8, 48, 48)) * 255).astype("uint8"))
                f.create_dataset("labels/cells", data=rng.integers(0, 4, (8, 48, 48)).astype("uint32"))
                f.create_dataset("labels/nuclei", data=rng.integers(0, 4, (8, 48, 48)).astype("uint32"))

        paths = get_gonuclear_paths(str(tmp_path), sample_ids=["1135"])
        assert len(paths) == 1
        for task in ("nuclei", "cells"):
            loader = get_gonuclear_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                          batch_size=1, segmentation_task=task,
                                          boundaries=True)
            x, y = next(iter(loader))
            assert x.shape == (1, 1, 4, 32, 32)
            assert y.shape[-3:] == (4, 32, 32)

    def test_orgasegment_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.orgasegment import (
            get_orgasegment_loader, get_orgasegment_paths)

        rng = np.random.default_rng(14)
        (tmp_path / "train").mkdir()
        for i in range(3):
            raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
            lab = rng.integers(0, 4, (64, 64)).astype("uint8")
            Image.fromarray(raw).save(tmp_path / "train" / f"org{i}_img.jpg")
            Image.fromarray(lab).save(tmp_path / "train" / f"org{i}_masks_organoid.png")

        image_paths, label_paths = get_orgasegment_paths(str(tmp_path), "train")
        assert len(image_paths) == len(label_paths) == 3
        loader = get_orgasegment_loader(str(tmp_path), patch_shape=(32, 32),
                                        batch_size=2, split="train", boundaries=True)
        x, y = next(iter(loader))
        assert x.shape[0] == 2 and x.shape[-2:] == (32, 32)
        assert y.shape == (2, 2, 32, 32)  # binary + boundary channels

    def test_omnipose_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.omnipose import (
            get_omnipose_loader, get_omnipose_paths)

        rng = np.random.default_rng(15)
        # bact_* layout: <choice>/train_sorted/<subfolder>/*.tif with *_masks.tif
        sub = tmp_path / "data" / "bact_phase" / "train_sorted" / "A22"
        sub.mkdir(parents=True)
        for i in range(2):
            raw = (rng.random((64, 64)) * 255).astype("uint8")
            lab = rng.integers(0, 4, (64, 64)).astype("uint8")
            Image.fromarray(raw).save(sub / f"img{i}.tif")
            Image.fromarray(lab).save(sub / f"img{i}_masks.tif")
        # worm layout: <choice>/train/* flat
        wsub = tmp_path / "data" / "worm" / "train"
        wsub.mkdir(parents=True)
        raw = (rng.random((64, 64)) * 255).astype("uint8")
        lab = rng.integers(0, 4, (64, 64)).astype("uint8")
        Image.fromarray(raw).save(wsub / "w0.png")
        Image.fromarray(lab).save(wsub / "w0_masks.png")

        image_paths, label_paths = get_omnipose_paths(
            str(tmp_path), "train", data_choice=["bact_phase", "worm"])
        assert len(image_paths) == len(label_paths) == 3
        loader = get_omnipose_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                     split="train", data_choice="bact_phase", binary=True)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape == (2, 1, 32, 32)

    def test_pannuke_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.histopathology.pannuke import (
            _convert_fold, get_pannuke_loader)

        rng = np.random.default_rng(16)
        fold_dir = tmp_path / "fold_1" / "Fold 1" / "images"
        fold_dir.mkdir(parents=True)
        n = 4
        np.save(fold_dir / "images.npy",
                (rng.random((n, 64, 64, 3)) * 255).astype("float64"))
        masks = np.zeros((n, 64, 64, 6), dtype="float64")
        # two instances in the first type channel, one in the second
        masks[:, 5:15, 5:15, 0] = 1
        masks[:, 20:30, 20:30, 0] = 2
        masks[:, 40:50, 40:50, 1] = 1
        # background channel (last) marks everything unlabeled
        masks[..., 5] = (masks[..., :5].sum(-1) == 0).astype("float64")
        np.save(fold_dir / "masks.npy", masks)

        h5_path = _convert_fold(str(tmp_path), "fold_1")
        with h5py.File(h5_path, "r") as f:
            assert f["images"].shape == (3, n, 64, 64)
            inst = f["labels/instances"][:]
            # offsetting makes instance ids unique across type channels
            assert inst.max() == 3
            assert f["labels/semantic"][:].max() == 5

        loader = get_pannuke_loader(str(tmp_path), patch_shape=(1, 32, 32), batch_size=2,
                                    folds=("fold_1",))
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 1, 32, 32)
        assert y.shape[0] == 2 and y.shape[-2:] == (32, 32)

    def test_axondeepseg_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.axondeepseg import (
            get_axondeepseg_loader, get_axondeepseg_paths)

        rng = np.random.default_rng(17)
        sem = tmp_path / "sem"
        sem.mkdir()
        for i in range(2):
            with h5py.File(sem / f"sem_data_{i}.h5", "w") as f:
                f.create_dataset("raw", data=(rng.random((64, 64)) * 255).astype("uint8"))
                f.create_dataset("labels", data=rng.integers(0, 3, (64, 64)).astype("uint8"))

        paths = get_axondeepseg_paths(str(tmp_path), "sem")
        assert len(paths) == 2
        loader = get_axondeepseg_loader(str(tmp_path), "sem", patch_shape=(32, 32),
                                        batch_size=2, one_hot_encoding=True)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape == (2, 3, 32, 32)  # one-hot axon/myelin/background

    def test_acdc_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.acdc import get_acdc_loader, get_acdc_paths
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(18)
        for pid in (1, 2):
            pdir = tmp_path / "ACDC" / "database" / "training" / f"patient{pid:03d}"
            pdir.mkdir(parents=True)
            for frame in (1, 12):
                save_nifti(str(pdir / f"patient{pid:03d}_frame{frame:02d}.nii.gz"),
                           rng.random((10, 48, 48)).astype("float32"))
                save_nifti(str(pdir / f"patient{pid:03d}_frame{frame:02d}_gt.nii.gz"),
                           rng.integers(0, 4, (10, 48, 48)).astype("uint8"))

        image_paths, gt_paths = get_acdc_paths(str(tmp_path), "train")
        assert len(image_paths) == len(gt_paths) == 4
        assert all("gt" not in os.path.basename(p) for p in image_paths)
        loader = get_acdc_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                 split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_lizard_layout(self, tmp_path):
        from PIL import Image
        from scipy.io import savemat

        from torch_em_tpu.data.datasets.histopathology.lizard import (
            _extract_images, get_lizard_loader, get_lizard_paths)

        rng = np.random.default_rng(19)
        # fabricate the raw kaggle layout: two image folders + mat labels + info.csv
        img_dir = tmp_path / "lizard_images1" / "Lizard_Images1"
        img_dir.mkdir(parents=True)
        lab_dir = tmp_path / "lizard_labels" / "Lizard_Labels" / "Labels"
        lab_dir.mkdir(parents=True)
        rows = ["Filename,Split"]
        for i, split_id in enumerate((1, 1, 2)):  # two train images, one val
            name = f"consep_{i}"
            raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(raw).save(img_dir / f"{name}.png")
            inst = rng.integers(0, 4, (64, 64)).astype("int32")
            savemat(str(lab_dir / f"{name}.mat"),
                    {"inst_map": inst, "class": np.array([[1], [2], [3]])})
            rows.append(f"{name},{split_id}")
        (tmp_path / "lizard_labels" / "Lizard_Labels" / "info.csv").write_text(
            "\n".join(rows) + "\n")

        _extract_images("train", str(img_dir), str(lab_dir), str(tmp_path))
        paths = get_lizard_paths(str(tmp_path), "train")
        assert len(paths) == 2

        loader = get_lizard_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                   split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)  # H&E RGB channels-first
        assert y.shape[-2:] == (32, 32)

    def test_cellpose_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.cellpose import get_cellpose_loader

        rng = np.random.default_rng(20)
        data_dir = tmp_path / "cyto" / "train"
        data_dir.mkdir(parents=True)
        for i in range(3):
            img = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(img).save(data_dir / f"{i:03d}_img.png")
            masks = rng.integers(0, 4, (64, 64)).astype("int32")
            Image.fromarray(masks, mode="I").save(data_dir / f"{i:03d}_masks.png")

        loader = get_cellpose_loader(str(tmp_path), split="train", patch_shape=(32, 32),
                                     batch_size=1, choice="cyto")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_nuc_mm_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.nuc_mm import get_nuc_mm_loader

        rng = np.random.default_rng(21)
        split_dir = tmp_path / "mouse" / "train"
        split_dir.mkdir(parents=True)
        with h5py.File(split_dir / "vol0.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels", data=rng.integers(0, 4, (8, 64, 64)).astype("uint64"))

        loader = get_nuc_mm_loader(str(tmp_path), "mouse", "train", patch_shape=(4, 32, 32),
                                   batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_sponge_em_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.sponge_em import get_sponge_em_loader

        rng = np.random.default_rng(22)
        # the download gate requires exactly three volumes
        for i in (1, 2, 3):
            with h5py.File(tmp_path / f"train_data_0{i}.h5", "w") as f:
                f.create_dataset("volumes/raw",
                                 data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
                f.create_dataset("volumes/labels/instances",
                                 data=rng.integers(0, 4, (8, 64, 64)).astype("uint64"))
                f.create_dataset("volumes/labels/semantic",
                                 data=rng.integers(0, 3, (8, 64, 64)).astype("uint64"))

        loader = get_sponge_em_loader(str(tmp_path), "instances", patch_shape=(4, 32, 32),
                                      batch_size=1, sample_ids=(1, 2))
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)

    def test_glas_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.histopathology.glas import get_glas_loader

        rng = np.random.default_rng(23)
        split_dir = tmp_path / "train"
        split_dir.mkdir()
        for i in range(2):
            with h5py.File(split_dir / f"train_{i}.h5", "w") as f:
                f.create_dataset("raw", data=(rng.random((3, 64, 64)) * 255).astype("uint8"))
                f.create_dataset("labels", data=rng.integers(0, 4, (64, 64)).astype("uint32"))

        loader = get_glas_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                 split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)  # H&E RGB channels-first
        assert y.shape[-2:] == (32, 32)

    def test_cpm_layout(self, tmp_path):
        from PIL import Image
        from scipy.io import savemat

        from torch_em_tpu.data.datasets.histopathology.cpm import get_cpm_loader

        rng = np.random.default_rng(24)
        img_dir = tmp_path / "cpm17" / "train" / "Images"
        lab_dir = tmp_path / "cpm17" / "train" / "Labels"
        img_dir.mkdir(parents=True)
        lab_dir.mkdir(parents=True)
        for i in range(2):
            img = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(img).save(img_dir / f"image_{i:02d}.png")
            savemat(str(lab_dir / f"image_{i:02d}.mat"),
                    {"inst_map": rng.integers(0, 4, (64, 64)).astype("int32")})

        # exercises the mat -> tif instance-label conversion
        loader = get_cpm_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                data_choice="cpm17", split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_tnbc_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.histopathology.tnbc import get_tnbc_loader

        rng = np.random.default_rng(25)
        data_dir = tmp_path / "preprocessed"
        data_dir.mkdir()
        for i in range(6):
            with h5py.File(data_dir / f"GT_{i:02d}.h5", "w") as f:
                f.create_dataset("raw", data=(rng.random((3, 64, 64)) * 255).astype("uint8"))
                f.create_dataset("labels/instances",
                                 data=rng.integers(0, 4, (64, 64)).astype("uint32"))
                f.create_dataset("labels/semantic",
                                 data=rng.integers(0, 2, (64, 64)).astype("uint32"))

        # creates the persistent random split csv on first use
        loader = get_tnbc_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                 split="train", label_choice="instances")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert (tmp_path / "tnbc_split.csv").exists()

    def test_cryonuseg_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.cryonuseg import get_cryonuseg_loader

        rng = np.random.default_rng(26)
        img_dir = tmp_path / "tissue images"
        lab_dir = tmp_path / "Annotator 1 (biologist)" / "label masks modify"
        img_dir.mkdir()
        lab_dir.mkdir(parents=True)
        for i in range(6):
            img = (rng.random((64, 64)) * 255).astype("uint8")
            Image.fromarray(img).save(img_dir / f"img_{i:02d}.tif")
            lab = rng.integers(0, 4, (64, 64)).astype("int32")
            Image.fromarray(lab, mode="I").save(lab_dir / f"img_{i:02d}.tif")

        loader = get_cryonuseg_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                      split="train", rater="b1")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_drive_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.drive import get_drive_loader

        rng = np.random.default_rng(27)
        img_dir = tmp_path / "training" / "images"
        man_dir = tmp_path / "training" / "1st_manual"
        img_dir.mkdir(parents=True)
        man_dir.mkdir()
        for i in range(2):
            img = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(img).save(img_dir / f"{21 + i}_training.tif")
            gt = (rng.random((64, 64)) > 0.5).astype("uint8") * 255
            Image.fromarray(gt).save(man_dir / f"{21 + i}_manual1.gif")

        # exercises the gif -> binary-tif ground-truth conversion
        loader = get_drive_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                  split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_montgomery_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.montgomery import get_montgomery_loader

        rng = np.random.default_rng(28)
        data_dir = tmp_path / "MontgomerySet"
        img_dir = data_dir / "CXR_png"
        left_dir = data_dir / "ManualMask" / "leftMask"
        right_dir = data_dir / "ManualMask" / "rightMask"
        for d in (img_dir, left_dir, right_dir):
            d.mkdir(parents=True)
        for i in range(2):
            name = f"MCUCXR_{i:04d}_0.png"
            img = (rng.random((64, 64)) * 255).astype("uint8")
            Image.fromarray(img).save(img_dir / name)
            left = np.zeros((64, 64), "uint8")
            left[:, :32] = 1
            right = np.zeros((64, 64), "uint8")
            right[:, 32:] = 1
            Image.fromarray(left).save(left_dir / name)
            Image.fromarray(right).save(right_dir / name)

        # exercises the left+right lung-mask merge and the resize trafo
        loader = get_montgomery_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_ctc_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.ctc import (
            get_ctc_segmentation_loader,
        )

        rng = np.random.default_rng(29)
        vol_dir = tmp_path / "train" / "DIC-C2DH-HeLa" / "01"
        seg_dir = tmp_path / "train" / "DIC-C2DH-HeLa" / "01_GT" / "SEG"
        vol_dir.mkdir(parents=True)
        seg_dir.mkdir(parents=True)
        for i in range(2):
            img = (rng.random((64, 64)) * 255).astype("uint8")
            Image.fromarray(img).save(vol_dir / f"t{i:03d}.tif")
            seg = rng.integers(0, 4, (64, 64)).astype("int32")
            Image.fromarray(seg, mode="I").save(seg_dir / f"man_seg{i:03d}.tif")

        loader = get_ctc_segmentation_loader(str(tmp_path), "DIC-C2DH-HeLa",
                                             patch_shape=(32, 32), batch_size=1,
                                             split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_busi_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.busi import get_busi_loader

        rng = np.random.default_rng(30)
        cat_dir = tmp_path / "Dataset_BUSI_with_GT" / "benign"
        cat_dir.mkdir(parents=True)
        for i in (1, 2):
            img = (rng.random((64, 64)) * 255).astype("uint8")
            Image.fromarray(img).save(cat_dir / f"benign ({i}).png")
            mask = (rng.random((64, 64)) > 0.5).astype("uint8") * 255
            Image.fromarray(mask).save(cat_dir / f"benign ({i})_mask.png")

        loader = get_busi_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                 category="benign")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_isic_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.isic import get_isic_loader

        rng = np.random.default_rng(31)
        img_dir = tmp_path / "ISIC2018_Task1-2_Training_Input"
        gt_dir = tmp_path / "ISIC2018_Task1_Training_GroundTruth"
        img_dir.mkdir()
        gt_dir.mkdir()
        for i in range(2):
            img = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(img).save(img_dir / f"ISIC_{i:07d}.jpg")
            gt = (rng.random((64, 64)) > 0.5).astype("uint8") * 255
            Image.fromarray(gt).save(gt_dir / f"ISIC_{i:07d}_segmentation.png")

        # resize_inputs=True default exercises the resize trafo on RGB input
        loader = get_isic_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                 split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_nuclick_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.nuclick import get_nuclick_loader

        rng = np.random.default_rng(32)
        img_dir = tmp_path / "IHC_nuclick" / "IHC" / "images" / "Train"
        mask_dir = tmp_path / "IHC_nuclick" / "IHC" / "masks" / "Train"
        img_dir.mkdir(parents=True)
        mask_dir.mkdir(parents=True)
        for i in range(2):
            img = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(img).save(img_dir / f"img_{i}.png")
            np.save(mask_dir / f"img_{i}.npy", rng.integers(0, 4, (64, 64)))

        # exercises the npy -> tif label conversion
        loader = get_nuclick_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                    split="Train")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_consep_layout(self, tmp_path):
        from PIL import Image
        from scipy.io import savemat

        from torch_em_tpu.data.datasets.histopathology.consep import get_consep_loader

        rng = np.random.default_rng(33)
        tile_dir = tmp_path / "data" / "consep" / "tiles"
        lab_dir = tmp_path / "data" / "consep" / "labels"
        tile_dir.mkdir(parents=True)
        lab_dir.mkdir(parents=True)
        # a 2x2 tile grid for one train image: stitching + seam merge
        for (y1, y2, x1, x2) in ((0, 224, 0, 224), (0, 224, 224, 448),
                                 (224, 448, 0, 224), (224, 448, 224, 448)):
            name = f"train_1_{y1}_{y2}_{x1}_{x2}"
            img = (rng.random((224, 224, 3)) * 255).astype("uint8")
            Image.fromarray(img).save(tile_dir / f"{name}.png")
            savemat(str(lab_dir / f"{name}.mat"),
                    {"instance_map": rng.integers(0, 3, (224, 224)).astype("int32")})

        loader = get_consep_loader(str(tmp_path), patch_shape=(64, 64), batch_size=1,
                                   split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 64, 64)  # H&E RGB channels-first
        assert y.shape[-2:] == (64, 64)

    def test_hpa_layout(self, tmp_path):
        import json as _json

        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.hpa import get_hpa_segmentation_loader

        rng = np.random.default_rng(34)
        annotation = {"features": [{"geometry": {
            "type": "Polygon",
            "coordinates": [[[10.0, 10.0], [50.0, 10.0], [50.0, 50.0], [10.0, 50.0]]],
        }}]}
        for split in ("train", "valid", "test"):
            img_dir = tmp_path / "hpa_dataset_v2" / split / "img0"
            img_dir.mkdir(parents=True)
            for chan in ("microtubules", "protein", "nuclei", "er"):
                chan_img = (rng.random((64, 64)) * 255).astype("uint8")
                Image.fromarray(chan_img).save(img_dir / f"{chan}.png")
            if split != "test":
                (img_dir / "annotation.json").write_text(_json.dumps(annotation))

        # exercises the 4-channel stacking and polygon rasterization
        loader = get_hpa_segmentation_loader(str(tmp_path), "train", patch_shape=(32, 32),
                                             batch_size=1, binary=True, n_workers_preproc=2)
        x, y = next(iter(loader))
        assert x.shape == (1, 4, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_bccd_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.bccd import get_bccd_loader

        rng = np.random.default_rng(35)
        raw_dir = tmp_path / "data" / "BCCD Dataset with mask" / "train" / "original"
        mask_dir = tmp_path / "data" / "BCCD Dataset with mask" / "train" / "mask"
        raw_dir.mkdir(parents=True)
        mask_dir.mkdir(parents=True)
        for i in range(2):
            img = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(img).save(raw_dir / f"img_{i}.png")
            mask = (rng.random((64, 64)) > 0.6).astype("uint8") * 255
            Image.fromarray(mask).save(mask_dir / f"img_{i}.png")

        # exercises the mask -> connected-component instance conversion
        loader = get_bccd_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                 split="train", label_choice="instances")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_vgg_hela_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.vgg_hela import get_vgg_hela_loader

        rng = np.random.default_rng(36)
        for split in ("train", "test"):
            img_dir = tmp_path / split / "images"
            lab_dir = tmp_path / split / "labels"
            img_dir.mkdir(parents=True)
            lab_dir.mkdir(parents=True)
            for i in (1, 2):
                img = (rng.random((64, 64)) * 255).astype("uint8")
                Image.fromarray(img).save(img_dir / f"im{i:02}.tif")
                points = np.zeros((64, 64), "uint8")
                points[rng.integers(0, 64, 5), rng.integers(0, 64, 5)] = 1
                Image.fromarray(points).save(lab_dir / f"im{i:02}.tif")

        loader = get_vgg_hela_loader(str(tmp_path), "train", patch_shape=(32, 32),
                                     batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_kvasir_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.kvasir import get_kvasir_loader

        rng = np.random.default_rng(37)
        img_dir = tmp_path / "Kvasir-SEG" / "images"
        mask_dir = tmp_path / "Kvasir-SEG" / "masks"
        img_dir.mkdir(parents=True)
        mask_dir.mkdir(parents=True)
        for i in range(2):
            img = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(img).save(img_dir / f"case_{i}.jpg")
            mask = np.where(rng.random((64, 64)) > 0.5, 255, 0).astype("uint8")
            Image.fromarray(np.stack([mask] * 3, -1)).save(mask_dir / f"case_{i}.jpg")

        # exercises the rgb-jpg mask binarization (mean >= 240 threshold)
        loader = get_kvasir_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_uwaterloo_skin_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.uwaterloo_skin import (
            get_uwaterloo_skin_loader,
        )

        rng = np.random.default_rng(38)
        case_dir = tmp_path / "set1_Data" / "skin_data" / "melanoma" / "case1"
        case_dir.mkdir(parents=True)
        for i in range(2):
            img = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(img).save(case_dir / f"p{i}_orig.jpg")
            gt = (rng.random((64, 64)) > 0.5).astype("uint8") * 255
            Image.fromarray(gt).save(case_dir / f"p{i}_contour.png")

        loader = get_uwaterloo_skin_loader(str(tmp_path), patch_shape=(32, 32),
                                           batch_size=1, chosen_set="set1")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_emps_layout(self, tmp_path):
        import zipfile

        from PIL import Image

        from torch_em_tpu.data.datasets.electron_microscopy.emps import get_emps_loader

        rng = np.random.default_rng(39)
        # fabricate the github archive as an actual zip: exercises the
        # download-gate skip (zip present), unzip, and csv-driven conversion
        src = tmp_path / "src" / "emps-main"
        (src / "images").mkdir(parents=True)
        (src / "segmaps").mkdir()
        names = ["p0.png", "p1.png"]
        for name in names:
            img = (rng.random((64, 64)) * 255).astype("uint8")
            Image.fromarray(img).save(src / "images" / name)
            seg = rng.integers(0, 4, (64, 64)).astype("int32")
            Image.fromarray(seg, mode="I").save(src / "segmaps" / name)
        for split in ("train", "test"):
            (src / f"{split}.csv").write_text("\n".join(names) + "\n")
        with zipfile.ZipFile(tmp_path / "emps.zip", "w") as zf:
            for p in src.rglob("*"):
                if p.is_file():
                    zf.write(p, p.relative_to(tmp_path / "src"))

        loader = get_emps_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                 split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_betaseg_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.betaseg import get_betaseg_loader

        rng = np.random.default_rng(40)
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        with h5py.File(data_dir / "vol0.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            for choice in ("mitochondria", "granules"):
                f.create_dataset(f"labels/{choice}",
                                 data=rng.integers(0, 3, (8, 64, 64)).astype("uint32"))

        loader = get_betaseg_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                    label_choice="mitochondria")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_jsrt_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.jsrt import get_jsrt_loader

        rng = np.random.default_rng(41)
        org_dir = tmp_path / "Segmentation01" / "train" / "org"
        lab_dir = tmp_path / "Segmentation01" / "train" / "label"
        org_dir.mkdir(parents=True)
        lab_dir.mkdir()
        # the other annotation set must exist too (choice=None reads both)
        seg2 = tmp_path / "segmentation02"
        (seg2 / "org_train").mkdir(parents=True)
        (seg2 / "label_train").mkdir()
        for i in range(2):
            img = (rng.random((64, 64)) * 255).astype("uint8")
            Image.fromarray(img).save(org_dir / f"case{i}.png")
            lab = rng.integers(0, 3, (64, 64)).astype("uint8")
            Image.fromarray(lab).save(lab_dir / f"case{i}.png")

        loader = get_jsrt_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                 split="train", choice="Segmentation01")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_lynsec_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.lynsec import get_lynsec_loader

        rng = np.random.default_rng(42)
        img_dir = tmp_path / "data" / "ihc" / "images"
        lab_dir = tmp_path / "data" / "ihc" / "labels"
        img_dir.mkdir(parents=True)
        lab_dir.mkdir(parents=True)
        for i in range(6):
            img = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(img).save(img_dir / f"{i}_l1.tif")
            lab = rng.integers(0, 4, (64, 64)).astype("int32")
            Image.fromarray(lab, mode="I").save(lab_dir / f"{i}_l1.tif")

        # creates the persistent random split csv on first use
        loader = get_lynsec_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                   split="train", choice="ihc")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_aimseg_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.electron_microscopy.aimseg import (
            get_aimseg_loader, get_aimseg_paths)

        rng = np.random.default_rng(43)
        for root in ("Control_Dataset", "Validation_Dataset_v1"):
            for sub in ("Images", "GroundTruth_Instance", "GroundTruth_Semantic"):
                (tmp_path / root / sub).mkdir(parents=True)
            for i in range(2):
                img = (rng.random((64, 64)) * 255).astype("uint8")
                Image.fromarray(img).save(tmp_path / root / "Images" / f"s{i}.tif")
                for sub in ("GroundTruth_Instance", "GroundTruth_Semantic"):
                    lab = rng.integers(0, 4, (64, 64)).astype("uint8")
                    Image.fromarray(lab).save(tmp_path / root / sub / f"s{i}.tif")

        raw_paths, label_paths = get_aimseg_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 4
        raw_paths, _ = get_aimseg_paths(str(tmp_path), split="control", targets="semantic")
        assert len(raw_paths) == 2

        loader = get_aimseg_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                   split="validation")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_axonem_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.axonem import get_axonem_loader

        rng = np.random.default_rng(44)
        for sample in ("human", "mouse"):
            (tmp_path / sample).mkdir()
            with h5py.File(tmp_path / sample / "im_0.h5", "w") as f:
                f.create_dataset("main", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            with h5py.File(tmp_path / sample / "seg_0.h5", "w") as f:
                f.create_dataset("main", data=rng.integers(1, 5, (8, 64, 64)).astype("uint64"))

        loader = get_axonem_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                   samples=("human", "mouse"))
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_deepict_actin_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.deepict import (
            get_deepict_actin_loader)

        rng = np.random.default_rng(45)
        (tmp_path / "deepict_actin").mkdir()
        # the processed-layout h5 files the portal download pipeline produces
        for ds in ("00004", "00012"):
            with h5py.File(tmp_path / "deepict_actin" / f"{ds}.h5", "w") as f:
                f.create_dataset("raw", data=rng.random((8, 64, 64)).astype("float32"))
                f.create_dataset("labels/actin",
                                 data=(rng.random((8, 64, 64)) > 0.7).astype("uint8"))

        loader = get_deepict_actin_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                          batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_densecell_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.densecell import (
            get_densecell_loader)

        rng = np.random.default_rng(46)
        for split in ("train", "val"):
            with h5py.File(tmp_path / f"densecell_{split}.h5", "w") as f:
                f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
                f.create_dataset("labels", data=rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        loader = get_densecell_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                      batch_size=1, split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_asem_layout(self, tmp_path):
        import json

        from torch_em_tpu.data.datasets.electron_microscopy.asem import get_asem_loader
        from torch_em_tpu.utils.io import write_data

        rng = np.random.default_rng(47)
        vol = tmp_path / "cell_1" / "cell_1.zarr"
        write_data(str(vol), "volumes/raw", (rng.random((8, 64, 64)) * 255).astype("uint8"))
        write_data(str(vol), "volumes/labels/mito",
                   (rng.random((8, 64, 64)) > 0.6).astype("uint8"))

        loader = get_asem_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                 organelles="mito", volume_ids="cell_1")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

        # an inconsistent volume (labels are an offset crop of the raw): the
        # loader must crop the raw to the label bounding box via .zattrs offsets
        vol6 = tmp_path / "cell_6" / "cell_6.zarr"
        write_data(str(vol6), "volumes/raw", (rng.random((12, 64, 64)) * 255).astype("uint8"))
        write_data(str(vol6), "volumes/labels/mito",
                   (rng.random((8, 48, 48)) > 0.6).astype("uint8"))
        with open(vol6 / "volumes" / "raw" / ".zattrs", "w") as f:
            json.dump({"offset": [0, 0, 0], "resolution": [1, 1, 1]}, f)
        with open(vol6 / "volumes" / "labels" / "mito" / ".zattrs", "w") as f:
            json.dump({"offset": [2, 8, 8], "resolution": [1, 1, 1]}, f)

        loader = get_asem_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                 organelles="mito", volume_ids="cell_6")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert (vol6 / "volumes" / "raw_mito").exists()

    def test_astih_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.astih import get_astih_loader

        rng = np.random.default_rng(48)
        (tmp_path / "TEM1" / "train").mkdir(parents=True)
        for i in range(2):
            with h5py.File(tmp_path / "TEM1" / "train" / f"s{i}.h5", "w") as f:
                f.create_dataset("raw", data=(rng.random((64, 64)) * 255).astype("uint8"))
                f.create_dataset("labels", data=rng.integers(0, 3, (64, 64)).astype("uint8"))

        # one-hot class selection (myelin + axon channels)
        loader = get_astih_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                  name="TEM1", split="train",
                                  label_classes=("myelin", "axon"))
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32)
        assert y.shape == (1, 2, 32, 32)

    @staticmethod
    def _save_stack(path, vol):
        from PIL import Image

        frames = [Image.fromarray(sl) for sl in vol]
        frames[0].save(path, save_all=True, append_images=frames[1:])

    def test_cem_mitolab_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.electron_microscopy.cem import get_mitolab_loader

        rng = np.random.default_rng(49)
        for ds in ("dataset_a", "dataset_b"):
            for sub in ("images", "masks"):
                (tmp_path / "11037" / "cem_mitolab" / ds / sub).mkdir(parents=True)
            for i in range(4):
                img = (rng.random((64, 64)) * 255).astype("uint8")
                Image.fromarray(img).save(
                    tmp_path / "11037" / "cem_mitolab" / ds / "images" / f"p{i}.tiff")
                # patch 0 of dataset_a is empty: must be discarded by the cache
                lab = np.zeros((64, 64), dtype="uint8") if (ds, i) == ("dataset_a", 0) \
                    else rng.integers(0, 3, (64, 64)).astype("uint8")
                Image.fromarray(lab).save(
                    tmp_path / "11037" / "cem_mitolab" / ds / "masks" / f"p{i}.tiff")

        loader = get_mitolab_loader(str(tmp_path), split="train", batch_size=2,
                                    patch_shape=(32, 32), val_fraction=0.2)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        # the empty patch was filtered and the filter result cached
        assert (tmp_path / "11037" / "cem_mitolab" / "non_empty_images.json").exists()

    def test_cem_benchmark_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.electron_microscopy.cem import get_benchmark_loader

        rng = np.random.default_rng(50)
        ds_dir = tmp_path / "10982" / "data" / "mito_benchmarks" / "c_elegans"
        ds_dir.mkdir(parents=True)
        self._save_stack(ds_dir / "c_elegans_em.tif",
                         (rng.random((8, 64, 64)) * 255).astype("uint8"))
        self._save_stack(ds_dir / "c_elegans_mito.tif",
                         rng.integers(0, 3, (8, 64, 64)).astype("uint8"))

        loader = get_benchmark_loader(str(tmp_path), dataset_id=1,
                                      patch_shape=(4, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_emneuron_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.electron_microscopy.emneuron import get_emneuron_loader

        rng = np.random.default_rng(51)
        sub = tmp_path / "labeled" / "modality_x"
        sub.mkdir(parents=True)
        self._save_stack(sub / "vol0.tif", (rng.random((8, 64, 64)) * 255).astype("uint8"))
        self._save_stack(sub / "vol0_MaskIns.tif",
                         rng.integers(0, 5, (8, 64, 64)).astype("uint16"))
        val = tmp_path / "valid" / "modality_x" / "vol0"
        val.mkdir(parents=True)
        self._save_stack(val / "raw.tif", (rng.random((8, 64, 64)) * 255).astype("uint8"))
        self._save_stack(val / "label.tif", rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        for split in ("train", "val"):
            loader = get_emneuron_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                         batch_size=1, split=split)
            x, y = next(iter(loader))
            assert x.shape == (1, 1, 4, 32, 32)
            assert y.shape[-3:] == (4, 32, 32)

    def test_fib25_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.fib25 import get_fib25_loader

        rng = np.random.default_rng(52)
        sample_dir = tmp_path / "training_sample2"
        sample_dir.mkdir()
        with h5py.File(sample_dir / "raw.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
        stack = rng.integers(1, 6, (8, 64, 64)).astype("uint64")
        # supervoxel -> body id table: map everything onto two bodies
        transforms = np.array([[1, 10], [2, 10], [3, 20], [4, 20], [5, 20]],
                              dtype="uint64")
        with h5py.File(sample_dir / "groundtruth.h5", "w") as f:
            f.create_dataset("stack", data=stack)
            f.create_dataset("transforms", data=transforms)

        loader = get_fib25_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                  boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)
        # the transforms table was applied and cached as neuron_ids
        with h5py.File(sample_dir / "groundtruth.h5", "r") as f:
            ids = set(np.unique(f["neuron_ids"][:]).tolist())
        assert ids <= {0, 10, 20}

    def test_fafb_nuclei_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.fafb_nuclei import (
            get_fafb_nuclei_loader)

        rng = np.random.default_rng(53)
        (tmp_path / "train").mkdir()
        with h5py.File(tmp_path / "train" / "block0.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels/nuclei",
                             data=rng.integers(0, 4, (8, 64, 64)).astype("uint32"))

        loader = get_fafb_nuclei_loader(str(tmp_path), split="train",
                                        patch_shape=(4, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_hemibrain_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.hemibrain import (
            DEFAULT_BOUNDING_BOX, _bbox_to_str, get_hemibrain_loader)

        rng = np.random.default_rng(54)
        # the cached-subvolume layout the streaming download produces
        with h5py.File(tmp_path / f"neurons_{_bbox_to_str(DEFAULT_BOUNDING_BOX)}.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels", data=rng.integers(1, 5, (8, 64, 64)).astype("uint64"))

        loader = get_hemibrain_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                      boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_human_organoids_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.electron_microscopy.human_organoids import (
            get_human_organoids_loader, get_human_organoids_paths)
        from torch_em_tpu.utils.medical_io import save_mrc

        rng = np.random.default_rng(55)
        root = tmp_path / "11380"
        root.mkdir()
        raw = (rng.random((8, 64, 64)) * 255).astype("float32")
        save_mrc(str(root / "tomo1_bin2.mrc"), raw)
        save_mrc(str(root / "tomo1_bin2_mitos.mrc"),
                 (rng.random((8, 64, 64)) > 0.7).astype("float32"))
        # the outlier naming case: *_cell maps to the entotic_cell organelle
        save_mrc(str(root / "tomo1_bin2_cell.mrc"),
                 (rng.random((8, 64, 64)) > 0.7).astype("float32"))

        paths = get_human_organoids_paths(str(tmp_path), "entotic_cell")
        assert len(paths) == 1
        # the mrcs were merged into one h5 and removed
        assert not list(root.glob("*.mrc"))

        loader = get_human_organoids_loader(str(tmp_path), "mitos",
                                            patch_shape=(4, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_humanneurons_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.humanneurons import (
            DEFAULT_BOUNDING_BOX, _bbox_to_str, get_humanneurons_loader)

        rng = np.random.default_rng(56)
        with h5py.File(tmp_path / f"humanneurons_{_bbox_to_str(DEFAULT_BOUNDING_BOX)}.h5",
                       "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels", data=rng.integers(1, 5, (8, 64, 64)).astype("uint64"))

        loader = get_humanneurons_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                         batch_size=1, boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_hydra_vulgaris_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.hydra_vulgaris import (
            HYDRA_BOUNDING_BOXES, _bbox_to_str, get_hydra_loader)

        rng = np.random.default_rng(57)
        with h5py.File(tmp_path / f"hydra_{_bbox_to_str(HYDRA_BOUNDING_BOXES[0])}.h5",
                       "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels", data=rng.integers(1, 5, (8, 64, 64)).astype("uint64"))

        loader = get_hydra_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)

    def test_mitoemv2_layout(self, tmp_path):
        import json

        from torch_em_tpu.data.datasets.electron_microscopy.mitoemv2 import (
            get_mitoemv2_loader, get_mitoemv2_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(58)
        ds_dir = tmp_path / "Dataset001_ME2-Beta"
        (ds_dir / "imagesTr").mkdir(parents=True)
        (ds_dir / "labelsTr").mkdir()
        with open(ds_dir / "split.json", "w") as f:
            json.dump([{"train": ["me2-beta_train01"], "val": []}], f)
        # nifti loads transpose to zyx inside the converter; fabricate xyz
        save_nifti(str(ds_dir / "imagesTr" / "me2-beta_train01_0000.nii.gz"),
                   (rng.random((64, 64, 8)) * 255).astype("uint8"))
        save_nifti(str(ds_dir / "labelsTr" / "me2-beta_train01.nii.gz"),
                   rng.integers(0, 3, (64, 64, 8)).astype("uint16"))

        paths = get_mitoemv2_paths(str(tmp_path), datasets="beta", split="train")
        assert len(paths) == 1 and paths[0].endswith(".n5")

        loader = get_mitoemv2_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                     datasets="beta", split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_malecns_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.malecns import (
            DEFAULT_BOUNDING_BOX, _bbox_to_str, get_malecns_loader)

        rng = np.random.default_rng(59)
        with h5py.File(tmp_path / f"{_bbox_to_str(DEFAULT_BOUNDING_BOX)}.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels", data=rng.integers(1, 5, (8, 64, 64)).astype("uint64"))

        loader = get_malecns_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)

    def test_manc_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.manc import (
            DEFAULT_BOUNDING_BOX, _bbox_to_str, get_manc_loader)

        rng = np.random.default_rng(60)
        with h5py.File(tmp_path / f"{_bbox_to_str(DEFAULT_BOUNDING_BOX)}.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels", data=rng.integers(1, 5, (8, 64, 64)).astype("uint64"))

        loader = get_manc_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                 boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_mousecc_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.electron_microscopy.mousecc import get_mousecc_loader
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(61)
        # the manually downloaded nifti quadruple; (x, y, z) on disk
        save_nifti(str(tmp_path / "datac.nii"), (rng.random((64, 64, 8)) * 255).astype("uint8"))
        save_nifti(str(tmp_path / "maskc.nii"), (rng.random((64, 64, 8)) > 0.5).astype("uint8"))
        save_nifti(str(tmp_path / "myelin_mask.nii"),
                   (rng.random((64, 64, 8)) > 0.5).astype("uint8"))
        save_nifti(str(tmp_path / "fibers.nii"), rng.integers(0, 5, (64, 64, 8)).astype("uint32"))

        for label_choice in ("myelin", "fibers"):
            loader = get_mousecc_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                        label_choice=label_choice)
            x, y = next(iter(loader))
            assert x.shape == (1, 1, 4, 32, 32)
            assert y.shape[-3:] == (4, 32, 32)

    def test_probtem_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.electron_microscopy.probtem import get_probtem_loader

        rng = np.random.default_rng(62)
        root = tmp_path / "Deeppi-EM" / "mitoseg_deploy" / "datasets" / "Skeletal_muscle"
        (root / "train" / "input").mkdir(parents=True)
        (root / "train" / "target").mkdir()
        for i in range(2):
            img = (rng.random((64, 64)) * 255).astype("uint8")
            Image.fromarray(img).save(root / "train" / "input" / f"x_{i}.tif")
            lab = (rng.random((64, 64)) * 255).astype("uint8")
            Image.fromarray(lab).save(root / "train" / "target" / f"y_{i}.png")

        loader = get_probtem_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                    split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32)
        assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}

    def test_synapseweb_hippocampus_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.synapseweb_hippocampus import (
            get_synapseweb_hippocampus_loader)

        rng = np.random.default_rng(63)
        with h5py.File(tmp_path / "synapseweb_hippocampus_spine.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((10, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels", data=rng.integers(1, 5, (10, 64, 64)).astype("uint64"))

        # the default DENSE_ROI exceeds this fixture; override with a fitting one
        loader = get_synapseweb_hippocampus_loader(
            str(tmp_path), patch_shape=(4, 32, 32), batch_size=1, regions=("spine",),
            rois={"spine": np.s_[1:9, 8:60, 8:60]})
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_wildenberg_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.wildenberg import (
            DEFAULT_BOUNDING_BOX, _bbox_to_str, get_wildenberg_loader)

        rng = np.random.default_rng(64)
        name = f"p14_psd_{_bbox_to_str(DEFAULT_BOUNDING_BOX)}.h5"
        with h5py.File(tmp_path / name, "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels", data=rng.integers(0, 3, (8, 64, 64)).astype("uint64"))

        loader = get_wildenberg_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                       experiment="p14", labels="psd")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)

    def test_nisb_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.electron_microscopy import nisb
        from torch_em_tpu.utils.io import write_data

        rng = np.random.default_rng(65)
        # cached layout: <setting>/<split>/seed<i>/data.zarr with img/seg keys
        store = tmp_path / "base" / "val" / "seed0" / "data.zarr"
        write_data(str(store), "img", (rng.random((16, 64, 64)) * 255).astype("uint8"))
        write_data(str(store), "seg", rng.integers(1, 5, (16, 64, 64)).astype("uint16"))

        loader = nisb.get_nisb_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                      setting="base", split="val", boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

        # the streaming cube writer itself, driven from an in-memory v2-like source
        class FakeV2:
            def __init__(self, arr):
                self._arr = arr
                self.shape, self.ndim = arr.shape, arr.ndim

            def __getitem__(self, idx):
                return self._arr[idx]

        img_xyz = (rng.random((48, 40, 32, 1)) * 255).astype("uint8")  # (x, y, z, 1)
        seg_xyz = rng.integers(1, 7, (48, 40, 32)).astype("uint16")
        out = tmp_path / "base" / "val" / "seed1" / "data.zarr"
        out.parent.mkdir(parents=True)
        nisb._nisb_write_cube({"img": FakeV2(img_xyz), "seg": FakeV2(seg_xyz)}, str(out))
        from torch_em_tpu.utils.io import load_data
        img_back = np.asarray(load_data(str(out), "img")[:])
        assert img_back.shape == (32, 40, 48)
        np.testing.assert_array_equal(img_back, img_xyz[..., 0].transpose(2, 1, 0))
        seg_back = np.asarray(load_data(str(out), "seg")[:])
        np.testing.assert_array_equal(seg_back, seg_xyz.transpose(2, 1, 0))

    def test_waenet_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.waenet import get_waenet_loader

        rng = np.random.default_rng(66)
        out_dir = tmp_path / "dataset_3"
        out_dir.mkdir()
        # the preprocessed per-image h5 layout (one binary mask per class)
        with h5py.File(out_dir / "im0.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((64, 64)) * 255).astype("uint8"))
            lab = rng.integers(0, 4, (64, 64))
            for idx, name in enumerate(("background", "cytoplasm", "nucleus", "mitochondria")):
                f.create_dataset(f"labels/{name}", data=(lab == idx).astype("uint8"))

        loader = get_waenet_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                   dataset_id=3, label_type="mitochondria")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_zebrafinch_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.zebrafinch import (
            DEFAULT_BOUNDING_BOX, _bbox_to_str, get_zebrafinch_loader)

        rng = np.random.default_rng(67)
        with h5py.File(tmp_path / f"j0126_{_bbox_to_str(DEFAULT_BOUNDING_BOX)}.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels", data=rng.integers(1, 5, (8, 64, 64)).astype("uint64"))

        loader = get_zebrafinch_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                       dataset="j0126", boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)

    def test_microns_zenodo_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.microns import (
            get_microns_loader, get_microns_paths)

        rng = np.random.default_rng(68)
        (tmp_path / "pinky").mkdir()
        with h5py.File(tmp_path / "pinky" / "em0.h5", "w") as f:
            f.create_dataset("volumes/image",
                             data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("volumes/segmentation",
                             data=rng.integers(1, 5, (8, 64, 64)).astype("uint64"))
            f.create_dataset("volumes/mitochondria",
                             data=rng.integers(0, 3, (8, 64, 64)).astype("uint64"))
        # a volume with mismatched shapes must be skipped by the path helper
        with h5py.File(tmp_path / "pinky" / "em1.h5", "w") as f:
            f.create_dataset("volumes/image",
                             data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("volumes/segmentation",
                             data=rng.integers(1, 5, (4, 32, 32)).astype("uint64"))

        paths = get_microns_paths(str(tmp_path), ["pinky"], download=False)
        assert len(paths) == 1

        for label_choice in ("neuron", "mitochondria"):
            loader = get_microns_loader(str(tmp_path), batch_size=1,
                                        patch_shape=(4, 32, 32), volumes=["pinky"],
                                        label_choice=label_choice, boundaries=True)
            x, y = next(iter(loader))
            assert x.shape == (1, 1, 4, 32, 32)

    def test_microns_minnie65_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.microns import (
            MINNIE65_BOUNDING_BOXES, _minnie65_bbox_to_str, get_microns_minnie65_loader)

        rng = np.random.default_rng(69)
        bbox = MINNIE65_BOUNDING_BOXES["val"][0]
        with h5py.File(tmp_path / f"minnie65_{_minnie65_bbox_to_str(bbox)}.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("labels", data=rng.integers(1, 5, (8, 64, 64)).astype("uint64"))

        loader = get_microns_minnie65_loader(str(tmp_path), batch_size=1,
                                             patch_shape=(4, 32, 32),
                                             bounding_boxes=[bbox])
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)

    def test_cellmap_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.electron_microscopy.cellmap import (
            get_cellmap_loader, get_cellmap_paths)

        rng = np.random.default_rng(70)
        crops_dir = tmp_path / "data_crops"
        crops_dir.mkdir()
        # the cached crop layout (raw + per-organelle labels, -1 padding)
        for crop_id, organelles in ((234, ("all", "mito")), (235, ("all",))):
            with h5py.File(crops_dir / f"crop_{crop_id}.h5", "w") as f:
                f.attrs["scale"] = [8.0, 8.0, 8.0]
                f.create_dataset("raw_crop",
                                 data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
                for org in organelles:
                    lab = rng.integers(0, 4, (8, 64, 64)).astype("int16")
                    lab[:, :4] = -1  # unannotated padding shell
                    f.create_dataset(f"label_crop/{org}", data=lab)

        # organelle filtering: only crop 234 carries mito labels
        paths = get_cellmap_paths(str(tmp_path), organelles="mito", crops=[234, 235])
        assert len(paths) == 1 and paths[0].endswith("crop_234.h5")

        loader = get_cellmap_loader(str(tmp_path), batch_size=1, patch_shape=(4, 32, 32),
                                    organelles=None, crops=[234, 235])
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_bcss_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.bcss import (
            get_bcss_loader, get_bcsss_paths)

        rng = np.random.default_rng(71)
        # the git-repo layout: flat images/ + masks/ sorted into train/test
        (tmp_path / "images").mkdir()
        (tmp_path / "masks").mkdir()
        for i in range(5):
            raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
            lab = rng.integers(0, 5, (64, 64)).astype("uint8")
            Image.fromarray(raw).save(tmp_path / "images" / f"TCGA-XX-{i}.png")
            Image.fromarray(lab).save(tmp_path / "masks" / f"TCGA-XX-{i}.png")

        # no fabricated slide is in the held-out TEST_LIST -> all go to train
        tr_im, tr_lb = get_bcsss_paths(str(tmp_path), split="train", val_fraction=0.2)
        va_im, _ = get_bcsss_paths(str(tmp_path), split="val", val_fraction=0.2)
        assert len(tr_im) == len(tr_lb) == 4 and len(va_im) == 1

        loader = get_bcss_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                 split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_conic_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.histopathology.conic import get_conic_loader

        rng = np.random.default_rng(72)
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        # two cohorts x five sources x two patches each (the stratified
        # source-level splitter needs >= 2 sources per cohort in the test fold)
        names = [f"{c}_{s}-{i}" for c in ("consep", "crag")
                 for s in range(5) for i in range(2)]
        with open(data_dir / "patch_info.csv", "w") as f:
            f.write("patch_info\n" + "\n".join(names) + "\n")
        n = len(names)
        np.save(data_dir / "images.npy", (rng.random((n, 32, 32, 3)) * 255).astype("uint8"))
        labels = np.zeros((n, 32, 32, 2), dtype="int32")
        labels[:, 4:12, 4:12, 0] = 1  # instance channel
        labels[:, 4:12, 4:12, 1] = 2  # semantic channel
        np.save(data_dir / "labels.npy", labels)

        loader = get_conic_loader(str(tmp_path), patch_shape=(1, 16, 16), batch_size=2,
                                  split="train", label_choice="instances")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 16, 16)  # ndim=2 squeezes the stack axis
        assert y.shape[-2:] == (16, 16)
        with h5py.File(data_dir / "train.h5", "r") as f:
            assert f["raw"].shape[0] == 3  # (C, B, H, W)
            assert f["labels/instances"].shape[1:] == (32, 32)

    def test_glysac_layout(self, tmp_path):
        from PIL import Image
        from scipy.io import savemat

        from torch_em_tpu.data.datasets.histopathology.glysac import (
            get_glysac_loader, get_glysac_paths)

        rng = np.random.default_rng(73)
        data_dir = tmp_path / "glysac_dataset"
        for folder in ("Train", "Test"):
            (data_dir / folder / "Images").mkdir(parents=True)
            (data_dir / folder / "Labels").mkdir(parents=True)
            for i in range(2):
                raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
                Image.fromarray(raw).save(data_dir / folder / "Images" / f"im{i}.png")
                savemat(data_dir / folder / "Labels" / f"im{i}.mat",
                        {"inst_map": rng.integers(0, 4, (64, 64)).astype("float64"),
                         "type_map": rng.integers(0, 3, (64, 64)).astype("float64")})

        paths = get_glysac_paths(str(tmp_path), split="train")
        assert len(paths) == 2 and all(p.endswith(".h5") for p in paths)

        loader = get_glysac_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                   split="train", label_choice="instances")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_nuinsseg_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.nuinsseg import (
            get_nuinsseg_loader, get_nuinsseg_paths)

        rng = np.random.default_rng(74)
        for organ in ("human liver", "mouse spleen"):
            im_dir = tmp_path / "data" / organ / "tissue images"
            lb_dir = tmp_path / "data" / organ / "label masks modify"
            im_dir.mkdir(parents=True)
            lb_dir.mkdir(parents=True)
            for i in range(2):
                raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
                lab = rng.integers(0, 4, (64, 64)).astype("int32")
                Image.fromarray(raw).save(im_dir / f"{organ}_{i}.png")
                Image.fromarray(lab, mode="I").save(lb_dir / f"{organ}_{i}.tif")

        raw_paths, label_paths = get_nuinsseg_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 4

        loader = get_nuinsseg_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_srsanet_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.histopathology.srsanet import (
            _preprocess_labels, get_srsanet_loader, get_srsanet_paths)

        rng = np.random.default_rng(75)
        from PIL import Image

        data_dir = tmp_path / "IHC_TMA_dataset"
        (data_dir / "images").mkdir(parents=True)
        (data_dir / "masks").mkdir()
        for fold in ("fold1", "fold2"):
            for i in range(2):
                raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
                Image.fromarray(raw).save(data_dir / "images" / f"{fold}_{i}.png")
                # two binary channels: positive / negative nuclei
                mask = np.zeros((2, 64, 64), dtype="uint8")
                mask[0, 5:15, 5:15] = 1
                mask[1, 30:40, 30:40] = 1
                np.save(data_dir / "masks" / f"{fold}_{i}.npy", mask)
        _preprocess_labels(str(data_dir))

        raw_paths, label_paths = get_srsanet_paths(str(tmp_path), split="train")
        assert len(raw_paths) == len(label_paths) == 2

        loader = get_srsanet_loader(str(tmp_path), patch_shape=(64, 64), batch_size=2,
                                    split="train", boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 64, 64)
        assert y.shape == (2, 2, 64, 64)  # binary fg + boundaries

    def test_janowczyk_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.janowczyk import (
            get_janowczyk_loader, get_janowczyk_paths)

        rng = np.random.default_rng(76)
        # tubule annotation set: flat dir of image.tif + image_anno.bmp pairs
        data_dir = tmp_path / "data" / "tubule"
        data_dir.mkdir(parents=True)
        for i in range(2):
            raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
            lab = (rng.random((64, 64)) > 0.5).astype("uint8") * 255
            Image.fromarray(raw).save(data_dir / f"im{i}.bmp")
            Image.fromarray(lab).save(data_dir / f"im{i}_anno.bmp")

        raw_paths, label_paths = get_janowczyk_paths(str(tmp_path), annotation="tubule")
        assert len(raw_paths) == len(label_paths) == 2
        assert not any("_anno" in p for p in raw_paths)

        loader = get_janowczyk_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                      annotation="tubule")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_cytodark0_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.cytodark0 import (
            _preprocess_images, get_cytodark0_loader, get_cytodark0_paths)

        rng = np.random.default_rng(77)
        raw_root = tmp_path / "cytoDArk0"
        for mag, res in (("20x", "1024x1024"), ("40x", "2048x2048")):
            base = raw_root / mag / res
            for sub in ("image", "label", "graymask4"):
                (base / sub).mkdir(parents=True)
            rows = ["img_id,fold"]
            for i, fold in enumerate((0, 1, 2)):
                name = f"{mag}_im{i}"
                raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
                Image.fromarray(raw).save(base / "image" / f"{name}.png")
                Image.fromarray(rng.integers(0, 4, (64, 64)).astype("int32"),
                                mode="I").save(base / "label" / f"{name}.tiff")
                Image.fromarray(rng.integers(0, 3, (64, 64)).astype("uint8")
                                ).save(base / "graymask4" / f"{name}.png")
                rows.append(f"{name},{fold}")
            (base / "folds.csv").write_text("\n".join(rows) + "\n")
        _preprocess_images(str(tmp_path), str(raw_root))

        paths = get_cytodark0_paths(str(tmp_path), split="train")
        assert len(paths) == 2  # one 20x + one 40x image in fold 0
        paths_20x = get_cytodark0_paths(str(tmp_path), split="train", magnification="20x")
        assert len(paths_20x) == 1

        loader = get_cytodark0_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                      split="train", label_choice="instances")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_monusac_layout(self, tmp_path):
        import zipfile

        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.monusac import (
            get_monusac_loader, get_monusac_paths)

        rng = np.random.default_rng(78)
        xml = """<?xml version="1.0"?>
        <Annotations><Annotation><Regions><Region>
            <Vertices>
                <Vertex X="4" Y="4"/><Vertex X="20" Y="4"/>
                <Vertex X="20" Y="20"/><Vertex X="4" Y="20"/>
            </Vertices>
        </Region></Regions></Annotation></Annotations>"""
        # the raw challenge layout: per-patient folders of tif + xml in a zip
        src = tmp_path / "src"
        for patient in ("TCGA-55-1594-01Z-00-DX1", "TCGA-5P-A9K0-01Z-00-DX1"):
            pdir = src / "MoNuSAC_images_and_annotations" / patient
            pdir.mkdir(parents=True)
            raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(raw).save(pdir / f"{patient}_1.tif")
            (pdir / f"{patient}_1.xml").write_text(xml)
        with zipfile.ZipFile(tmp_path / "monusac_train.zip", "w") as zf:
            for p in sorted(src.rglob("*")):
                if p.is_file():
                    zf.write(p, p.relative_to(src))

        image_paths, label_paths = get_monusac_paths(str(tmp_path), split="train")
        assert len(image_paths) == len(label_paths) == 2
        # organ filtering by the published patient lists
        lung_im, _ = get_monusac_paths(str(tmp_path), split="train", organ_type=["lung"])
        assert len(lung_im) == 1 and "TCGA-55-1594" in lung_im[0]

        loader = get_monusac_loader(str(tmp_path), patch_shape=(64, 64), batch_size=2,
                                    split="train", binary=True)
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 64, 64)
        assert y.shape == (2, 1, 64, 64)
        assert y.max() == 1  # the rasterized xml rectangle

    def test_panoptils_layout(self, tmp_path):
        from io import BytesIO

        import pandas as pd
        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.panoptils import (
            get_panoptils_loader, get_panoptils_paths)

        rng = np.random.default_rng(79)

        def _png(arr, mode=None):
            buf = BytesIO()
            Image.fromarray(arr, mode=mode).save(buf, format="PNG")
            return buf.getvalue()

        rows = []
        for _ in range(2):
            img = (rng.random((64, 64, 3)) * 255).astype("uint8")
            inst = np.zeros((64, 64), dtype="int32")
            inst[5:15, 5:15] = 1
            inst[30:40, 30:40] = 2
            ntype = (inst > 0).astype("uint8")
            sem = rng.integers(0, 3, (64, 64)).astype("uint8")
            rows.append({"image": _png(img), "inst": _png(inst, mode="I"),
                         "type": _png(ntype), "sem": _png(sem)})
        pd.DataFrame(rows).to_parquet(tmp_path / "panoptils_refined.parquet")

        image_paths, label_paths = get_panoptils_paths(str(tmp_path), "instances")
        assert len(image_paths) == len(label_paths) == 2
        for choice in ("type", "semantic"):
            ip, lp = get_panoptils_paths(str(tmp_path), choice)
            assert len(ip) == len(lp) == 2

        loader = get_panoptils_loader(str(tmp_path), patch_shape=(64, 64), batch_size=2,
                                      label_choice="instances")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 64, 64)
        assert y.shape[0] == 2 and y.shape[-2:] == (64, 64)

    def test_orion_crc_layout(self, tmp_path):
        import h5py
        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.orion_crc import (
            get_orion_crc_loader, get_orion_crc_paths)

        rng = np.random.default_rng(80)
        tiles = tmp_path / "tiles"
        tiles.mkdir()
        meta_rows = ["slide_name,image_path,target_path,nuclei_path"]
        for t, (ox, oy) in enumerate(((100, 200), (164, 200))):
            stem = f"slideA_{ox}_{oy}_0_64_64"
            he = (rng.random((64, 64, 3)) * 255).astype("uint8")
            mif = (rng.random((64, 64)) * 255).astype("uint8")
            nuclei = np.zeros((64, 64), dtype="uint16")
            nuclei[3:8, 3:8] = 1
            nuclei[20:30, 20:30] = 2
            Image.fromarray(he).save(tiles / f"{stem}_he.png")
            Image.fromarray(mif).save(tiles / f"{stem}_mif.png")
            Image.fromarray(nuclei).save(tiles / f"{stem}_nuclei.png")
            meta_rows.append(f"slideA.ome.tiff,tiles/{stem}_he.png,"
                             f"tiles/{stem}_mif.png,tiles/{stem}_nuclei.png")
        for split in ("train", "val", "test"):
            (tmp_path / f"{split}_dataframe.csv").write_text("\n".join(meta_rows) + "\n")
        # per-slide cell table -> semantic labels (cell at tile-local (5, 5))
        (tmp_path / "cells_slideA.csv").write_text(
            "cell_type,x,y\ntumor,105,205\nlymphocyte,125,225\n")
        (tmp_path / "slide_dataframe.csv").write_text(
            "slide_name,orion_slide_id,nuclei_csv_path\n"
            "slideA.ome.tiff,slideA,cells_slideA.csv\n")

        paths = get_orion_crc_paths(str(tmp_path), split="train")
        assert len(paths) == 1 and paths[0].endswith("slideA.h5")
        with h5py.File(paths[0], "r") as f:
            assert f["raw/he"].shape == (3, 2, 64, 64)
            assert f["raw/mif"].shape == (1, 2, 64, 64)
            assert f["labels/nucleus/instances"].shape == (2, 64, 64)
            sem = f["labels/nucleus/semantic"][:]
        # instance 1 got 'tumor' (id 2 alphabetically after lymphocyte=1)
        assert sem[0, 5, 5] == 2 and sem[0, 25, 25] == 1

        loader = get_orion_crc_loader(str(tmp_path), batch_size=2, patch_shape=(32, 32),
                                      split="train", modality="he", label_type="instances")
        x, y = next(iter(loader))
        assert x.shape[0] == 2 and x.shape[1] == 3 and x.shape[-2:] == (32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_puma_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.histopathology.puma import (
            _split_sample_ids, get_puma_loader, get_puma_paths)

        rng = np.random.default_rng(81)
        # the preprocessed layout get_puma_data produces (the geojson
        # rasterization itself needs geopandas/rasterio, absent here)
        pre = tmp_path / "train" / "preprocessed"
        pre.mkdir(parents=True)
        for i in range(2):
            with h5py.File(pre / f"training_set_metastatic_roi_{i:03d}.h5", "w") as f:
                f.create_dataset("raw", data=(rng.random((3, 64, 64)) * 255).astype("uint8"))
                f.create_dataset("labels/instances/nuclei",
                                 data=rng.integers(0, 6, (64, 64)).astype("int32"))
                f.create_dataset("labels/semantic/nuclei",
                                 data=rng.integers(0, 10, (64, 64)).astype("uint8"))

        paths = get_puma_paths(str(tmp_path), split="train", annotations="nuclei")
        assert len(paths) == 2

        loader = get_puma_loader(str(tmp_path), batch_size=2, patch_shape=(32, 32),
                                 split="train", annotations="nuclei",
                                 label_choice="instances")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

        # the published 80/20 + 15% split proportions
        train, val, test = _split_sample_ids([f"s{i}" for i in range(20)],
                                             np.random.RandomState(0))
        assert len(test) == 4 and len(val) == 2 and len(train) == 14

    def test_segpath_layout(self, tmp_path):
        import tarfile

        import h5py
        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.segpath import (
            _extract_data, get_segpath_loader, get_segpath_paths)

        rng = np.random.default_rng(82)
        # raw release layout: <dataset>/<name>_HE.png + <name>_mask.png in a tar
        src = tmp_path / "src" / "panCK_Epithelium"
        src.mkdir(parents=True)
        names = ["caseA_0", "caseB_0", "caseC_0"]
        for name in names:
            raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
            mask = (rng.random((64, 64)) > 0.5).astype("uint8")
            Image.fromarray(raw).save(src / f"{name}_HE.png")
            Image.fromarray(mask).save(src / f"{name}_mask.png")
        tar_path = tmp_path / "panCK_Epithelium.tar.gz"
        with tarfile.open(tar_path, "w:gz") as tf:
            tf.add(src, arcname="panCK_Epithelium")
        _extract_data(tar_path, tmp_path / "panCK_Epithelium")
        assert not tar_path.exists()  # consumed

        h5_paths = sorted((tmp_path / "panCK_Epithelium" / "data").glob("*.h5"))
        assert len(h5_paths) == 3
        with h5py.File(h5_paths[0], "r") as f:
            assert f["images/raw"].shape == (3, 64, 64)
            assert f["labels/mask"].shape == (64, 64)

        # fileinfo csv drives the split selection
        (tmp_path / "panCK_fileinfo.csv").write_text(
            "filename,train_val_test\n"
            "caseA_0_HE.png,train\ncaseB_0_HE.png,train\ncaseC_0_HE.png,val\n")
        train_paths = get_segpath_paths(str(tmp_path), "epithelium", split="train")
        assert len(train_paths) == 2
        all_paths = get_segpath_paths(str(tmp_path), "epithelium")
        assert len(all_paths) == 3

        loader = get_segpath_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                    cell_types="epithelium", split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_pcns_layout(self, tmp_path):
        import tarfile

        from PIL import Image

        from torch_em_tpu.data.datasets.histopathology.pcns import (
            get_pcns_loader, get_pcns_paths)

        rng = np.random.default_rng(83)
        # the manual tarball: <type>/<patch_id>_crop.png + corrected/common masks
        src = tmp_path / "src"
        for pid, ct in ((1, "blca"), (2, "brca"), (3, "blca"), (4, "brca"), (5, "blca")):
            d = src / ct
            d.mkdir(parents=True, exist_ok=True)
            raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(raw).save(d / f"{pid}_crop.png")
            mask = rng.integers(0, 4, (64, 64)).astype("int32")
            Image.fromarray(mask, mode="I").save(d / f"{pid}_labeled_mask_corrected.png")
            Image.fromarray((mask > 0).astype("int32"), mode="I").save(
                d / f"{pid}_labeled_mask_common0.png")
        with tarfile.open(tmp_path / "manual_segmentation_data.tar.gz", "w:gz") as tf:
            tf.add(src, arcname="manual_segmentation_data")
        # pre-seeded crosswalk readme (header prose, then the csv table)
        (tmp_path / "pcns_crosswalk.txt").write_text(
            "Pan-Cancer-Nuclei-Seg crosswalk\n\n"
            "Patch-ID,CancerType\n1,BLCA\n2,BRCA\n3,BLCA\n4,BRCA\n5,BLCA\n")

        train_paths = get_pcns_paths(str(tmp_path), split="train")
        test_paths = get_pcns_paths(str(tmp_path), split="test")
        assert len(train_paths) == 4 and len(test_paths) == 1
        blca = get_pcns_paths(str(tmp_path), split="train", cancer_type="blca")
        assert all(p.endswith((f"{i}.h5")) for i, p in zip((1, 3, 5), blca)) or len(blca) >= 1

        loader = get_pcns_loader(str(tmp_path), batch_size=2, patch_shape=(32, 32),
                                 split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_hest_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.histopathology.hest import (
            LABEL_KEYS, _cell_type_to_category, get_hest_loader, get_hest_paths)

        rng = np.random.default_rng(84)
        # per-slide preprocessed h5s: raw patches + three label modalities
        pre = tmp_path / "preprocessed"
        pre.mkdir()
        for sid in ("TENX24", "NCBI55"):
            with h5py.File(pre / f"{sid}.h5", "w") as f:
                f.create_dataset("raw", data=(rng.random((3, 3, 32, 32)) * 255).astype("uint8"))
                for key in LABEL_KEYS.values():
                    f.create_dataset(key, data=rng.integers(0, 5, (3, 32, 32)).astype("int32"))
        (tmp_path / "HEST_v1_3_0.csv").write_text(
            "id,organ,pixel_size_um_estimated\nTENX24,Breast,0.5\nNCBI55,Lung,0.5\n")

        paths = get_hest_paths(str(tmp_path))
        assert len(paths) == 2
        breast = get_hest_paths(str(tmp_path), organs=["Breast"])
        assert len(breast) == 1 and breast[0].endswith("TENX24.h5")

        for label_choice in ("instances", "xenium_instances", "semantic"):
            loader = get_hest_loader(str(tmp_path), batch_size=2, patch_shape=(32, 32),
                                     label_choice=label_choice)
            x, y = next(iter(loader))
            assert x.shape == (2, 3, 32, 32)
            assert float(x.max()) <= 1.0  # raw is rescaled to [0, 1]
            assert y.shape == (2, 32, 32)

        # marker-keyword category mapping
        assert _cell_type_to_category("Alveolar macrophages") == "Inflammatory"
        assert _cell_type_to_category("Hepatocytes") == "Epithelial"
        assert _cell_type_to_category("Fibroblasts") == "Connective"
        assert _cell_type_to_category("Unicorn cells") == "Unknown"

    def test_bbbc034_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.bbbc034 import (
            get_bbbc034_loader, get_bbbc034_paths)

        rng = np.random.default_rng(85)
        data_dir = tmp_path / "BBBC034"
        data_dir.mkdir()
        for c in range(4):
            iio.imwrite(data_dir / f"stack_C={c}.tif",
                             (rng.random((8, 64, 64)) * 65535).astype("uint16"))
        iio.imwrite(data_dir / "ground_truth_segmented.tif",
                         rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        raw_paths, label_paths = get_bbbc034_paths(str(tmp_path), channel=2)
        assert len(raw_paths) == 1 and raw_paths[0].endswith("C=2.tif")
        assert len(label_paths) == 1

        loader = get_bbbc034_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_bitdepth_nucseg_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.bitdepth_nucseg import (
            get_bitdepth_nucseg_loader, get_bitdepth_nucseg_paths)

        rng = np.random.default_rng(86)
        for mag in ("20x", "40x"):
            im_dir = tmp_path / "data" / mag / "images_16bit"
            lb_dir = tmp_path / "data" / mag / "label masks"
            im_dir.mkdir(parents=True)
            lb_dir.mkdir(parents=True)
            for i in range(2):
                iio.imwrite(im_dir / f"im{i}.tif",
                                 (rng.random((64, 64)) * 65535).astype("uint16"))
                iio.imwrite(lb_dir / f"im{i}.tif",
                                 rng.integers(0, 4, (64, 64)).astype("uint16"))

        raw_paths, label_paths = get_bitdepth_nucseg_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 4
        raw_20x, _ = get_bitdepth_nucseg_paths(str(tmp_path), magnification="20x")
        assert len(raw_20x) == 2

        loader = get_bitdepth_nucseg_loader(str(tmp_path), patch_shape=(32, 32),
                                            batch_size=2, magnification="20x")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_bac_mother_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.bac_mother import (
            get_bac_mother_loader, get_bac_mother_paths)

        rng = np.random.default_rng(87)
        # CTC layout: <seq>/t<idx>.tif + <seq>_GT/SEG/man_seg<idx>.tif
        for seq in ("01", "02"):
            seq_dir = tmp_path / "CTC" / "train" / seq
            gt_dir = tmp_path / "CTC" / "train" / f"{seq}_GT" / "SEG"
            seq_dir.mkdir(parents=True)
            gt_dir.mkdir(parents=True)
            for t in range(2):
                iio.imwrite(seq_dir / f"t{t:03d}.tif",
                                 (rng.random((64, 64)) * 255).astype("uint8"))
                iio.imwrite(gt_dir / f"man_seg{t:03d}.tif",
                                 rng.integers(0, 4, (64, 64)).astype("uint16"))

        raw_paths, label_paths = get_bac_mother_paths(str(tmp_path), split="train")
        assert len(raw_paths) == len(label_paths) == 4

        loader = get_bac_mother_loader(str(tmp_path), patch_shape=(64, 64), batch_size=2,
                                       split="train", binary=True)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 64, 64)
        assert y.shape == (2, 1, 64, 64)

    def test_cartocell_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.cartocell import (
            get_cartocell_loader, get_cartocell_paths)

        rng = np.random.default_rng(88)
        for name, split in (("MDCK-Normoxia", "train"), ("hMSC", "test")):
            raw_dir = tmp_path / "data" / f"low-resolution_{name}_{split}_raw_images"
            lab_dir = tmp_path / "data" / f"low-resolution_{name}_{split}_label_images"
            raw_dir.mkdir(parents=True)
            lab_dir.mkdir(parents=True)
            for i in range(2):
                iio.imwrite(raw_dir / f"cyst_{i}.tif",
                                 (rng.random((8, 64, 64)) * 255).astype("uint8"))
                iio.imwrite(lab_dir / f"cyst_{i}.tif",
                                 rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        raw_paths, label_paths = get_cartocell_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 4
        train_raw, _ = get_cartocell_paths(str(tmp_path), split="train")
        assert len(train_raw) == 2

        loader = get_cartocell_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                      batch_size=1, split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_blastospim_layout(self, tmp_path):
        import gzip

        from torch_em_tpu.data.datasets.light_microscopy.blastospim import (
            _preprocess_inputs, get_blastospim_loader, get_blastospim_paths)

        rng = np.random.default_rng(89)
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        for i in range(2):
            raw = (rng.random((8, 64, 64)) * 255).astype("float32")
            labels = rng.integers(0, 5, (8, 64, 64)).astype("uint16")
            for tag, arr in (("image", raw), ("masks", labels)):
                buf = gzip.open(data_dir / f"F{i}_{tag}_0.npy.gz", "wb")
                np.save(buf, arr)
                buf.close()
        _preprocess_inputs(str(data_dir))

        paths = get_blastospim_paths(str(tmp_path))
        assert len(paths) == 2 and all(p.endswith(".h5") for p in paths)

        loader = get_blastospim_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                       batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_brifiseg_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.light_microscopy.brifiseg import (
            _preprocess, get_brifiseg_loader, get_brifiseg_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(90)
        # the nnUNet-style task layout in the 1channel tarball
        task = tmp_path / "1channel" / "Task501_A549"
        for sub, lab_sub, n in (("imagesTr", "labelsTr", 2), ("imagesTs", "labelsTs", 1)):
            (task / sub).mkdir(parents=True)
            (task / lab_sub).mkdir(parents=True)
            for i in range(n):
                name = f"{sub[-2:].lower()}_case{i}"
                save_nifti(str(task / sub / f"{name}_0000.nii.gz"),
                           (rng.random((64, 64)) * 255).astype("float32"))
                save_nifti(str(task / lab_sub / f"{name}.nii.gz"),
                           rng.integers(0, 3, (64, 64)).astype("uint8"))
        _preprocess(str(tmp_path), str(tmp_path / "data"))

        train_paths = get_brifiseg_paths(str(tmp_path), split="train")
        test_paths = get_brifiseg_paths(str(tmp_path), split="test")
        assert len(train_paths) == 2 and len(test_paths) == 1

        loader = get_brifiseg_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                     split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_aisegcell_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.aisegcell import (
            _preprocess_data, get_aisegcell_loader, get_aisegcell_paths)

        rng = np.random.default_rng(91)
        base = tmp_path / "aiSEGcell_nucleus"
        for dname, split in (("exp1", "train"), ("exp1", "val")):
            for sub in ("brightfield", "nucleus", "masks"):
                d = base / dname / f"set_{split}" / sub
                d.mkdir(parents=True)
                for i in range(2):
                    if sub == "masks":
                        arr = np.zeros((64, 64), dtype="uint8")
                        arr[10:20, 10:20] = 255
                        arr[40:50, 40:50] = 255
                        Image.fromarray(arr).save(d / f"im{i}.png")
                    else:
                        Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                                        ).save(d / f"im{i}.png")
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        _preprocess_data(str(data_dir), str(base))

        paths = get_aisegcell_paths(str(tmp_path), split="train")
        assert len(paths) == 2

        loader = get_aisegcell_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                      split="train", raw_channel="brightfield")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_arvidsson_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.arvidsson import (
            _rgb_to_instances, get_arvidsson_loader, get_arvidsson_paths)

        rng = np.random.default_rng(92)
        data_dir = tmp_path / "training_nuclei"
        (data_dir / "images").mkdir(parents=True)
        (data_dir / "annotations").mkdir()
        for i in range(2):
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(data_dir / "images" / f"im{i}.png")
            # RGB-coded instances: two colors + black background
            ann = np.zeros((64, 64, 3), dtype="uint8")
            ann[5:15, 5:15] = (255, 0, 0)
            ann[30:40, 30:40] = (0, 255, 0)
            Image.fromarray(ann).save(data_dir / "annotations" / f"im{i}.png")

        raw_paths, label_paths = get_arvidsson_paths(str(tmp_path), split="train")
        assert len(raw_paths) == len(label_paths) == 2
        assert all(p.endswith("_preprocessed.tif") for p in label_paths)

        inst = _rgb_to_instances(ann)
        assert set(np.unique(inst)) == {0, 1, 2}

        loader = get_arvidsson_loader(str(tmp_path), patch_shape=(64, 64), batch_size=2,
                                      split="train", binary=True)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 64, 64)
        assert y.shape == (2, 1, 64, 64)
        assert y.max() == 1

    def test_balf_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.balf import (
            get_balf_loader, get_balf_paths)

        rng = np.random.default_rng(93)
        (tmp_path / "images" / "train").mkdir(parents=True)
        (tmp_path / "labels" / "train").mkdir(parents=True)
        for i in range(2):
            Image.fromarray((rng.random((64, 64, 3)) * 255).astype("uint8")
                            ).save(tmp_path / "images" / "train" / f"im{i}.jpg")
            # YOLO polygon lines: class_id x1 y1 x2 y2 ... (normalized)
            (tmp_path / "labels" / "train" / f"im{i}.txt").write_text(
                "0 0.1 0.1 0.4 0.1 0.4 0.4 0.1 0.4\n"
                "3 0.5 0.5 0.9 0.5 0.9 0.9 0.5 0.9\n")

        paths = get_balf_paths(str(tmp_path), split="train")
        assert len(paths) == 2
        import h5py
        with h5py.File(paths[0], "r") as f:
            inst = f["labels/instances"][:]
            sem = f["labels/semantic"][:]
        assert inst.max() == 2  # two polygons -> two instances
        assert set(np.unique(sem)) == {0, 1, 4}  # class ids + 1

        loader = get_balf_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                 split="train", label_choice="semantic")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_bbbc030_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.bbbc030 import (
            _preprocess, get_bbbc030_loader, get_bbbc030_paths)

        rng = np.random.default_rng(94)
        (tmp_path / "images").mkdir()
        (tmp_path / "ground_truth").mkdir()
        for i in range(2):
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(tmp_path / "images" / f"im{i}.png")
            # hand-drawn closed contour around one cell
            contour = np.zeros((64, 64), dtype="uint8")
            contour[20, 20:40] = 255
            contour[40, 20:40] = 255
            contour[20:41, 20] = 255
            contour[20:41, 40] = 255
            Image.fromarray(contour).save(tmp_path / "ground_truth" / f"im{i}.png")
        _preprocess(str(tmp_path))

        paths = get_bbbc030_paths(str(tmp_path))
        assert len(paths) == 2
        import h5py
        with h5py.File(paths[0], "r") as f:
            labels = f["labels"][:]
        assert labels.max() >= 1  # the enclosed interior became an instance
        assert labels[30, 30] > 0

        loader = get_bbbc030_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_celegans_atlas_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.celegans_atlas import (
            get_celegans_atlas_loader, get_celegans_atlas_paths)

        rng = np.random.default_rng(95)
        for split in ("train", "val"):
            im_dir = tmp_path / "c_elegans_nuclei" / split / "images"
            lb_dir = tmp_path / "c_elegans_nuclei" / split / "masks"
            im_dir.mkdir(parents=True)
            lb_dir.mkdir(parents=True)
            for i in range(2):
                iio.imwrite(im_dir / f"v{i}.tif",
                            (rng.random((8, 64, 64)) * 255).astype("uint8"))
                iio.imwrite(lb_dir / f"v{i}.tif",
                            rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        raw_paths, label_paths = get_celegans_atlas_paths(str(tmp_path), split="train")
        assert len(raw_paths) == len(label_paths) == 2

        loader = get_celegans_atlas_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                           batch_size=1, split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_cellbindb_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.cellbindb import (
            get_cellbindb_loader, get_cellbindb_paths)

        rng = np.random.default_rng(96)
        for choice in ("DAPI", "ssDNA"):
            for sample in ("s1",):
                d = tmp_path / "Other" / choice / sample
                d.mkdir(parents=True)
                iio.imwrite(d / f"{sample}-img.tif",
                            (rng.random((64, 64)) * 255).astype("uint8"))
                iio.imwrite(d / f"{sample}-instancemask.tif",
                            rng.integers(0, 4, (64, 64)).astype("uint16"))

        raw_paths, label_paths = get_cellbindb_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 2
        dapi_raw, _ = get_cellbindb_paths(str(tmp_path), data_choice="DAPI")
        assert len(dapi_raw) == 1

        loader = get_cellbindb_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                      data_choice=["DAPI", "ssDNA"])
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_cellseg_3d_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.cellseg_3d import (
            get_cellseg_3d_loader, get_cellseg_3d_paths)

        rng = np.random.default_rng(97)
        root = tmp_path / "DATASET_WITH_GT"
        (root / "labels").mkdir(parents=True)
        for i in range(3):
            iio.imwrite(root / f"vol{i}.tif",
                        (rng.random((8, 64, 64)) * 65535).astype("uint16"))
            iio.imwrite(root / "labels" / f"vol{i}.tif",
                        rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        raw_paths, label_paths = get_cellseg_3d_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 3

        loader = get_cellseg_3d_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                       batch_size=1, sample_ids=(0, 2))
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_cisd_layout(self, tmp_path):
        import json

        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.cisd import (
            _decode_rle, get_cisd_loader, get_cisd_paths)

        rng = np.random.default_rng(98)
        data_dir = tmp_path / "CISD"
        (data_dir / "center_slice").mkdir(parents=True)
        assets = []
        for i in range(2):
            name = f"im{i}.jpg"
            raw = (rng.random((32, 32, 3)) * 255).astype("uint8")
            Image.fromarray(raw).save(data_dir / "center_slice" / name)
            # one RLE instance: 100 zeros, 50 ones, rest zeros (row-major)
            assets.append({
                "file_name": name,
                "annotations": [{"data": [{"mask": {
                    "size": [32, 32], "counts": [100, 50, 32 * 32 - 150]}}]}],
            })
        (data_dir / "CISD.json").write_text(json.dumps({"assets": assets}))

        mask = _decode_rle([100, 50, 32 * 32 - 150], 32, 32)
        assert mask.sum() == 50

        raw_paths, label_paths = get_cisd_paths(str(tmp_path), mode="center_slice")
        assert len(raw_paths) == len(label_paths) == 2

        loader = get_cisd_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                 mode="center_slice")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)  # converted to grayscale
        assert y.shape[-2:] == (32, 32)
        assert y.max() == 1

    def test_cshaper_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.light_microscopy.cshaper import (
            _ZIP_ROOT, get_cshaper_loader, get_cshaper_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(99)
        data_dir = tmp_path / _ZIP_ROOT
        for split_subdir in ("TrainingData",):
            sample = data_dir / split_subdir / "Sample01"
            (sample / "RawMemb").mkdir(parents=True)
            (sample / "SegCell").mkdir()
            for t in range(2):
                save_nifti(str(sample / "RawMemb" / f"Sample01_{t:03d}_rawMemb.nii.gz"),
                           (rng.random((8, 32, 32)) * 255).astype("float32"))
                save_nifti(str(sample / "SegCell" / f"Sample01_{t:03d}_segCell.nii.gz"),
                           rng.integers(0, 5, (8, 32, 32)).astype("int16"))

        paths = get_cshaper_paths(str(tmp_path), split="train")
        assert len(paths) == 2

        loader = get_cshaper_loader(str(tmp_path), patch_shape=(4, 16, 16),
                                    batch_size=1, split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 16, 16)
        assert y.shape[-3:] == (4, 16, 16)

    def test_cvz_fluo_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.cvz_fluo import (
            get_cvz_fluo_loader, get_cvz_fluo_paths)

        rng = np.random.default_rng(100)
        (tmp_path / "Annotation Panel Table.xlsx").write_bytes(b"stub")
        for platform, sample in (("CODEX", "reg1"), ("Vectra", "reg2")):
            d = tmp_path / platform / sample
            d.mkdir(parents=True)
            for stain in ("Cell", "Dapi"):
                raw = (rng.random((64, 64, 3)) * 255).astype("uint8")
                Image.fromarray(raw).save(d / f"{sample}-Crop_{stain}_Png.png")
                mask = np.zeros((64, 64), dtype="uint8")
                mask[8:18, 8:18] = 1
                mask[30:42, 30:42] = 1
                Image.fromarray(mask).save(d / f"{sample}-Crop_{stain}_Mask_Png.png")

        raw_paths, label_paths = get_cvz_fluo_paths(str(tmp_path), stain_choice="cell")
        assert len(raw_paths) == len(label_paths) == 2
        assert all(p.endswith(".tif") for p in label_paths)  # cc-preprocessed
        codex_raw, _ = get_cvz_fluo_paths(str(tmp_path), stain_choice="dapi",
                                          data_choice="CODEX")
        assert len(codex_raw) == 1

        loader = get_cvz_fluo_loader(str(tmp_path), patch_shape=(64, 64), batch_size=2,
                                     stain_choice="cell")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 64, 64)
        assert y.max() == 2  # two separated squares -> two instances

    def test_deepseas_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.deepseas import (
            get_deepseas_loader, get_deepseas_paths)

        rng = np.random.default_rng(101)
        data_dir = tmp_path / "segmentation_dataset" / "train"
        (data_dir / "images").mkdir(parents=True)
        (data_dir / "masks").mkdir()
        for i in range(3):
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(data_dir / "images" / f"im{i}.png")
            Image.fromarray(rng.integers(0, 4, (64, 64)).astype("uint8")
                            ).save(data_dir / "masks" / f"im{i}.png")

        raw_paths, label_paths = get_deepseas_paths(str(tmp_path), split="train")
        assert len(raw_paths) == len(label_paths) == 3

        loader = get_deepseas_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                     split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_dic_hepg2_layout(self, tmp_path):
        import json

        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.dic_hepg2 import (
            get_dic_hepg2_loader, get_dic_hepg2_paths)

        rng = np.random.default_rng(102)
        base = tmp_path / "2021-11-15_HepG2_Calcein_AM" / "coco_format" / "train"
        (base / "images").mkdir(parents=True)
        images, annotations = [], []
        for i in range(2):
            fname = f"im{i}.png"
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(base / "images" / fname)
            images.append({"id": i, "file_name": fname, "height": 64, "width": 64})
            annotations.append({
                "id": i, "image_id": i, "iscrowd": 0, "area": 400,
                "segmentation": [[10, 10, 30, 10, 30, 30, 10, 30]],
            })
        (base / "annotations.json").write_text(
            json.dumps({"images": images, "annotations": annotations}))

        image_paths, gt_paths = get_dic_hepg2_paths(str(tmp_path), split="train")
        assert len(image_paths) == len(gt_paths) == 2

        loader = get_dic_hepg2_loader(str(tmp_path), patch_shape=(64, 64), batch_size=2,
                                      split="train", binary=True)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 64, 64)
        assert y.shape == (2, 1, 64, 64)
        assert y.max() == 1  # the decoded COCO polygon

    def test_dynamicnuclearnet_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.light_microscopy.dynamicnuclearnet import (
            get_dynamicnuclearnet_loader, get_dynamicnuclearnet_paths)

        rng = np.random.default_rng(103)
        npz_dir = tmp_path / "DynamicNuclearNet-segmentation-v1_0"
        npz_dir.mkdir()
        n = 3
        np.savez(npz_dir / "train.npz",
                 X=rng.random((n, 64, 64, 1)).astype("float32"),
                 y=rng.integers(0, 5, (n, 64, 64, 1)).astype("int32"))

        paths = get_dynamicnuclearnet_paths(str(tmp_path), split="train")
        assert len(paths) == 3 and all(p.endswith(".zarr") for p in paths)
        assert not (npz_dir / "train.npz").exists()  # consumed after conversion

        loader = get_dynamicnuclearnet_loader(str(tmp_path), split="train",
                                              patch_shape=(32, 32), batch_size=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_e11bio_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.light_microscopy.e11bio import (
            get_e11bio_loader, get_e11bio_paths)

        rng = np.random.default_rng(104)
        # the cached-crop layout the S3 streaming produces
        split_dir = tmp_path / "instance"
        split_dir.mkdir()
        for crop_id in range(2):
            with h5py.File(split_dir / f"crop_{crop_id}.h5", "w") as f:
                raw_grp = f.create_group("raw")
                for ch in range(3):
                    raw_grp.create_dataset(
                        f"ch_{ch:02d}", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
                f.create_dataset("labels", data=rng.integers(0, 5, (8, 64, 64)).astype("uint32"))

        paths = get_e11bio_paths(str(tmp_path), split="instance", crop_ids=[0, 1])
        assert len(paths) == 2

        loader = get_e11bio_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                   split="instance", crop_ids=[0, 1], channel=1,
                                   boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape == (1, 1, 4, 32, 32)  # boundary channel

    def test_embedseg_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.embedseg_data import (
            get_embedseg_loader, get_embedseg_paths)

        rng = np.random.default_rng(105)
        name = "Mouse-Skull-Nuclei-CBG"
        im_dir = tmp_path / name / "train" / "images"
        lb_dir = tmp_path / name / "train" / "masks"
        im_dir.mkdir(parents=True)
        lb_dir.mkdir(parents=True)
        for i in range(2):
            iio.imwrite(im_dir / f"v{i}.tif", (rng.random((8, 64, 64)) * 255).astype("uint8"))
            iio.imwrite(lb_dir / f"v{i}.tif", rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        raw_paths, label_paths = get_embedseg_paths(str(tmp_path), name, split="train")
        assert len(raw_paths) == len(label_paths) == 2

        loader = get_embedseg_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                     name=name, split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_enseg_layout(self, tmp_path):
        import base64
        import json
        from io import BytesIO

        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.enseg import (
            get_enseg_loader, get_enseg_paths)

        rng = np.random.default_rng(106)
        # LabelMe-style jsons with the image embedded as base64 png
        for tag, sub in (("2C", "control"), ("22TW", "tumor")):
            d = tmp_path / "data" / sub
            d.mkdir(parents=True)
            img = Image.fromarray((rng.random((64, 64, 3)) * 255).astype("uint8"))
            buf = BytesIO()
            img.save(buf, format="PNG")
            (d / f"sample_{tag}.json").write_text(json.dumps({
                "animalTag": tag,
                "imageData": base64.b64encode(buf.getvalue()).decode(),
                "imageHeight": 64, "imageWidth": 64,
                "shapes": [{"points": [[10, 10], [30, 10], [30, 30], [10, 30]]},
                           {"points": [[40, 40], [60, 40], [60, 60], [40, 60]]}],
            }))

        image_paths, seg_paths = get_enseg_paths(str(tmp_path))
        assert len(image_paths) == len(seg_paths) == 2
        control_im, _ = get_enseg_paths(str(tmp_path), animal_tags=["2C"])
        assert len(control_im) == 1

        loader = get_enseg_loader(str(tmp_path), patch_shape=(64, 64), batch_size=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 64, 64)
        assert y.max() == 2  # two rasterized polygons

    def test_evican_layout(self, tmp_path):
        import json

        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.evican import (
            get_evican_loader, get_evican_paths)

        rng = np.random.default_rng(107)
        image_dir = tmp_path / "images" / "train"
        image_dir.mkdir(parents=True)
        (tmp_path / "annotations").mkdir()
        images, annotations = [], []
        for i in range(2):
            fname = f"im{i}.jpg"
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(image_dir / fname)
            images.append({"id": i, "file_name": fname, "height": 64, "width": 64})
            # a cell and a nucleus annotation per image
            annotations.append({"id": 2 * i, "image_id": i, "category_id": 1,
                                "iscrowd": 0, "area": 400,
                                "segmentation": [[10, 10, 30, 10, 30, 30, 10, 30]]})
            annotations.append({"id": 2 * i + 1, "image_id": i, "category_id": 2,
                                "iscrowd": 0, "area": 100,
                                "segmentation": [[15, 15, 25, 15, 25, 25, 15, 25]]})
        coco = {"images": images, "annotations": annotations,
                "categories": [{"id": 1, "name": "Cell"}, {"id": 2, "name": "Nucleus"}]}
        (tmp_path / "annotations" / "instances_train_evican2.json").write_text(
            json.dumps(coco))

        image_paths, seg_paths = get_evican_paths(str(tmp_path), split="train",
                                                  segmentation_type="cell")
        assert len(image_paths) == len(seg_paths) == 2

        loader = get_evican_loader(str(tmp_path), patch_shape=(64, 64), batch_size=2,
                                   split="train", segmentation_type="cell")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 64, 64)
        assert y.max() == 1  # one cell instance per image

    def test_glioma_c6_layout(self, tmp_path):
        import json

        import imageio.v3 as iio
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.glioma_c6 import (
            _coco_to_instance_masks, get_glioma_c6_loader, get_glioma_c6_paths)

        rng = np.random.default_rng(108)
        # the post-rasterization layout: dataset/spec/<split>/{images,masks/anno_<split>}
        data_dir = tmp_path / "GliomaC6"
        for split in ("train", "valid"):
            im_dir = data_dir / "dataset" / "spec" / split / "images"
            mk_dir = data_dir / "dataset" / "spec" / split / "masks" / f"anno_{split}"
            im_dir.mkdir(parents=True)
            mk_dir.mkdir(parents=True)
            for i in range(2):
                iio.imwrite(im_dir / f"im{i}.tif",
                            (rng.random((64, 64)) * 255).astype("uint8"))
                Image.fromarray(rng.integers(0, 4, (64, 64)).astype("int32"),
                                mode="I").save(mk_dir / f"im{i}_mask.tif")

        raw_paths, label_paths = get_glioma_c6_paths(str(tmp_path), subset="spec",
                                                     split="train")
        assert len(raw_paths) == len(label_paths) == 2

        loader = get_glioma_c6_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                      subset="spec", split="val")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

        # the COCO rasterizer skips 'cell_part' categories
        coco = {"categories": [{"id": 1, "name": "cell"},
                               {"id": 2, "name": "nucleus", "supercategory": "cell_part"}],
                "images": [{"id": 0, "file_name": "x.tif", "height": 32, "width": 32}],
                "annotations": [
                    {"image_id": 0, "category_id": 1,
                     "segmentation": [[4, 4, 20, 4, 20, 20, 4, 20]]},
                    {"image_id": 0, "category_id": 2,
                     "segmentation": [[8, 8, 12, 8, 12, 12, 8, 12]]}]}
        ann_file = tmp_path / "ann.json"
        ann_file.write_text(json.dumps(coco))
        mask_dir = tmp_path / "coco_masks"
        _coco_to_instance_masks(str(tmp_path), str(ann_file), str(mask_dir))
        from torch_em_tpu.utils.io import load_image
        mask = np.asarray(load_image(str(mask_dir / "x_mask.tif")))
        assert mask.max() == 1  # only the cell polygon was burned

    def test_idr0095_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.idr0095 import (
            get_idr0095_loader, get_idr0095_paths)

        rng = np.random.default_rng(109)
        # pre-extracted layout: condition dirs with paired Phase/Mask tiffs
        cond_dir = (tmp_path / "idr0095" / "Experiment_A_Figure3" / "glucose" / "cond1")
        cond_dir.mkdir(parents=True)
        for i in range(2):
            Image.fromarray((rng.random((64, 64)) * 65535).astype("uint16")
                            ).save(cond_dir / f"f{i}-Phase.tif")
            Image.fromarray(rng.integers(0, 4, (64, 64)).astype("uint16")
                            ).save(cond_dir / f"f{i}-Mask.tif")

        raw_paths, mask_paths = get_idr0095_paths(str(tmp_path), experiment="A")
        assert len(raw_paths) == len(mask_paths) == 2

        loader = get_idr0095_loader(str(tmp_path), batch_size=2, patch_shape=(32, 32),
                                    experiment="A")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_ifnuclei_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.ifnuclei import (
            get_ifnuclei_loader, get_ifnuclei_paths)

        rng = np.random.default_rng(110)
        (tmp_path / "rawimages").mkdir()
        (tmp_path / "groundtruth").mkdir()
        for i in range(2):
            Image.fromarray((rng.random((64, 64)) * 65535).astype("uint16")
                            ).save(tmp_path / "rawimages" / f"im{i}.tif")
            Image.fromarray(rng.integers(0, 5, (64, 64)).astype("uint16")
                            ).save(tmp_path / "groundtruth" / f"im{i}.tif")

        raw_paths, label_paths = get_ifnuclei_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 2

        loader = get_ifnuclei_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                     binary=True)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape == (2, 1, 32, 32)

    def test_liconn_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.light_microscopy.liconn import (
            get_liconn_loader, get_liconn_paths)

        rng = np.random.default_rng(111)
        # the local h5 cache the CloudVolume streaming produces
        with h5py.File(tmp_path / "liconn.h5", "w") as f:
            f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            f.create_dataset("seg_proofread",
                             data=rng.integers(0, 6, (8, 64, 64)).astype("uint64"))

        paths = get_liconn_paths(str(tmp_path), segmentation="proofread")
        assert len(paths) == 1
        # the agglomerated variant is not cached -> loud refusal without download
        with pytest.raises(RuntimeError):
            get_liconn_paths(str(tmp_path), segmentation="agglomerated")

        loader = get_liconn_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                   segmentation="proofread")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_lpc_nucseg_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.lpc_nucseg import (
            get_lpc_nucseg_loader, get_lpc_nucseg_paths)

        rng = np.random.default_rng(112)
        repo = tmp_path / "Coelho2009_ISBI_NuclearSegmentation-master" / "data"
        for source in ("gnf", "ic100"):
            raw_dir = repo / "images" / "dna-images" / source
            lab_dir = repo / "preprocessed-data" / source
            raw_dir.mkdir(parents=True)
            lab_dir.mkdir(parents=True)
            for i in range(2):
                Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                                ).save(raw_dir / f"im{i}.png")
                Image.fromarray(rng.integers(0, 4, (64, 64)).astype("uint8")
                                ).save(lab_dir / f"im{i}.png")

        paths = get_lpc_nucseg_paths(str(tmp_path), source="gnf")
        assert len(paths) == 2 and all(p.endswith(".h5") for p in paths)

        loader = get_lpc_nucseg_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                       source="ic100")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_lsm_mouse_embryo_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.lsm_mouse_embryo import (
            get_lsm_mouse_embryo_loader, get_lsm_mouse_embryo_paths)

        rng = np.random.default_rng(113)
        base = tmp_path / "LSM_Segmentation_Dataset" / "DAPI-Tissue" / "Training"
        (base / "Original").mkdir(parents=True)
        (base / "Mask").mkdir()
        for i in range(2):
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(base / "Original" / f"im{i}.png")
            # RGBA masks ship in the raw release
            mask = np.zeros((64, 64, 4), dtype="uint8")
            mask[10:30, 10:30] = (255, 255, 255, 255)
            Image.fromarray(mask).save(base / "Mask" / f"im{i}.png")

        image_paths, seg_paths = get_lsm_mouse_embryo_paths(str(tmp_path), split="train",
                                                            task="tissue")
        assert len(image_paths) == len(seg_paths) == 2
        assert all(p.endswith(".tif") for p in seg_paths)

        loader = get_lsm_mouse_embryo_loader(str(tmp_path), patch_shape=(64, 64),
                                             batch_size=2, split="train", task="tissue")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 64, 64)
        assert y.max() == 1  # normalized to binary single-channel

    def test_medussa_layout(self, tmp_path):
        import json

        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.medussa import (
            SPLIT_FILE_LISTS, get_medussa_loader, get_medussa_paths)

        rng = np.random.default_rng(114)
        # pre-seed the BioStudies file lists + the listed files themselves
        file_list_dir = tmp_path / "file_lists"
        file_list_dir.mkdir()
        img_rels, mask_rels = [], []
        for i in range(2):
            img_rels.append(f"Files/images/im{i}.tif")
            mask_rels.append(f"Files/masks/im{i}_mask.tif")
        (file_list_dir / SPLIT_FILE_LISTS["train"]["images"]).write_text(
            json.dumps([{"path": p} for p in img_rels]))
        (file_list_dir / SPLIT_FILE_LISTS["train"]["masks"]).write_text(
            json.dumps([{"path": p} for p in mask_rels]))
        (tmp_path / "Files" / "images").mkdir(parents=True)
        (tmp_path / "Files" / "masks").mkdir()
        for i in range(2):
            # a z-stack: the conversion max-projects it to 2D (5 slices --
            # a leading dim of 4 would be mistaken for RGBA channels)
            iio.imwrite(tmp_path / img_rels[i],
                        (rng.random((5, 64, 64)) * 255).astype("uint8"))
            iio.imwrite(tmp_path / mask_rels[i],
                        rng.integers(0, 4, (64, 64)).astype("uint8"))

        paths = get_medussa_paths(str(tmp_path), split="train")
        assert len(paths) == 2
        import h5py
        with h5py.File(paths[0], "r") as f:
            assert f["raw"].shape == (64, 64)  # max-projected

        loader = get_medussa_loader(str(tmp_path), batch_size=2, patch_shape=(32, 32),
                                    split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_microbeseg_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.microbeseg import (
            get_microbeseg_loader, get_microbeseg_paths)

        rng = np.random.default_rng(115)
        split_dir = tmp_path / "microbeSEG_dataset" / "30min-man_15min-pre" / "train"
        split_dir.mkdir(parents=True)
        for i in range(2):
            Image.fromarray((rng.random((64, 64)) * 65535).astype("uint16")
                            ).save(split_dir / f"img_{i:03d}.tif")
            Image.fromarray(rng.integers(0, 4, (64, 64)).astype("uint16")
                            ).save(split_dir / f"mask_{i:03d}.tif")

        image_paths, seg_paths = get_microbeseg_paths(str(tmp_path), split="train")
        assert len(image_paths) == len(seg_paths) == 2

        loader = get_microbeseg_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                       split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_mndino_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.mndino import (
            get_mndino_loader, get_mndino_paths)

        rng = np.random.default_rng(116)
        for split_dir in ("train", "validation"):
            base = tmp_path / "annotated_mn_datasets" / split_dir
            (base / "images").mkdir(parents=True)
            (base / "nuclei_masks").mkdir()
            (base / "mn_masks").mkdir()
            for i in range(2):
                Image.fromarray((rng.random((64, 64)) * 65535).astype("uint16")
                                ).save(base / "images" / f"im{i}.tif")
                Image.fromarray(rng.integers(0, 4, (64, 64)).astype("uint16")
                                ).save(base / "nuclei_masks" / f"im{i}.tif")
                Image.fromarray((rng.random((64, 64)) > 0.8).astype("uint8")
                                ).save(base / "mn_masks" / f"im{i}.png")

        train_paths = get_mndino_paths(str(tmp_path), split="train")
        val_paths = get_mndino_paths(str(tmp_path), split="val")
        assert len(train_paths) == 2 and len(val_paths) == 2

        for label_choice in ("micronuclei", "nuclei"):
            loader = get_mndino_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                       split="train", label_choice=label_choice)
            x, y = next(iter(loader))
            assert x.shape == (2, 1, 32, 32)
            assert y.shape[-2:] == (32, 32)

    def test_morphonet_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.morphonet import (
            get_morphonet_loader, get_morphonet_paths)

        rng = np.random.default_rng(117)
        for org_dir in ("Patiria miniata",):
            raw_dir = tmp_path / org_dir / "published" / "RAW"
            seg_dir = tmp_path / org_dir / "published" / "SEG"
            raw_dir.mkdir(parents=True)
            seg_dir.mkdir(parents=True)
            for t in range(2):
                iio.imwrite(raw_dir / f"t{t:03d}.tif",
                            (rng.random((8, 64, 64)) * 255).astype("uint8"))
                iio.imwrite(seg_dir / f"t{t:03d}.tif",
                            rng.integers(0, 5, (8, 64, 64)).astype("uint16"))
            # macOS metadata files must be skipped
            (raw_dir / "._t000.tif").write_bytes(b"junk")

        paths = get_morphonet_paths(str(tmp_path), organism="patiria_miniata")
        assert len(paths) == 2

        loader = get_morphonet_loader(str(tmp_path), batch_size=1,
                                      patch_shape=(4, 32, 32),
                                      organism="patiria_miniata")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_morphoseg_layout(self, tmp_path):
        import json

        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.morphoseg import (
            _rois_to_masks, get_morphoseg_loader, get_morphoseg_paths)

        rng = np.random.default_rng(118)
        data_dir = tmp_path / "train"
        (data_dir / "training_dataset").mkdir(parents=True)
        (data_dir / "roi_jsons_combined").mkdir()
        for i in range(2):
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(data_dir / "training_dataset" / f"im{i}.tif")
            (data_dir / "roi_jsons_combined" / f"im{i}_ROI.json").write_text(json.dumps(
                [{"points": [[10, 10], [30, 10], [30, 30], [10, 30]]},
                 {"points": [[40, 40], [60, 40], [60, 60], [40, 60]]}]))
        _rois_to_masks(str(data_dir))

        raw_paths, label_paths = get_morphoseg_paths(str(tmp_path), split="train")
        assert len(raw_paths) == len(label_paths) == 2
        with pytest.raises(RuntimeError):
            get_morphoseg_paths(str(tmp_path), split="test")

        loader = get_morphoseg_loader(str(tmp_path), patch_shape=(64, 64), batch_size=2,
                                      split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 64, 64)
        assert y.max() == 2  # two rasterized ROIs

    def test_mucic_layout(self, tmp_path):
        import h5py
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.mucic import (
            _semantic_to_instances_watershed, get_mucic_loader, get_mucic_paths)

        rng = np.random.default_rng(119)
        # hl60: paired image-final_* / image-labels_* h5 files with key 'Image'
        variant_dir = tmp_path / "hl60" / "low_c00"
        variant_dir.mkdir(parents=True)
        for i in range(2):
            with h5py.File(variant_dir / f"image-final_{i:03d}.h5", "w") as f:
                f.create_dataset("Image", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
            with h5py.File(variant_dir / f"image-labels_{i:03d}.h5", "w") as f:
                f.create_dataset("Image", data=rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        paths = get_mucic_paths(str(tmp_path), cell_line="hl60", variant="low_c00")
        assert len(paths) == 2
        with h5py.File(paths[0], "r") as f:
            assert "labels/instances" in f and "labels/semantic" in f

        loader = get_mucic_loader(str(tmp_path), batch_size=1, patch_shape=(4, 32, 32),
                                  cell_line="hl60", variant="low_c00")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

        # vasculogenesis (2D, semantic pngs -> watershed instances)
        vasc_dir = tmp_path / "vasculogenesis" / "default"
        (vasc_dir / "images").mkdir(parents=True)
        (vasc_dir / "labels").mkdir()
        for i in range(2):
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(vasc_dir / "images" / f"image_{i:04d}.png")
            mask = np.zeros((64, 64), dtype="uint8")
            mask[5:20, 5:20] = 255
            mask[35:55, 35:55] = 255
            Image.fromarray(mask).save(vasc_dir / "labels" / f"mask_{i:04d}.png")

        vpaths = get_mucic_paths(str(tmp_path), cell_line="vasculogenesis")
        assert len(vpaths) == 2
        import h5py as _h5
        with _h5.File(vpaths[0], "r") as f:
            assert f["labels/instances"][:].max() == 2  # watershed split the squares

        # the watershed helper separates two touching blobs
        sem = np.zeros((32, 32), dtype="uint8")
        sem[4:15, 4:28] = 1
        sem[16:28, 4:28] = 1
        inst = _semantic_to_instances_watershed(sem)
        assert inst.max() >= 1

    def test_neurosphere_layout(self, tmp_path):
        import imageio.v3 as iio
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.neurosphere import (
            get_neurosphere_loader, get_neurosphere_paths)

        rng = np.random.default_rng(120)
        data_dir = tmp_path / "neurosphere" / "sample"
        data_dir.mkdir(parents=True)
        iio.imwrite(data_dir / "OriginalStack.tif",
                    (rng.random((8, 64, 64)) * 255).astype("uint8"))
        # thin-shell contour labels: a hollow box per instance
        shells = np.zeros((8, 64, 64), dtype="uint16")
        shells[2:6, 10:30, 10:30] = 1
        shells[3:5, 12:28, 12:28] = 0  # hollow interior -> must be filled
        frames = [Image.fromarray(sl.astype("int32"), mode="I") for sl in shells]
        frames[0].save(data_dir / "Nucleisegmented2.tif", save_all=True,
                       append_images=frames[1:])

        raw_paths, label_paths = get_neurosphere_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 1
        from torch_em_tpu.utils.io import load_image
        filled = np.asarray(load_image(label_paths[0]))
        assert filled[3, 20, 20] == 1  # interior filled

        loader = get_neurosphere_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                        batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_nis3d_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.nis3d import (
            get_nis3d_loader, get_nis3d_paths)

        rng = np.random.default_rng(121)
        for species in ("DrosophilaMelanogaster_1", "MusMusculus_1"):
            d = tmp_path / "NIS3D" / "NIS3D" / species
            d.mkdir(parents=True)
            iio.imwrite(d / "data.tif", (rng.random((8, 64, 64)) * 255).astype("uint8"))
            iio.imwrite(d / "GroundTruth.tif",
                        rng.integers(0, 5, (8, 64, 64)).astype("uint16"))
        # suggestive cross-image split layout
        split_dir = tmp_path / "NIS3D" / "suggestive splitting" / "cross-image" / "train" / "vol1"
        split_dir.mkdir(parents=True)
        iio.imwrite(split_dir / "data.tif", (rng.random((8, 64, 64)) * 255).astype("uint8"))
        iio.imwrite(split_dir / "GroundTruth.tif",
                    rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        raw_paths, label_paths = get_nis3d_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 2
        raw_split, _ = get_nis3d_paths(str(tmp_path), split="train",
                                       split_type="cross-image")
        assert len(raw_split) == 1

        loader = get_nis3d_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_nisnet3d_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.nisnet3d import (
            get_nisnet3d_loader, get_nisnet3d_paths)

        rng = np.random.default_rng(122)
        vol = "Rat_liver_1"
        for sub in ("V1", "synthetic"):
            d = tmp_path / "ground_truth_and_synthetic" / vol / sub
            d.mkdir(parents=True)
            iio.imwrite(d / f"{sub}.tif", (rng.random((8, 64, 64)) * 255).astype("uint8"))
            iio.imwrite(d / f"{sub}_gt.tif",
                        rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        raw_paths, label_paths = get_nisnet3d_paths(str(tmp_path), volumes=[vol])
        # synthetic subfolder must be skipped
        assert len(raw_paths) == len(label_paths) == 1 and "V1" in raw_paths[0]

        loader = get_nisnet3d_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                     batch_size=1, volumes=[vol])
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_nuc_morph_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.nuc_morph import (
            get_nuc_morph_loader, get_nuc_morph_paths)

        rng = np.random.default_rng(123)
        # pre-seed the manifest + the per-FOV tifs (no S3 access)
        (tmp_path / "training_data_manifest.csv").write_text(
            "index,mode\n1,train\n2,train\n3,valid\n")
        (tmp_path / "high_res_100x").mkdir()
        (tmp_path / "watershed_segmentation_100x").mkdir()
        for idx in (1, 2, 3):
            iio.imwrite(tmp_path / "high_res_100x" / f"IMG_{idx:04d}.tif",
                        (rng.random((8, 64, 64)) * 255).astype("uint8"))
            iio.imwrite(tmp_path / "watershed_segmentation_100x" / f"IMG_{idx:04d}.tif",
                        rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        train_paths = get_nuc_morph_paths(str(tmp_path), split="train")
        val_paths = get_nuc_morph_paths(str(tmp_path), split="val")
        assert len(train_paths) == 2 and len(val_paths) == 1

        loader = get_nuc_morph_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                      batch_size=1, split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_oocyteseg_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.oocyteseg import (
            get_oocyteseg_loader, get_oocyteseg_paths)

        rng = np.random.default_rng(124)
        for subdir in ("exp1", "exp2"):
            in_dir = tmp_path / "SegmentationCortex" / "mouse" / subdir / "input"
            mk_dir = tmp_path / "SegmentationCortex" / "mouse" / subdir / "mask"
            in_dir.mkdir(parents=True)
            mk_dir.mkdir(parents=True)
            for i in range(2):
                # RGB inputs are converted to single-channel uint8
                Image.fromarray((rng.random((64, 64, 3)) * 255).astype("uint8")
                                ).save(in_dir / f"im{i}.png")
                mask = np.zeros((64, 64, 3), dtype="uint8")
                mask[10:40, 10:40] = 255
                Image.fromarray(mask).save(mk_dir / f"im{i}.png")

        raw_paths, label_paths = get_oocyteseg_paths(str(tmp_path), split="train",
                                                     species="mouse")
        assert len(raw_paths) == len(label_paths) == 4

        loader = get_oocyteseg_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                      split="train", species="mouse")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)  # grayscale-converted
        assert y.max() <= 1  # binarized masks

    def test_orgaextractor_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.orgaextractor import (
            _preprocess_data, get_orgaextractor_loader, get_orgaextractor_paths)

        rng = np.random.default_rng(125)
        data_dir = tmp_path / "train"
        data_dir.mkdir()
        for i in range(2):
            Image.fromarray((rng.random((64, 64, 3)) * 255).astype("uint8")
                            ).save(data_dir / f"im{i}.jpg")
            mask = np.zeros((64, 64), dtype="uint8")
            mask[5:20, 5:20] = 255
            mask[40:60, 40:60] = 255
            Image.fromarray(mask).save(data_dir / f"im{i}.tif")
        _preprocess_data(str(data_dir))

        image_paths, gt_paths = get_orgaextractor_paths(str(tmp_path), split="train")
        assert len(image_paths) == len(gt_paths) == 2
        from torch_em_tpu.utils.io import load_image
        gt = np.asarray(load_image(gt_paths[0]))
        assert gt.max() == 2  # semantic -> connected-component instances

        loader = get_orgaextractor_loader(str(tmp_path), patch_shape=(32, 32),
                                          batch_size=2, split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_organoid_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.light_microscopy.organoid import (
            get_organoid_loader, get_organoid_paths)

        rng = np.random.default_rng(126)
        # post-preprocessing layout: data/<source>/<split>/*.h5
        for split in ("train", "val"):
            d = tmp_path / "data" / "original" / split
            d.mkdir(parents=True)
            for i in range(2):
                with h5py.File(d / f"im{i}.h5", "w") as f:
                    f.create_dataset("raw", data=(rng.random((3, 64, 64)) * 255).astype("uint8"))
                    f.create_dataset("labels", data=rng.integers(0, 4, (64, 64)).astype("uint16"))
        gdir = tmp_path / "data" / "gemcitabine"
        gdir.mkdir()
        with h5py.File(gdir / "well1.h5", "w") as f:
            f.create_dataset("raw/bf", data=(rng.random((8, 64, 64)) * 255).astype("uint16"))
            f.create_dataset("raw/pi", data=(rng.random((8, 64, 64)) * 255).astype("uint16"))
            f.create_dataset("labels", data=rng.integers(0, 4, (8, 64, 64)).astype("uint16"))

        paths = get_organoid_paths(str(tmp_path), split="train", source="original")
        assert len(paths) == 2

        loader = get_organoid_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                     split="train", source="original")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

        # two-channel gemcitabine screens
        gloader = get_organoid_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                      batch_size=1, source="gemcitabine",
                                      source_channels=["bf", "pi"])
        x, y = next(iter(gloader))
        assert x.shape == (1, 2, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_organoidnet_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.organoidnet import (
            get_organoidnet_loader, get_organoidnet_paths)

        rng = np.random.default_rng(127)
        for split in ("Training", "Validation"):
            (tmp_path / split / "Images").mkdir(parents=True)
            (tmp_path / split / "Masks").mkdir()
            for i in range(2):
                Image.fromarray((rng.random((64, 64)) * 65535).astype("uint16")
                                ).save(tmp_path / split / "Images" / f"im{i}.tif")
                Image.fromarray(rng.integers(0, 4, (64, 64)).astype("uint16")
                                ).save(tmp_path / split / "Masks" / f"im{i}.tif")

        image_paths, label_paths = get_organoidnet_paths(str(tmp_path), split="Training")
        assert len(image_paths) == len(label_paths) == 2

        loader = get_organoidnet_loader(str(tmp_path), split="Training",
                                        patch_shape=(32, 32), batch_size=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_parhyale_regen_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.parhyale_regen import (
            get_parhyale_regen_loader, get_parhyale_regen_paths)

        rng = np.random.default_rng(128)
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        # 50-timepoint hyperstack with z=8, page-flattened as PIL reads it
        iio.imwrite(data_dir / "Parhyale_H2B-EGFP_images_tp01-50.tif",
                    (rng.random((50 * 8, 32, 32)) * 255).astype("uint8"))
        for tp in (1, 11, 21, 31, 41, 50):
            iio.imwrite(data_dir / f"Parhyale_instance-segmentation-labels_tp{tp:02d}.tif",
                        rng.integers(0, 4, (8, 32, 32)).astype("uint16"))

        paths = get_parhyale_regen_paths(str(tmp_path))
        assert len(paths) == 6

        loader = get_parhyale_regen_loader(str(tmp_path), patch_shape=(4, 16, 16),
                                           batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 16, 16)
        assert y.shape[-3:] == (4, 16, 16)

    def test_phmamm_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.phmamm import (
            get_phmamm_loader, get_phmamm_paths)

        rng = np.random.default_rng(129)
        (tmp_path / "data" / "Inputs").mkdir(parents=True)
        (tmp_path / "data" / "ASTEC_Ground_truth").mkdir()
        for i in range(2):
            iio.imwrite(tmp_path / "data" / "Inputs" / f"t{i}.tiff",
                        (rng.random((8, 64, 64)) * 255).astype("uint8"))
            iio.imwrite(tmp_path / "data" / "ASTEC_Ground_truth" / f"t{i}.tiff",
                        rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        raw_paths, label_paths = get_phmamm_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 2

        loader = get_phmamm_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                   binary=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape == (1, 1, 4, 32, 32)

    def test_pnas_arabidopsis_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.light_microscopy.pnas_arabidopsis import (
            get_pnas_arabidopsis_loader, get_pnas_arabidopsis_paths)

        rng = np.random.default_rng(130)
        # post-conversion layout: data/*.h5
        data_dir = tmp_path / "data"
        data_dir.mkdir()
        for i in range(2):
            with h5py.File(data_dir / f"plant{i}_trim-acylYFP.h5", "w") as f:
                f.create_dataset("raw", data=(rng.random((8, 64, 64)) * 255).astype("uint8"))
                f.create_dataset("labels", data=rng.integers(0, 5, (8, 64, 64)).astype("uint16"))

        paths = get_pnas_arabidopsis_paths(str(tmp_path))
        assert len(paths) == 2

        loader = get_pnas_arabidopsis_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                             batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_scaffold_a549_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.light_microscopy.scaffold_a549 import (
            get_scaffold_a549_loader, get_scaffold_a549_paths)

        rng = np.random.default_rng(131)
        for subdir in ("train", "test"):
            (tmp_path / "scaffold_a549" / subdir).mkdir(parents=True)
        np.save(tmp_path / "scaffold_a549" / "test" / "sf_a549_21.npy",
                (rng.random((8, 64, 64)) * 255).astype("float32"))
        np.save(tmp_path / "scaffold_a549" / "test" / "sf_a549_21_Label.npy",
                rng.integers(0, 5, (8, 64, 64)).astype("uint16"))
        np.save(tmp_path / "scaffold_a549" / "train" / "sf_a549_01.npy",
                (rng.random((8, 64, 64)) * 255).astype("float32"))

        raw_paths, label_paths = get_scaffold_a549_paths(str(tmp_path), split="test")
        assert len(raw_paths) == len(label_paths) == 1
        train_raw, train_lab = get_scaffold_a549_paths(str(tmp_path), split="train")
        assert len(train_raw) == 1 and train_lab == []  # train is unlabeled

        loader = get_scaffold_a549_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                          batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_segpc_layout(self, tmp_path):
        import h5py
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.segpc import (
            get_segpc_loader, get_segpc_paths)

        rng = np.random.default_rng(132)
        data_dir = tmp_path / "TCIA_SegPC_dataset" / "train"
        (data_dir / "x").mkdir(parents=True)
        (data_dir / "y").mkdir()
        for i in range(2):
            Image.fromarray((rng.random((64, 64, 3)) * 255).astype("uint8")
                            ).save(data_dir / "x" / f"{i}.bmp")
            # per-instance masks: 40 = nucleus, 20 = rest of the cell
            for k, off in ((1, 8), (2, 36)):
                mask = np.zeros((64, 64), dtype="uint8")
                mask[off:off + 16, off:off + 16] = 20
                mask[off + 4:off + 10, off + 4:off + 10] = 40
                Image.fromarray(mask).save(data_dir / "y" / f"{i}_{k}.bmp")

        volume_paths = get_segpc_paths(str(tmp_path), split="train")
        assert len(volume_paths) == 2
        with h5py.File(volume_paths[0], "r") as f:
            nuclei = f["labels/nuclei"][:]
            cells = f["labels/cells"][:]
        assert nuclei.max() == 2 and cells.max() == 2
        assert (cells > 0).sum() > (nuclei > 0).sum()

        loader = get_segpc_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                  split="train", label_choice="cells")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_slimia_layout(self, tmp_path):
        import imageio.v3 as iio

        from torch_em_tpu.data.datasets.light_microscopy.slimia import (
            get_slimia_loader, get_slimia_paths)

        rng = np.random.default_rng(133)
        micro = "OperaPhenix"
        for cell_line in ("HepG2",):
            im_dir = tmp_path / micro / "Images" / cell_line
            seg_dir = tmp_path / micro / "Manual segmentations" / cell_line
            im_dir.mkdir(parents=True)
            seg_dir.mkdir(parents=True)
            for i in range(2):
                iio.imwrite(im_dir / f"im{i}.ome.tiff",
                            (rng.random((64, 64)) * 255).astype("uint8"))
                iio.imwrite(seg_dir / f"im{i}.ome.tiff",
                            (rng.random((64, 64)) > 0.5).astype("uint8") * 255)

        paths = get_slimia_paths(str(tmp_path), microscope=micro)
        assert len(paths) == 2

        loader = get_slimia_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                   microscope=micro)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.max() <= 1  # binarized

    def test_spheroids_hepg2_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.light_microscopy.spheroids_hepg2 import (
            get_spheroids_hepg2_loader, get_spheroids_hepg2_paths)
        from torch_em_tpu.utils.medical_io import save_nrrd

        rng = np.random.default_rng(134)
        (tmp_path / "spheroids").mkdir()
        (tmp_path / "GT").mkdir()
        for i in range(2):
            save_nrrd(str(tmp_path / "spheroids" / f"sph{i}.nrrd"),
                      (rng.random((8, 64, 64)) * 255).astype("float32"))
            save_nrrd(str(tmp_path / "GT" / f"sph{i}.nrrd"),
                      rng.integers(0, 5, (8, 64, 64)).astype("uint16"))
            # expanded variants must be ignored
            save_nrrd(str(tmp_path / "spheroids" / f"sph{i}_expanded.nrrd"),
                      (rng.random((8, 64, 64)) * 255).astype("float32"))

        raw_paths, label_paths = get_spheroids_hepg2_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 2
        assert not any("expanded" in p for p in raw_paths)

        loader = get_spheroids_hepg2_loader(str(tmp_path), patch_shape=(4, 32, 32),
                                            batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_synthmt_layout(self, tmp_path):
        from io import BytesIO

        import pandas as pd
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.synthmt import (
            get_synthmt_loader, get_synthmt_paths)

        rng = np.random.default_rng(135)

        def _png_bytes(arr):
            buf = BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            return buf.getvalue()

        parquet_dir = tmp_path / "parquets"
        parquet_dir.mkdir()
        for i in range(8):  # the fixed 8-shard hub layout
            img = (rng.random((64, 64, 3)) * 255).astype("uint8")
            masks = []
            for off in (5, 35):
                m = np.zeros((64, 64), dtype="uint8")
                m[off:off + 12, off:off + 12] = 255
                masks.append({"bytes": _png_bytes(m)})
            pd.DataFrame([{"id": f"s{i}", "image": {"bytes": _png_bytes(img)},
                           "mask": masks}]).to_parquet(
                parquet_dir / f"train-{i:05d}-of-00008.parquet")

        image_paths, label_paths = get_synthmt_paths(str(tmp_path))
        assert len(image_paths) == len(label_paths) == 8
        from torch_em_tpu.utils.io import load_image
        inst = np.asarray(load_image(label_paths[0]))
        assert inst.max() == 2  # two decoded masks -> two instances

        loader = get_synthmt_loader(str(tmp_path), patch_shape=(64, 64), batch_size=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 64, 64)
        assert y.shape[-2:] == (64, 64)

    def test_toiam_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.toiam import (
            get_toiam_loader, get_toiam_paths)

        rng = np.random.default_rng(136)
        for seq in ("01", "02"):
            (tmp_path / "data" / seq).mkdir(parents=True)
            (tmp_path / "data" / f"{seq}_GT" / "SEG").mkdir(parents=True)
            for t in range(2):
                Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                                ).save(tmp_path / "data" / seq / f"t{t:03d}.tif")
                Image.fromarray(rng.integers(0, 4, (64, 64)).astype("uint16")
                                ).save(tmp_path / "data" / f"{seq}_GT" / "SEG" / f"man_seg{t:03d}.tif")

        raw_paths, label_paths = get_toiam_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 4

        loader = get_toiam_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_u20s_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.u20s import (
            _process_masks, get_u20s_loader, get_u20s_paths)

        rng = np.random.default_rng(137)
        (tmp_path / "images").mkdir()
        (tmp_path / "masks").mkdir()
        for i in range(2):
            Image.fromarray((rng.random((64, 64)) * 65535).astype("uint16")
                            ).save(tmp_path / "images" / f"im{i}.tif")
            # BBBC039 masks ship as RGBA pngs, instances in channel 0
            mask = np.zeros((64, 64, 4), dtype="uint8")
            mask[5:20, 5:20, 0] = 255
            mask[35:55, 35:55, 0] = 255
            mask[..., 3] = 255
            Image.fromarray(mask).save(tmp_path / "masks" / f"im{i}.png")
        _process_masks(str(tmp_path))
        assert not (tmp_path / "masks").exists()  # consumed

        image_paths, label_paths = get_u20s_paths(str(tmp_path))
        assert len(image_paths) == len(label_paths) == 2
        from torch_em_tpu.utils.io import load_image
        labels = np.asarray(load_image(label_paths[0]))
        assert labels.max() == 2  # connected components split the squares

        loader = get_u20s_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_usiigaci_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.usiigaci import (
            get_usiigaci_loader, get_usiigaci_paths)

        rng = np.random.default_rng(138)
        for s in ("set1", "set2"):
            d = tmp_path / "Usiigaci" / "Mask R-CNN" / "train" / s
            d.mkdir(parents=True)
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(d / "raw.tif")
            Image.fromarray(rng.integers(0, 4, (64, 64)).astype("uint8")
                            ).save(d / "instances_ids.png")

        raw_paths, label_paths = get_usiigaci_paths(str(tmp_path), split="train")
        assert len(raw_paths) == len(label_paths) == 2

        loader = get_usiigaci_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                     split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_vicar_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.vicar import (
            get_vicar_loader, get_vicar_paths)

        rng = np.random.default_rng(139)
        for ct in ("A2058", "G361"):
            d = tmp_path / "labelled" / ct
            d.mkdir(parents=True)
            for i in range(2):
                Image.fromarray((rng.random((64, 64)) * 65535).astype("uint16")
                                ).save(d / f"{i}_img.tif")
                Image.fromarray(rng.integers(0, 4, (64, 64)).astype("uint8")
                                ).save(d / f"{i}_mask.png")

        raw_paths, label_paths = get_vicar_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 4
        a2058_raw, _ = get_vicar_paths(str(tmp_path), cell_types="A2058")
        assert len(a2058_raw) == 2

        loader = get_vicar_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                  cell_types=["A2058"])
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_vibrio_cholerae_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.vibrio_cholerae import (
            get_vibrio_cholerae_loader, get_vibrio_cholerae_paths)

        rng = np.random.default_rng(140)
        data_dir = tmp_path / "training-data-from-experimentally-acquired-images"
        (data_dir / "raw-data").mkdir(parents=True)
        (data_dir / "semi-manual-annotation").mkdir()
        for i in range(2):
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(data_dir / "raw-data" / f"im{i}_raw.tif")
            Image.fromarray(rng.integers(0, 4, (64, 64)).astype("uint16")
                            ).save(data_dir / "semi-manual-annotation" / f"im{i}_labels.tif")

        raw_paths, label_paths = get_vibrio_cholerae_paths(str(tmp_path))
        assert len(raw_paths) == len(label_paths) == 2

        loader = get_vibrio_cholerae_loader(str(tmp_path), patch_shape=(64, 64),
                                            batch_size=2, binary=True)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 64, 64)
        assert y.shape == (2, 1, 64, 64)

    def test_wing_disc_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.light_microscopy.wing_disc import (
            _preprocess_volumes, VOLUMES, get_wing_disc_loader, get_wing_disc_paths)
        from torch_em_tpu.utils.io import write_data

        rng = np.random.default_rng(141)
        zarr_dir = tmp_path / "zarr"
        zarr_dir.mkdir()
        for name in VOLUMES:
            # raw ships (1, 1, Z, Y, X), labels (Z, 1, 1, Y, X)
            write_data(str(zarr_dir / f"{name}.zarr"), "0/0",
                       (rng.random((1, 1, 8, 32, 32)) * 255).astype("uint16"))
            write_data(str(zarr_dir / f"{name}_segmented.zarr"), "0/0",
                       rng.integers(0, 4, (8, 1, 1, 32, 32)).astype("uint16"))
        _preprocess_volumes(str(tmp_path), str(tmp_path / "data"))

        paths = get_wing_disc_paths(str(tmp_path))
        assert len(paths) == len(VOLUMES)

        loader = get_wing_disc_loader(str(tmp_path), patch_shape=(4, 16, 16),
                                      batch_size=1, binary=True)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 16, 16)
        assert y.shape == (1, 1, 4, 16, 16)

    def test_xpress_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.light_microscopy.xpress import (
            _merge_to_single_h5, get_xpress_loader)

        rng = np.random.default_rng(142)
        raw_path = tmp_path / "xpress-training-raw.h5"
        label_path = tmp_path / "xpress-training-voxel-labels.h5"
        with h5py.File(raw_path, "w") as f:
            ds = f.create_dataset("volumes/raw",
                                  data=(rng.random((64, 64, 64)) * 255).astype("uint8"))
            ds.attrs["resolution"] = [10, 10, 10]
        with h5py.File(label_path, "w") as f:
            ds = f.create_dataset("volumes/labels",
                                  data=rng.integers(0, 5, (16, 16, 16)).astype("uint32"))
            ds.attrs["offset"] = [200, 200, 200]  # nm -> voxel 20 with res 10
        out = _merge_to_single_h5(str(raw_path), str(label_path), str(tmp_path / "xpress-training.h5"))
        with h5py.File(out, "r") as f:
            assert f["raw"].shape == f["labels"].shape
            # labeled region sits at voxel offset 20 inside the crop
            assert f["labels"][:].max() > 0

        loader = get_xpress_loader(str(tmp_path), patch_shape=(8, 16, 16), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 16, 16)
        assert y.shape[-3:] == (8, 16, 16)

    def test_yeastcellseg_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.yeastcellseg import (
            _FILENAMES, _create_h5_data, get_yeastcellseg_loader,
            get_yeastcellseg_paths)

        rng = np.random.default_rng(143)
        raw_dir = tmp_path / "raw"
        gt_dir = tmp_path / "gt"
        raw_dir.mkdir()
        gt_dir.mkdir()
        for name in _FILENAMES:
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(raw_dir / f"{name}.tif")
            gt = np.zeros((64, 64), dtype="uint8")
            gt[5:20, 5:20] = 255
            gt[35:55, 35:55] = 255
            Image.fromarray(gt).save(gt_dir / f"{name}_gt.tif")
        _create_h5_data(str(tmp_path), str(raw_dir), str(gt_dir))

        paths = get_yeastcellseg_paths(str(tmp_path))
        assert len(paths) == len(_FILENAMES)
        import h5py
        with h5py.File(paths[0], "r") as f:
            assert f["labels/instances"][:].max() == 2  # cc split the squares

        loader = get_yeastcellseg_loader(str(tmp_path), patch_shape=(32, 32),
                                         batch_size=2, label_choice="semantic")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_yeastms_layout(self, tmp_path):
        import torch

        from torch_em_tpu.data.datasets.light_microscopy.yeastms import (
            get_yeastms_loader, get_yeastms_paths)

        rng = np.random.default_rng(144)
        for sub in ("inputs", "instances", "classes"):
            (tmp_path / "train" / sub).mkdir(parents=True)
        for i in range(2):
            torch.save(torch.from_numpy(rng.random((64, 64)).astype("float32")),
                       tmp_path / "train" / "inputs" / f"s{i}.pt")
            inst = np.zeros((3, 64, 64), dtype="uint8")
            inst[0, 5:15, 5:15] = 1    # cell
            inst[1, 30:40, 30:40] = 1  # cell
            inst[2, 50:60, 50:60] = 1  # trap microstructure
            torch.save(torch.from_numpy(inst), tmp_path / "train" / "instances" / f"s{i}.pt")
            torch.save(torch.from_numpy(np.array([0, 0, 1])),
                       tmp_path / "train" / "classes" / f"s{i}.pt")

        paths = get_yeastms_paths(str(tmp_path), split="train")
        assert len(paths) == 2
        import h5py
        with h5py.File(paths[0], "r") as f:
            labels = f["labels"][:]
        assert labels.max() == 2  # only the two cells, trap excluded
        assert labels[55, 55] == 0

        loader = get_yeastms_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                    split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[0] == 2 and y.shape[-2:] == (32, 32)

    def test_yeastsam_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.yeastsam import (
            get_yeastsam_loader, get_yeastsam_paths)

        rng = np.random.default_rng(145)
        (tmp_path / "DIC").mkdir()
        (tmp_path / "DIC_mask").mkdir()
        for i in range(2):
            Image.fromarray((rng.random((64, 64)) * 65535).astype("uint16")
                            ).save(tmp_path / "DIC" / f"im{i}.tif")
            Image.fromarray(rng.integers(0, 4, (64, 64)).astype("uint16")
                            ).save(tmp_path / "DIC_mask" / f"im{i}.tif")

        image_paths, label_paths = get_yeastsam_paths(str(tmp_path))
        assert len(image_paths) == len(label_paths) == 2

        loader = get_yeastsam_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_yeaz_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.yeaz import (
            get_yeaz_loader, get_yeaz_paths)

        rng = np.random.default_rng(146)
        data_dir = tmp_path / "gold-standard-PhC-plus-2"
        data_dir.mkdir()
        for i in range(10):
            Image.fromarray((rng.random((64, 64)) * 65535).astype("uint16")
                            ).save(data_dir / f"im{i}_im.tif")
            Image.fromarray(rng.integers(0, 4, (64, 64)).astype("uint16")
                            ).save(data_dir / f"im{i}_mask.tif")

        train_raw, train_lab = get_yeaz_paths(str(tmp_path), choice="phc", split="train")
        val_raw, _ = get_yeaz_paths(str(tmp_path), choice="phc", split="val")
        test_raw, _ = get_yeaz_paths(str(tmp_path), choice="phc", split="test")
        assert len(train_raw) + len(val_raw) + len(test_raw) == 10
        assert len(test_raw) == 2  # 20% test split
        assert len(train_raw) == len(train_lab)
        # split is persisted: re-query gives the same files
        again, _ = get_yeaz_paths(str(tmp_path), choice="phc", split="train")
        assert again == train_raw

        loader = get_yeaz_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                 choice="phc", split="train", ndim=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_nisb_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.electron_microscopy.nisb import (
            get_nisb_loader, get_nisb_paths)
        from torch_em_tpu.utils.io import write_data

        rng = np.random.default_rng(90)
        # cached S3 cubes: <setting>/<split>/seed{i}/data.zarr with img/seg (zyx)
        for i in range(1):  # val split has one seed cube
            cube = tmp_path / "base" / "val" / f"seed{i}" / "data.zarr"
            write_data(str(cube), "img", (rng.random((32, 32, 32)) * 255).astype("uint8"))
            write_data(str(cube), "seg", rng.integers(0, 8, (32, 32, 32)).astype("uint16"))

        paths = get_nisb_paths(str(tmp_path), setting="base", split="val")
        assert len(paths) == 1

        loader = get_nisb_loader(str(tmp_path), patch_shape=(8, 16, 16), batch_size=2,
                                 setting="base", split="val", boundaries=True)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 8, 16, 16)
        assert y.shape == (2, 1, 8, 16, 16)

    def test_bmgd_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.bmgd import (
            get_bmgd_loader, get_bmgd_paths)

        rng = np.random.default_rng(91)
        # extracted archive: "<250 Pa>/image/*.tif" + "<250 Pa>/mask/*.tif"
        for sub in ("image", "mask"):
            (tmp_path / "250 Pa" / sub).mkdir(parents=True)
        for i in range(3):
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(tmp_path / "250 Pa" / "image" / f"im{i}.tif")
            Image.fromarray((rng.random((64, 64)) > 0.6).astype("uint8") * 255
                            ).save(tmp_path / "250 Pa" / "mask" / f"im{i}.tif")

        paths = get_bmgd_paths(str(tmp_path), stiffness="250pa")
        assert len(paths) == 3

        loader = get_bmgd_loader(str(tmp_path), batch_size=2, patch_shape=(32, 32),
                                 stiffness="250pa")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_brain_organoids_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.light_microscopy.brain_organoids import (
            get_brain_organoids_loader, get_brain_organoids_paths)

        rng = np.random.default_rng(92)
        (tmp_path / "data" / "imgs").mkdir(parents=True)
        (tmp_path / "data" / "labels").mkdir(parents=True)
        for i in range(3):
            rgb = (rng.random((64, 64, 3)) * 255).astype("uint8")
            Image.fromarray(rgb).save(tmp_path / "data" / "imgs" / f"organoid_{i}.png")
            np.save(tmp_path / "data" / "labels" / f"organoid_{i}.npy",
                    rng.integers(0, 4, (64, 64)).astype("int64"))

        raw_paths, label_paths = get_brain_organoids_paths(str(tmp_path))
        assert len(raw_paths) == 3 and len(label_paths) == 3
        assert all(p.endswith(".tif") for p in label_paths)  # npy -> tif conversion

        loader = get_brain_organoids_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_orgline_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.light_microscopy.orgline import (
            get_orgline_loader, get_orgline_paths)

        rng = np.random.default_rng(93)
        # prepared layout: data1/<organ>/<split>/*.h5 with image/masks
        for organ in ("PDAC", "colon"):
            for split in ("train", "val"):
                d = tmp_path / "data1" / organ / split
                d.mkdir(parents=True)
                for i in range(2):
                    with h5py.File(d / f"im{i}.png.h5", "w") as f:
                        f.create_dataset("image", data=(rng.random((64, 64)) * 255).astype("uint8"))
                        f.create_dataset("masks", data=rng.integers(0, 5, (64, 64)).astype("uint16"))

        train_paths = get_orgline_paths(str(tmp_path), split="train", organs=["PDAC", "colon"])
        assert len(train_paths) == 4
        pdac_only = get_orgline_paths(str(tmp_path), split="val", organs="PDAC")
        assert len(pdac_only) == 2

        loader = get_orgline_loader(str(tmp_path), batch_size=2, patch_shape=(32, 32),
                                    split="train", organs="PDAC")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_tissuenet_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.light_microscopy.tissuenet import (
            get_tissuenet_loader, get_tissuenet_paths)

        rng = np.random.default_rng(94)
        # manual download: per-split npz with X (n, h, w, 2) and y (n, h, w, 2)
        np.savez(tmp_path / "tissuenet_v1.1_train.npz",
                 X=rng.random((3, 64, 64, 2)).astype("float32"),
                 y=rng.integers(0, 5, (3, 64, 64, 2)).astype("int32"))

        paths = get_tissuenet_paths(str(tmp_path), split="train")
        assert len(paths) == 3
        assert all(p.endswith(".zarr") for p in paths)

        loader = get_tissuenet_loader(str(tmp_path), split="train", patch_shape=(32, 32),
                                      batch_size=2, raw_channel="rgb", label_channel="cell")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)
        loader = get_tissuenet_loader(str(tmp_path), split="train", patch_shape=(32, 32),
                                      batch_size=2, raw_channel="nucleus", label_channel="nucleus")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)

    def test_abus_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.abus import (
            get_abus_loader, get_abus_paths)

        rng = np.random.default_rng(95)
        # kaggle MT_Small_Dataset: <Category>/{Original_,Fuzzy_,Ground_Truth_}<Category>/*.png
        for cname in ("Benign", "Malignant"):
            for sub in (f"Original_{cname}", f"Fuzzy_{cname}", f"Ground_Truth_{cname}"):
                d = tmp_path / "MT_Small_Dataset" / cname / sub
                d.mkdir(parents=True)
                for i in range(2):
                    Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                                    ).save(d / f"case{i}.png")

        image_paths, gt_paths = get_abus_paths(str(tmp_path), category="benign")
        assert len(image_paths) == 2 and len(gt_paths) == 2
        fuzzy_paths, _ = get_abus_paths(str(tmp_path), category="malign", image_choice="fuzzy")
        assert len(fuzzy_paths) == 2 and "Fuzzy_Malignant" in fuzzy_paths[0]
        with pytest.raises(ValueError):
            get_abus_paths(str(tmp_path), category="not-a-category")

        loader = get_abus_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                 category="benign")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_acouslic_ai_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.acouslic_ai import (
            get_acouslic_ai_loader, get_acouslic_ai_paths)
        from torch_em_tpu.utils.medical_io import save_mha

        rng = np.random.default_rng(96)
        im_dir = tmp_path / "data" / "images" / "stacked_fetal_ultrasound"
        gt_dir = tmp_path / "data" / "masks" / "stacked_fetal_abdomen"
        im_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(2):
            save_mha(str(im_dir / f"case{i}.mha"), rng.random((12, 48, 48)).astype("float32"))
            save_mha(str(gt_dir / f"case{i}.mha"), rng.integers(0, 3, (12, 48, 48)).astype("uint8"))

        image_paths, gt_paths = get_acouslic_ai_paths(str(tmp_path))
        assert len(image_paths) == 2 and len(gt_paths) == 2

        loader = get_acouslic_ai_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_amd_sd_layout(self, tmp_path):
        import zipfile

        from PIL import Image

        from torch_em_tpu.data.datasets.medical.amd_sd import (
            MAPPING_IDS, get_amd_sd_loader, get_amd_sd_paths)

        rng = np.random.default_rng(97)
        # figshare zip: AMD-SD/images/<patient>/*.png side-by-side image|annotation;
        # the module splits them and maps the RGB annotation colors to label ids
        src = tmp_path / "src" / "AMD-SD" / "images"
        colors = list(MAPPING_IDS) + [(0, 0, 0)]
        for pid in range(3):
            d = src / f"patient{pid:03d}"
            d.mkdir(parents=True)
            for i in range(2):
                im = (rng.random((32, 32, 3)) * 255).astype("uint8")
                ann = np.array(colors, dtype="uint8")[
                    rng.integers(0, len(colors), (32, 32))]
                Image.fromarray(np.concatenate([im, ann], axis=1)).save(d / f"b{i}.png")
        zip_path = tmp_path / "AMD-SD.zip"
        with zipfile.ZipFile(zip_path, "w") as z:
            for f in sorted(src.rglob("*.png")):
                z.write(f, f.relative_to(tmp_path / "src"))

        # patients split 100/15/rest -> with 3 fabricated patients only train is non-empty
        raw_paths, label_paths = get_amd_sd_paths(str(tmp_path), split="train")
        assert len(raw_paths) == 6 and len(label_paths) == 6
        with pytest.raises(ValueError):
            get_amd_sd_paths(str(tmp_path), split="not-a-split")
        lab = np.asarray(Image.open(label_paths[0]))
        assert lab.ndim == 2 and lab.max() <= 5

        loader = get_amd_sd_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                   split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_autopet_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.autopet import (
            get_autopet_loader, get_autopet_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(98)
        # nifti.zip layout: AutoPET-II/FDG-PET-CT-Lesions/<patient>/<study>/{CTres,SUV,SEG}.nii.gz
        for pid in range(2):
            d = tmp_path / "AutoPET-II" / "FDG-PET-CT-Lesions" / f"PETCT_{pid}" / "study0"
            d.mkdir(parents=True)
            save_nifti(str(d / "CTres.nii.gz"), rng.random((12, 48, 48)).astype("float32"))
            save_nifti(str(d / "SUV.nii.gz"), rng.random((12, 48, 48)).astype("float32"))
            save_nifti(str(d / "SEG.nii.gz"), rng.integers(0, 2, (12, 48, 48)).astype("uint8"))

        raw_paths, label_paths = get_autopet_paths(str(tmp_path), modality="CT")
        assert len(raw_paths) == 2 and len(label_paths) == 2
        both_paths, _ = get_autopet_paths(str(tmp_path))
        assert len(both_paths) == 2 and len(both_paths[0]) == 2
        with pytest.raises(ValueError):
            get_autopet_paths(str(tmp_path), modality="MRI")

        loader = get_autopet_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                    modality="CT")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)
        # stacked PET/CT channels
        loader = get_autopet_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 2, 8, 32, 32)

    def test_btcv_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.btcv import (
            get_btcv_loader, get_btcv_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(99)
        # manually downloaded synapse zips, unpacked: <Anatomy>/RawData/Training/{img,label}
        for region in ("Abdomen", "Cervix"):
            im_dir = tmp_path / region / "RawData" / "Training" / "img"
            gt_dir = tmp_path / region / "RawData" / "Training" / "label"
            im_dir.mkdir(parents=True)
            gt_dir.mkdir(parents=True)
            for i in range(2):
                save_nifti(str(im_dir / f"img{i:04d}.nii.gz"),
                           rng.random((12, 48, 48)).astype("float32"))
                save_nifti(str(gt_dir / f"label{i:04d}.nii.gz"),
                           rng.integers(0, 5, (12, 48, 48)).astype("uint8"))

        raw_paths, label_paths = get_btcv_paths(str(tmp_path), anatomy="Abdomen")
        assert len(raw_paths) == 2 and len(label_paths) == 2
        all_raw, _ = get_btcv_paths(str(tmp_path))  # auto-detects both anatomies
        assert len(all_raw) == 4
        with pytest.raises(NotImplementedError):
            get_btcv_paths(str(tmp_path), anatomy="Abdomen", download=True)

        loader = get_btcv_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                 anatomy="Abdomen")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_camus_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.camus import (
            get_camus_loader, get_camus_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(100)
        # database_nifti/<patient>/<patient>_{2CH,4CH}_half_sequence(_gt).nii.gz
        for pid in (1, 2):
            d = tmp_path / "database_nifti" / f"patient{pid:04d}"
            d.mkdir(parents=True)
            for ch in ("2CH", "4CH"):
                save_nifti(str(d / f"patient{pid:04d}_{ch}_half_sequence.nii.gz"),
                           rng.random((8, 48, 48)).astype("float32"))
                save_nifti(str(d / f"patient{pid:04d}_{ch}_half_sequence_gt.nii.gz"),
                           rng.integers(0, 4, (8, 48, 48)).astype("uint8"))

        image_paths, gt_paths = get_camus_paths(str(tmp_path))
        assert len(image_paths) == 4 and len(gt_paths) == 4
        two_ch, _ = get_camus_paths(str(tmp_path), chamber=2)
        assert len(two_ch) == 2 and all("_2CH_" in p for p in two_ch)

        loader = get_camus_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                  chamber=4)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        assert y.shape[-3:] == (4, 32, 32)

    def test_cbis_ddsm_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.cbis_ddsm import (
            get_cbis_ddsm_loader, get_cbis_ddsm_paths)

        rng = np.random.default_rng(101)
        # kaggle DATA/<task>/<Train|Test>/<tumour_type>/*_{FULL,MASK}_*.png
        for task in ("Calc", "Mass"):
            d = tmp_path / "DATA" / task / "Train" / "MALIGNANT"
            d.mkdir(parents=True)
            for i in range(2):
                Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                                ).save(d / f"case{i}_FULL_1.png")
                Image.fromarray((rng.random((64, 64)) > 0.7).astype("uint8") * 255
                                ).save(d / f"case{i}_MASK_1.png")

        # the published Train folder is re-split: first 125 pairs -> Val
        image_paths, gt_paths = get_cbis_ddsm_paths(str(tmp_path), split="Val", task="Calc")
        assert len(image_paths) == 2 and len(gt_paths) == 2
        train_paths, _ = get_cbis_ddsm_paths(str(tmp_path), split="Train", task="Calc")
        assert len(train_paths) == 0
        both, _ = get_cbis_ddsm_paths(str(tmp_path), split="Val",
                                      tumour_type="MALIGNANT")
        assert len(both) == 4
        with pytest.raises(ValueError):
            get_cbis_ddsm_paths(str(tmp_path), split="not-a-split")

        loader = get_cbis_ddsm_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                      split="Val", task="Mass")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_chaos_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.chaos import (
            get_chaos_loader, get_chaos_paths)
        from torch_em_tpu.utils.medical_io import load_nifti

        rng = np.random.default_rng(102)
        # Train_Sets/CT/<id>/{DICOM_anon,Ground}/ slices; MR/<id>/{T1DUAL,T2SPIR}
        # (the preprocessing stacks slices to nifti; png slices drive the
        # non-dicom fallback without pydicom)
        base = tmp_path / "data" / "Train_Sets"
        for uid in ("1", "2"):
            ct = base / "CT" / uid
            (ct / "DICOM_anon").mkdir(parents=True)
            (ct / "Ground").mkdir(parents=True)
            for i in range(4):
                Image.fromarray((rng.random((48, 48)) * 255).astype("uint8")
                                ).save(ct / "DICOM_anon" / f"i{i}.png")
                Image.fromarray((rng.random((48, 48)) > 0.6).astype("uint8") * 63
                                ).save(ct / "Ground" / f"i{i}.png")
            mr = base / "MR" / uid
            (mr / "T1DUAL" / "DICOM_anon" / "InPhase").mkdir(parents=True)
            (mr / "T1DUAL" / "Ground").mkdir(parents=True)
            (mr / "T2SPIR" / "DICOM_anon").mkdir(parents=True)
            (mr / "T2SPIR" / "Ground").mkdir(parents=True)
            for i in range(4):
                for im_d, gt_d in ((mr / "T1DUAL" / "DICOM_anon" / "InPhase",
                                    mr / "T1DUAL" / "Ground"),
                                   (mr / "T2SPIR" / "DICOM_anon", mr / "T2SPIR" / "Ground")):
                    Image.fromarray((rng.random((48, 48)) * 255).astype("uint8")
                                    ).save(im_d / f"i{i}.png")
                    Image.fromarray((rng.random((48, 48)) > 0.6).astype("uint8") * 63
                                    ).save(gt_d / f"i{i}.png")

        image_paths, gt_paths = get_chaos_paths(str(tmp_path), modality="CT")
        assert len(image_paths) == 2 and len(gt_paths) == 2
        assert load_nifti(image_paths[0]).shape == (48, 48, 4)
        mr_imgs, _ = get_chaos_paths(str(tmp_path), modality="MRI")
        assert len(mr_imgs) == 4  # T1DUAL + T2SPIR per patient
        with pytest.raises(ValueError):
            get_chaos_paths(str(tmp_path), modality="PET")

        loader = get_chaos_loader(str(tmp_path), patch_shape=(32, 32, 4), batch_size=1,
                                  modality="CT")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32, 4)

    def test_cholecseg8k_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.cholecseg8k import (
            LABEL_MAPS, get_cholecseg8k_loader, get_cholecseg8k_paths)

        rng = np.random.default_rng(103)
        # kaggle: data/video<NN>/video<NN>_<frame>/*_endo.png + watershed masks
        colors = list(LABEL_MAPS)
        for vid in range(1, 6):
            d = tmp_path / "data" / f"video{vid:02d}" / f"video{vid:02d}_00080"
            d.mkdir(parents=True)
            for i in range(2):
                rgb = (rng.random((32, 32, 3)) * 255).astype("uint8")
                Image.fromarray(rgb).save(d / f"frame_{i}_endo.png")
                mask = np.array(colors, dtype="uint8")[
                    rng.integers(0, len(colors), (32, 32))]
                Image.fromarray(mask).save(d / f"frame_{i}_endo_watershed_mask.png")

        # 5 videos: train = middle 1, val/test = the outer pairs
        image_paths, gt_paths = get_cholecseg8k_paths(str(tmp_path), split="train")
        assert len(image_paths) == 2 and len(gt_paths) == 2
        val_imgs, _ = get_cholecseg8k_paths(str(tmp_path), split="val")
        assert len(val_imgs) == 4
        with pytest.raises(ValueError):
            get_cholecseg8k_paths(str(tmp_path), split="not-a-split")
        lab = np.asarray(Image.open(gt_paths[0]))
        assert lab.ndim == 2 and lab.max() <= 12

        loader = get_cholecseg8k_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                        split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_covid19_seg_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.covid19_seg import (
            get_covid19_seg_loader, get_covid19_seg_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(104)
        im_dir = tmp_path / "images" / "COVID-19-CT-Seg_20cases"
        gt_dir = tmp_path / "gt" / "Lung_Mask"
        im_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(2):
            save_nifti(str(im_dir / f"case{i}.nii.gz"),
                       rng.random((12, 48, 48)).astype("float32"))
            save_nifti(str(gt_dir / f"case{i}.nii.gz"),
                       rng.integers(0, 3, (12, 48, 48)).astype("uint8"))

        image_paths, gt_paths = get_covid19_seg_paths(str(tmp_path), task="lung")
        assert len(image_paths) == 2 and len(gt_paths) == 2
        with pytest.raises(AssertionError):
            get_covid19_seg_paths(str(tmp_path), task="not-a-task")

        loader = get_covid19_seg_loader(str(tmp_path), patch_shape=(8, 32, 32),
                                        batch_size=1, task="lung")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_covid_qu_ex_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.covid_qu_ex import (
            get_covid_qu_ex_loader, get_covid_qu_ex_paths)

        rng = np.random.default_rng(105)
        base = (tmp_path / "data" / "Lung Segmentation Data" / "Lung Segmentation Data"
                / "Train")
        for ptype in ("COVID-19", "Normal"):
            for sub in ("images", "lung masks"):
                d = base / ptype / sub
                d.mkdir(parents=True)
                for i in range(2):
                    Image.fromarray((rng.random((48, 48)) * 255).astype("uint8")
                                    ).save(d / f"im{i}.png")

        image_paths, gt_paths = get_covid_qu_ex_paths(
            str(tmp_path), split="train", task="lung", patient_type="covid19")
        assert len(image_paths) == 2 and len(gt_paths) == 2
        all_imgs, _ = get_covid_qu_ex_paths(str(tmp_path), split="train", task="lung")
        assert len(all_imgs) == 4
        with pytest.raises(ValueError):
            get_covid_qu_ex_paths(str(tmp_path), split="train", task="not-a-task")
        with pytest.raises(AssertionError):
            get_covid_qu_ex_paths(str(tmp_path), split="train", task="lung",
                                  segmentation_mask="infection")

        loader = get_covid_qu_ex_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                        split="train", task="lung", patient_type="normal")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_ct_cadaiver_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.ct_cadaiver import (
            get_ct_cadaiver_loader, get_ct_cadaiver_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(106)
        im_dir = tmp_path / "CadAIver study" / "Images"
        gt_dir = tmp_path / "CadAIver study" / "Segmentations"
        im_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(2):
            save_nifti(str(im_dir / f"case{i}.nii.gz"),
                       rng.random((12, 48, 48)).astype("float32"))
            save_nifti(str(gt_dir / f"case{i}_seg.nii.gz"),
                       rng.integers(0, 5, (12, 48, 48)).astype("uint8"))

        raw_paths, label_paths = get_ct_cadaiver_paths(str(tmp_path))
        assert len(raw_paths) == 2 and len(label_paths) == 2
        assert all(p.endswith("_seg.nii.gz") for p in label_paths)

        loader = get_ct_cadaiver_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_curvas_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.curvas import (
            get_curvas_loader, get_curvas_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(107)
        # training_set/<patient>/{image,annotation_1..3}.nii.gz; the module
        # converts each patient to an h5 with raw + three rater groups
        for pid in ("UKCHLL001", "UKCHLL002"):
            d = tmp_path / "training_set" / pid
            d.mkdir(parents=True)
            save_nifti(str(d / "image.nii.gz"), rng.random((48, 48, 12)).astype("float32"))
            for i in (1, 2, 3):
                save_nifti(str(d / f"annotation_{i}.nii.gz"),
                           rng.integers(0, 4, (48, 48, 12)).astype("float32"))

        paths = get_curvas_paths(str(tmp_path))
        assert len(paths) == 2 and all(p.endswith("data.h5") for p in paths)
        import h5py
        with h5py.File(paths[0], "r") as f:
            assert f["raw"].shape == (12, 48, 48)
            assert set(f["labels"]) == {"rater_1", "rater_2", "rater_3"}

        loader = get_curvas_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                   rater="2")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_dca1_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.dca1 import (
            get_dca1_loader, get_dca1_paths)

        rng = np.random.default_rng(108)
        d = tmp_path / "Database_134_Angiograms"
        d.mkdir(parents=True)
        for i in range(1, 4):
            Image.fromarray((rng.random((64, 64)) * 255).astype("uint8")
                            ).save(d / f"{i}.pgm")
            Image.fromarray((rng.random((64, 64)) > 0.7).astype("uint8") * 255
                            ).save(d / f"{i}_gt.pgm")

        image_paths, gt_paths = get_dca1_paths(str(tmp_path), split="train")
        assert len(image_paths) == 3 and len(gt_paths) == 3
        assert all(p.endswith("_gt.pgm") for p in gt_paths)
        with pytest.raises(ValueError):
            get_dca1_paths(str(tmp_path), split="not-a-split")

        loader = get_dca1_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                 split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_dsad_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.dsad import (
            get_dsad_loader, get_dsad_paths)

        rng = np.random.default_rng(109)
        # data/<organ>/<sequence>/image##.png + mask##.png (multilabel excluded)
        for organ in ("liver", "pancreas", "multilabel"):
            d = tmp_path / "data" / organ / "01"
            d.mkdir(parents=True)
            for i in range(2):
                Image.fromarray((rng.random((32, 32, 3)) * 255).astype("uint8")
                                ).save(d / f"image{i:02d}.png")
                Image.fromarray((rng.random((32, 32)) > 0.6).astype("uint8") * 255
                                ).save(d / f"mask{i:02d}.png")

        image_paths, mask_paths = get_dsad_paths(str(tmp_path), organ="liver")
        assert len(image_paths) == 2 and len(mask_paths) == 2
        all_imgs, _ = get_dsad_paths(str(tmp_path))  # multilabel excluded
        assert len(all_imgs) == 4
        with pytest.raises(AssertionError):
            get_dsad_paths(str(tmp_path), organ="not-an-organ")

        loader = get_dsad_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                 organ="pancreas")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_duke_liver_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.duke_liver import (
            get_duke_liver_loader, get_duke_liver_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(110)
        # manual download; preprocessed nifti cache (the dicom conversion
        # needs the optional pydicom package, so the cache drives the test)
        (tmp_path / "data" / "Segmentation").mkdir(parents=True)
        im_dir = tmp_path / "data" / "preprocessed" / "images"
        gt_dir = tmp_path / "data" / "preprocessed" / "masks"
        im_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(2):
            save_nifti(str(im_dir / f"000{i}_01.nii.gz"),
                       rng.random((12, 48, 48)).astype("float32"))
            save_nifti(str(gt_dir / f"000{i}_01.nii.gz"),
                       rng.integers(0, 2, (12, 48, 48)).astype("uint8"))

        with pytest.raises(NotImplementedError):
            get_duke_liver_paths(str(tmp_path / "nonexistent"), download=True)
        image_paths, gt_paths = get_duke_liver_paths(str(tmp_path))
        assert len(image_paths) == 2 and len(gt_paths) == 2

        loader = get_duke_liver_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_feta24_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.feta24 import (
            get_feta24_loader, get_feta24_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(111)
        for sid in (1, 2):
            d = tmp_path / "feta_2.3" / f"sub-{sid:03d}" / "anat"
            d.mkdir(parents=True)
            save_nifti(str(d / f"sub-{sid:03d}_rec-mial_T2w.nii.gz"),
                       rng.random((12, 48, 48)).astype("float32"))
            save_nifti(str(d / f"sub-{sid:03d}_rec-mial_dseg.nii.gz"),
                       rng.integers(0, 8, (12, 48, 48)).astype("uint8"))

        with pytest.raises(NotImplementedError):
            get_feta24_paths(str(tmp_path), download=True)
        image_paths, gt_paths = get_feta24_paths(str(tmp_path))
        assert len(image_paths) == 2 and len(gt_paths) == 2

        loader = get_feta24_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_fundus_avseg_layout(self, tmp_path):
        import zipfile

        from PIL import Image

        from torch_em_tpu.data.datasets.medical.fundus_avseg import (
            get_fundus_avseg_loader, get_fundus_avseg_paths)

        rng = np.random.default_rng(112)
        # figshare zip: Fundus-AVSeg/{images,annotation}/*.png + training/testing.txt;
        # unzip triggers the RGB -> class-id label conversion
        src = tmp_path / "src" / "Fundus-AVSeg"
        (src / "images").mkdir(parents=True)
        (src / "annotation").mkdir(parents=True)
        colors = [(255, 0, 0), (0, 0, 255), (0, 255, 0), (255, 255, 255), (0, 0, 0)]
        fnames = [f"im{i}.png" for i in range(3)]
        for f in fnames:
            Image.fromarray((rng.random((32, 32, 3)) * 255).astype("uint8")
                            ).save(src / "images" / f)
            ann = np.array(colors, dtype="uint8")[rng.integers(0, len(colors), (32, 32))]
            Image.fromarray(ann).save(src / "annotation" / f)
        (src / "training.txt").write_text("\n".join(["filename"] + fnames) + "\n")
        (src / "testing.txt").write_text("filename\n")
        zip_path = tmp_path / "Fundus_AVSeg.zip"
        with zipfile.ZipFile(zip_path, "w") as z:
            for f in sorted(src.rglob("*")):
                if f.is_file():
                    z.write(f, f.relative_to(tmp_path / "src"))

        # 3 fabricated pairs: train = fnames[:-15] is empty, val = all 3
        raw_paths, label_paths = get_fundus_avseg_paths(str(tmp_path), split="val")
        assert len(raw_paths) == 3 and len(label_paths) == 3
        assert all(p.endswith(".tif") for p in label_paths)
        lab = np.asarray(Image.open(label_paths[0]))
        assert lab.ndim == 2 and lab.max() <= 4
        with pytest.raises(ValueError):
            get_fundus_avseg_paths(str(tmp_path), split="not-a-split")

        loader = get_fundus_avseg_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                         split="val")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_han_seg_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.han_seg import (
            get_han_seg_loader, get_han_seg_paths)
        from torch_em_tpu.utils.medical_io import load_nifti, save_nrrd

        rng = np.random.default_rng(113)
        # HaN-Seg/set_1/case_XX/*.nrrd: CT volume + per-organ masks (+ skipped MR)
        for case in ("case_01", "case_02"):
            d = tmp_path / "HaN-Seg" / "set_1" / case
            d.mkdir(parents=True)
            save_nrrd(str(d / f"{case}_IMG_CT.nrrd"),
                      rng.random((12, 48, 48)).astype("float32"))
            save_nrrd(str(d / f"{case}_IMG_MR_T1.nrrd"),
                      rng.random((12, 48, 48)).astype("float32"))
            for organ in ("OAR_A_Carotid_L", "OAR_Bone_Mandible"):
                save_nrrd(str(d / f"{case}_{organ}.nrrd"),
                          (rng.random((12, 48, 48)) > 0.7).astype("uint8"))

        image_paths, gt_paths = get_han_seg_paths(str(tmp_path))
        assert len(image_paths) == 2 and len(gt_paths) == 2
        gt = load_nifti(gt_paths[0])
        assert gt.max() == 2  # two organs merged into one multi-class volume

        loader = get_han_seg_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_hil_toothseg_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.hil_toothseg import (
            get_hil_toothseg_loader, get_hil_toothseg_paths)

        rng = np.random.default_rng(114)
        im_dir = tmp_path / "Teeth Segmentation PNG" / "d2" / "img"
        gt_dir = tmp_path / "Teeth Segmentation PNG" / "d2" / "masks_machine"
        im_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(3):
            Image.fromarray((rng.random((48, 48)) * 255).astype("uint8")
                            ).save(im_dir / f"{i}.png")
            # color-coded teeth masks (converted to instance ids by the module)
            mask = np.zeros((48, 48, 3), dtype="uint8")
            mask[8:16, 8:16] = (255, 0, 0)
            mask[24:32, 24:32] = (0, 255, 0)
            Image.fromarray(mask).save(gt_dir / f"{i}.png")

        image_paths, gt_paths = get_hil_toothseg_paths(str(tmp_path), split="train")
        assert len(image_paths) == 3 and len(gt_paths) == 3
        assert all(p.endswith(".tif") for p in gt_paths)
        lab = np.asarray(Image.open(gt_paths[0]))
        assert set(np.unique(lab)) == {0, 1, 2}
        with pytest.raises(ValueError):
            get_hil_toothseg_paths(str(tmp_path), split="not-a-split")

        loader = get_hil_toothseg_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                         split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_idrid_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.idrid import (
            get_idrid_loader, get_idrid_paths)

        rng = np.random.default_rng(115)
        seg = tmp_path / "data" / "A.%20Segmentation" / "A. Segmentation"
        im_dir = seg / "1. Original Images" / "a. Training Set"
        gt_dir = seg / "2. All Segmentation Groundtruths" / "a. Training Set" / "5. Optic Disc"
        im_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(1, 3):
            Image.fromarray((rng.random((48, 48, 3)) * 255).astype("uint8")
                            ).save(im_dir / f"IDRiD_{i:02d}.jpg")
            Image.fromarray((rng.random((48, 48)) > 0.7).astype("uint8") * 255
                            ).save(gt_dir / f"IDRiD_{i:02d}_OD.tif")

        image_paths, gt_paths = get_idrid_paths(str(tmp_path), split="train",
                                                task="optic_disc")
        assert len(image_paths) == 2 and len(gt_paths) == 2
        assert all(os.path.exists(p) for p in image_paths)

        loader = get_idrid_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                  split="train", task="optic_disc")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_ircadb_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.medical.ircadb import (
            get_ircadb_loader, get_ircadb_paths)

        rng = np.random.default_rng(116)
        # preprocessed h5 cache (dicom conversion needs optional pydicom)
        (tmp_path / "data").mkdir(parents=True)
        for pid in ("3Dircadb1.1", "3Dircadb1.2"):
            with h5py.File(tmp_path / "data" / f"{pid}.h5", "w") as f:
                f.create_dataset("raw", data=rng.random((12, 48, 48)).astype("float32"))
                f.create_dataset("labels/liver",
                                 data=(rng.random((12, 48, 48)) > 0.6).astype("uint8"))

        paths = get_ircadb_paths(str(tmp_path))
        assert len(paths) == 2

        loader = get_ircadb_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                   organ="liver")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_isles_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.isles import (
            get_isles_loader, get_isles_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(117)
        for case in ("sub-strokecase0001", "sub-strokecase0002"):
            dwi = tmp_path / "ISLES-2022" / case / "ses-0001" / "dwi"
            dwi.mkdir(parents=True)
            for mod in ("dwi", "adc"):
                save_nifti(str(dwi / f"{case}_ses-0001_{mod}.nii.gz"),
                           rng.random((12, 48, 48)).astype("float32"))
            deriv = tmp_path / "ISLES-2022" / "derivatives" / case / "ses-0001"
            deriv.mkdir(parents=True)
            save_nifti(str(deriv / f"{case}_ses-0001_msk.nii.gz"),
                       rng.integers(0, 2, (12, 48, 48)).astype("uint8"))

        image_paths, gt_paths = get_isles_paths(str(tmp_path), modality="dwi")
        assert len(image_paths) == 2 and len(gt_paths) == 2
        adc_paths, _ = get_isles_paths(str(tmp_path), modality="adc")
        assert all("_adc" in p for p in adc_paths)
        with pytest.raises(AssertionError):
            get_isles_paths(str(tmp_path), modality="flair")

        loader = get_isles_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_jnuifm_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.jnuifm import (
            get_jnuifm_loader, get_jnuifm_paths)
        from torch_em_tpu.utils.medical_io import save_mha

        rng = np.random.default_rng(118)
        d = tmp_path / "Pubic Symphysis-Fetal Head Segmentation and Angle of Progression"
        (d / "image_mha").mkdir(parents=True)
        (d / "label_mha").mkdir(parents=True)
        for i in range(2):
            save_mha(str(d / "image_mha" / f"{i:05d}.mha"),
                     (rng.random((48, 48, 3)) * 255).astype("uint8"))
            save_mha(str(d / "label_mha" / f"{i:05d}.mha"),
                     rng.integers(0, 3, (48, 48)).astype("uint8"))

        image_paths, gt_paths = get_jnuifm_paths(str(tmp_path))
        assert len(image_paths) == 2 and len(gt_paths) == 2

        loader = get_jnuifm_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_kits_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.medical.kits import (
            get_kits_loader, get_kits_paths)

        rng = np.random.default_rng(119)
        # preprocessed split dirs with per-patient h5 (raw + labels/all +
        # per-rater masks); download goes through the kits23 challenge CLI
        for split, cases in (("train", 2), ("val", 1), ("test", 1)):
            d = tmp_path / "preprocessed" / split
            d.mkdir(parents=True)
            for i in range(cases):
                with h5py.File(d / f"case_{i:05d}.h5", "w") as f:
                    f.create_dataset("raw", data=rng.random((12, 48, 48)).astype("float32"))
                    f.create_dataset("labels/all",
                                     data=rng.integers(0, 4, (12, 48, 48)).astype("uint8"))
                    f.create_dataset("labels/kidney/rater_1",
                                     data=(rng.random((12, 48, 48)) > 0.6).astype("uint8"))

        assert len(get_kits_paths(str(tmp_path), split="train")) == 2
        assert len(get_kits_paths(str(tmp_path), split="val")) == 1
        with pytest.raises(ValueError):
            get_kits_paths(str(tmp_path), split="not-a-split")

        loader = get_kits_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                 split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        loader = get_kits_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                 split="train", rater=1, annotation_choice="kidney")
        x, y = next(iter(loader))
        assert y.shape[-3:] == (8, 32, 32)

    def test_leg_3d_us_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.leg_3d_us import (
            get_leg_3d_us_loader, get_leg_3d_us_paths)
        from torch_em_tpu.utils.medical_io import load_mha, save_mha

        rng = np.random.default_rng(120)
        # <split>/<case>/x*.mha volumes + masksX*.mha labels (ids 100/150/200)
        for case in ("S1", "S2"):
            d = tmp_path / "train" / case
            d.mkdir(parents=True)
            save_mha(str(d / "x001.mha"), rng.random((12, 48, 48)).astype("float32"))
            labels = rng.choice([0, 100, 150, 200], (12, 48, 48)).astype("uint8")
            save_mha(str(d / "masksX001.mha"), labels)

        raw_paths, label_paths = get_leg_3d_us_paths(str(tmp_path), split="train")
        assert len(raw_paths) == 2 and len(label_paths) == 2
        assert all(p.endswith("_preprocessed.mha") for p in label_paths)
        lab = np.asarray(load_mha(label_paths[0]))
        assert lab.max() <= 3  # 100/150/200 remapped to 1/2/3
        with pytest.raises(ValueError):
            get_leg_3d_us_paths(str(tmp_path), split="not-a-split")

        loader = get_leg_3d_us_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                      split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_lgg_mri_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.medical.lgg_mri import (
            get_lgg_mri_loader, get_lgg_mri_paths)

        rng = np.random.default_rng(121)
        # merged per-patient volumes: data/TCGA_*.h5 with raw/<channel> + labels
        (tmp_path / "data").mkdir(parents=True)
        for i in range(3):
            with h5py.File(tmp_path / "data" / f"TCGA_CS_{i:04d}.h5", "w") as f:
                for c in ("pre_contrast", "flair", "post_contrast"):
                    f.create_dataset(f"raw/{c}",
                                     data=rng.random((8, 48, 48)).astype("float32"))
                f.create_dataset("labels",
                                 data=(rng.random((8, 48, 48)) > 0.7).astype("uint8"))

        paths = get_lgg_mri_paths(str(tmp_path), split="train")
        assert len(paths) == 3
        assert len(get_lgg_mri_paths(str(tmp_path), split="val")) == 0
        with pytest.raises(ValueError):
            get_lgg_mri_paths(str(tmp_path), split="not-a-split")

        loader = get_lgg_mri_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                    split="train", channels="flair")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 32, 32)
        # all three modalities stacked as channels
        loader = get_lgg_mri_loader(str(tmp_path), patch_shape=(4, 32, 32), batch_size=1,
                                    split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 4, 32, 32)

    def test_m2caiseg_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.m2caiseg import (
            LABEL_MAPS, get_m2caiseg_loader, get_m2caiseg_paths)

        rng = np.random.default_rng(122)
        colors = list(LABEL_MAPS)
        for split, n in (("train", 2), ("trainval", 3)):
            im_dir = tmp_path / "m2caiSeg dataset" / split / "images"
            gt_dir = tmp_path / "m2caiSeg dataset" / split / "groundtruth"
            im_dir.mkdir(parents=True)
            gt_dir.mkdir(parents=True)
            for i in range(n):
                Image.fromarray((rng.random((32, 32, 3)) * 255).astype("uint8")
                                ).save(im_dir / f"frame{i}.jpg")
                gt = np.array(colors, dtype="uint8")[
                    rng.integers(0, len(colors), (32, 32))]
                Image.fromarray(gt).save(gt_dir / f"frame{i}.png")

        image_paths, gt_paths = get_m2caiseg_paths(str(tmp_path), split="train")
        assert len(image_paths) == 2 and len(gt_paths) == 2
        assert all(p.endswith(".tif") for p in gt_paths)
        # val = trainval frames not in train (frame2 only)
        val_imgs, _ = get_m2caiseg_paths(str(tmp_path), split="val")
        assert len(val_imgs) == 1

        loader = get_m2caiseg_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2,
                                     split="train")
        x, y = next(iter(loader))
        assert x.shape == (2, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_mbh_seg_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.mbh_seg import (
            get_mbh_seg_loader, get_mbh_seg_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(123)
        im_dir = tmp_path / "label_192" / "images"
        gt_dir = tmp_path / "label_192" / "ground truths"
        im_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(2):
            save_nifti(str(im_dir / f"ID_{i}.nii.gz"),
                       rng.random((12, 48, 48)).astype("float32"))
            save_nifti(str(gt_dir / f"ID_{i}.nii.gz"),
                       rng.integers(0, 6, (12, 48, 48)).astype("uint8"))

        image_paths, gt_paths = get_mbh_seg_paths(str(tmp_path))
        assert len(image_paths) == 2 and len(gt_paths) == 2

        loader = get_mbh_seg_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_mice_tumseg_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.mice_tumseg import (
            get_mice_tumseg_loader, get_mice_tumseg_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(124)
        for i in range(2):
            d = tmp_path / "TumSeg database" / "Dataset A" / f"mouse{i}"
            d.mkdir(parents=True)
            save_nifti(str(d / f"CT_{i}.nii.gz"),
                       rng.random((12, 48, 48)).astype("float32"))
            for rater in ("Annotator_A", "Annotator_B", "STAPLE"):
                save_nifti(str(d / f"{rater}_{i}.nii.gz"),
                           rng.integers(0, 2, (12, 48, 48)).astype("uint8"))

        raw_paths, label_paths = get_mice_tumseg_paths(str(tmp_path), rater="A")
        assert len(raw_paths) == 2 and len(label_paths) == 2
        staple_raw, staple_lab = get_mice_tumseg_paths(str(tmp_path), rater="STAPLE")
        assert all("STAPLE" in p for p in staple_lab)

        loader = get_mice_tumseg_loader(str(tmp_path), patch_shape=(8, 32, 32),
                                        batch_size=1, rater="B")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_micro_usp_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.micro_usp import (
            get_micro_usp_loader, get_micro_usp_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(120)
        root = tmp_path / "Micro_Ultrasound_Prostate_Segmentation_Dataset"
        for split, n in (("train", 7), ("test", 2)):
            im = root / split / "micro_ultrasound_scans"
            gt = root / split / "expert_annotations"
            im.mkdir(parents=True)
            gt.mkdir(parents=True)
            for i in range(n):
                save_nifti(str(im / f"subject_{i:03d}.nii.gz"),
                           rng.random((10, 40, 40)).astype("float32"))
                save_nifti(str(gt / f"subject_{i:03d}.nii.gz"),
                           (rng.random((10, 40, 40)) > 0.5).astype("uint8"))

        # 85/15 split of the 7 train volumes -> 6 train / 1 val
        assert len(get_micro_usp_paths(str(tmp_path), "train")[0]) == 6
        assert len(get_micro_usp_paths(str(tmp_path), "val")[0]) == 1
        assert len(get_micro_usp_paths(str(tmp_path), "test")[0]) == 2
        with pytest.raises(ValueError):
            get_micro_usp_paths(str(tmp_path), "not-a-split")

        loader = get_micro_usp_loader(str(tmp_path), patch_shape=(8, 32, 32),
                                      batch_size=1, split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_motum_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.motum import (
            get_motum_loader, get_motum_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(121)
        # BIDS-ish layout: sub-*/anat/sub-*_{modality}.nii.gz with labels under
        # derivatives/; subs 30-32 have labels but no preprocessed volumes
        n_sub = 48
        for i in range(1, n_sub + 1):
            name = f"sub-{i:04d}"
            anat = tmp_path / name / "anat"
            anat.mkdir(parents=True)
            if i not in (30, 31, 32):
                save_nifti(str(anat / f"{name}_flair.nii.gz"),
                           rng.random((8, 40, 40)).astype("float32"))
            deriv = tmp_path / "derivatives" / name
            deriv.mkdir(parents=True)
            save_nifti(str(deriv / f"flair_seg_{name}.nii.gz"),
                       (rng.random((8, 40, 40)) > 0.5).astype("uint8"))

        assert len(get_motum_paths(str(tmp_path), "train")[0]) == 35
        assert len(get_motum_paths(str(tmp_path), "val")[0]) == 10
        with pytest.raises(ValueError):
            get_motum_paths(str(tmp_path), "train", modality="t2")
        with pytest.raises(ValueError):
            get_motum_paths(str(tmp_path), "not-a-split")

        loader = get_motum_loader(str(tmp_path), patch_shape=(8, 32, 32),
                                  batch_size=1, split="val")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_msd_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.msd import get_msd_dataset, get_msd_loader
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(122)
        # extracted task dirs: data/<task>/Task09_Spleen/{imagesTr,labelsTr}
        for task, tdir in (("spleen", "Task09_Spleen"), ("heart", "Task02_Heart")):
            root = tmp_path / "data" / task / tdir
            (root / "imagesTr").mkdir(parents=True)
            (root / "labelsTr").mkdir(parents=True)
            for i in range(2):
                save_nifti(str(root / "imagesTr" / f"{task}_{i:02d}.nii.gz"),
                           rng.random((10, 40, 40)).astype("float32"))
                save_nifti(str(root / "labelsTr" / f"{task}_{i:02d}.nii.gz"),
                           (rng.random((10, 40, 40)) > 0.5).astype("uint8"))

        with pytest.raises(AssertionError):
            get_msd_dataset(str(tmp_path), (8, 32, 32), task_names="not-a-task")

        # single task -> plain dataset; two tasks -> concat over both
        ds = get_msd_dataset(str(tmp_path), (8, 32, 32), task_names="spleen")
        both = get_msd_dataset(str(tmp_path), (8, 32, 32), task_names=["spleen", "heart"])
        assert len(both) > len(ds) // 2

        loader = get_msd_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                task_names="spleen")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_oasis_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.oasis import (
            get_oasis_loader, get_oasis_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(123)
        # OASIS_* patient dirs with orig/norm volumes and seg4/seg35 labels;
        # the 350/25/rest split indexes past our 4 fabricated patients, so
        # train gets all 4 and val/test are empty slices
        for i in range(4):
            pdir = tmp_path / "data" / f"OASIS_OAS1_{i:04d}_MR1"
            pdir.mkdir(parents=True)
            for stem in ("orig", "norm"):
                save_nifti(str(pdir / f"{stem}.nii.gz"),
                           rng.random((10, 40, 40)).astype("float32"))
            for ann in ("4", "35"):
                save_nifti(str(pdir / f"seg{ann}.nii.gz"),
                           rng.integers(0, 4, (10, 40, 40)).astype("uint8"))

        raw_paths, label_paths = get_oasis_paths(str(tmp_path), "train")
        assert len(raw_paths) == 4
        assert raw_paths[0].endswith("orig.nii.gz")
        assert label_paths[0].endswith("seg4.nii.gz")
        raw_paths, label_paths = get_oasis_paths(str(tmp_path), "train",
                                                 source="norm", label_annotations="35")
        assert raw_paths[0].endswith("norm.nii.gz")
        assert label_paths[0].endswith("seg35.nii.gz")
        with pytest.raises(ValueError):
            get_oasis_paths(str(tmp_path), "not-a-split")

        loader = get_oasis_loader(str(tmp_path), patch_shape=(8, 32, 32), batch_size=1,
                                  split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_oimhs_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.oimhs import (
            get_oimhs_loader, get_oimhs_paths)

        rng = np.random.default_rng(124)
        # raw scans are 512x1024 RGB pngs: left half image, right half a
        # color-coded mask (choroid/retina/cysts/hole)
        for eye in range(6):
            eye_dir = tmp_path / "data" / "Images" / f"eye_{eye:02d}"
            eye_dir.mkdir(parents=True)
            for scan in range(2):
                img = rng.integers(0, 255, (64, 512, 3)).astype("uint8")
                gt = np.zeros((64, 512, 3), dtype="uint8")
                gt[:16] = (255, 255, 0)
                gt[16:32] = (0, 255, 0)
                gt[32:48] = (0, 0, 255)
                gt[48:] = (255, 0, 0)
                scan_img = np.concatenate([img, gt], axis=1)
                Image.fromarray(scan_img).save(eye_dir / f"scan_{scan}.png")

        image_paths, gt_paths = get_oimhs_paths(str(tmp_path), "train")
        assert len(image_paths) == len(gt_paths) > 0
        # color->id conversion: all four classes present
        from torch_em_tpu.utils.io import load_image
        gt = np.asarray(load_image(gt_paths[0]))
        assert set(np.unique(gt)) == {1, 2, 3, 4}

        loader = get_oimhs_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                  split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_osic_pulmofib_layout(self, tmp_path):
        import json

        from torch_em_tpu.data.datasets.medical.osic_pulmofib import (
            get_osic_pulmofib_loader, get_osic_pulmofib_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(125)
        # preprocessed cache + confirmer.json: the dicom conversion (pydicom)
        # is skipped entirely, mirroring a completed preprocessing run
        data = tmp_path / "data"
        (data / "train").mkdir(parents=True)
        prep = data / "preprocessed"
        (prep / "images").mkdir(parents=True)
        (prep / "ground_truth").mkdir(parents=True)
        for i in range(4):
            uid = f"ID{i:08d}"
            (data / "train" / uid).mkdir()
            save_nifti(str(prep / "images" / f"{uid}.nii.gz"),
                       rng.random((40, 40, 10)).astype("float32"))
            save_nifti(str(prep / "ground_truth" / f"{uid}.nii.gz"),
                       rng.integers(0, 4, (40, 40, 10)).astype("uint8"))
        with open(prep / "confirmer.json", "w") as f:
            json.dump("preprocessed", f)

        image_paths, gt_paths = get_osic_pulmofib_paths(str(tmp_path), "train")
        assert len(image_paths) == 4 and len(gt_paths) == 4
        with pytest.raises(ValueError):
            get_osic_pulmofib_paths(str(tmp_path), "not-a-split")

        loader = get_osic_pulmofib_loader(str(tmp_path), patch_shape=(8, 32, 32),
                                          batch_size=1, split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_palm_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.palm import get_palm_loader, get_palm_paths

        rng = np.random.default_rng(126)
        # split dirs with RGB jpgs and 0-coded bmp masks (0 marks the
        # structure; preprocessing converts to foreground-1 tifs)
        for split, n in (("Training", 3), ("Validation", 2)):
            for sub in ("Images", "Disc Masks", "Lesion Masks/Atrophy"):
                (tmp_path / "PALM" / split / sub).mkdir(parents=True, exist_ok=True)
            for i in range(n):
                img = rng.integers(0, 255, (48, 48, 3)).astype("uint8")
                Image.fromarray(img).save(tmp_path / "PALM" / split / "Images" / f"P{i:04d}.jpg")
                mask = np.full((48, 48), 255, dtype="uint8")
                mask[8:24, 8:24] = 0
                for sub in ("Disc Masks", "Lesion Masks/Atrophy"):
                    Image.fromarray(mask).save(
                        tmp_path / "PALM" / split / sub / f"P{i:04d}.bmp")

        raw_paths, label_paths = get_palm_paths(str(tmp_path), "Training")
        assert len(raw_paths) == 3
        assert label_paths[0].endswith("_preprocessed.tif")
        from torch_em_tpu.utils.io import load_image
        lab = np.asarray(load_image(label_paths[0]))
        assert set(np.unique(lab)) == {0, 1}
        raw_paths, _ = get_palm_paths(str(tmp_path), "Validation",
                                      label_choice="atrophy_lesion")
        assert len(raw_paths) == 2
        with pytest.raises(AssertionError):
            get_palm_paths(str(tmp_path), "not-a-split")
        with pytest.raises(ValueError):
            get_palm_paths(str(tmp_path), "Training", label_choice="not-a-choice")

        loader = get_palm_loader(str(tmp_path), patch_shape=(32, 32), batch_size=1,
                                 split="Training")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_panorama_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.panorama import (
            get_panorama_loader, get_panorama_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(127)
        vol_dir = tmp_path / "volumes"
        vol_dir.mkdir(parents=True)
        for choice, n in (("manual", 3), ("automatic", 2)):
            ldir = tmp_path / "labels" / f"{choice}_labels"
            ldir.mkdir(parents=True)
            for i in range(n):
                name = f"1000{i}_0000{1 if choice == 'manual' else 2}"
                save_nifti(str(ldir / f"{name}.nii.gz"),
                           (rng.random((8, 40, 40)) > 0.5).astype("uint8"))
                save_nifti(str(vol_dir / f"{name}_0000.nii.gz"),
                           rng.random((8, 40, 40)).astype("float32"))
        # the known-empty upstream label is dropped
        save_nifti(str(tmp_path / "labels" / "manual_labels" / "100051_00001.nii.gz"),
                   (rng.random((8, 40, 40)) > 0.5).astype("uint8"))
        save_nifti(str(vol_dir / "100051_00001_0000.nii.gz"),
                   rng.random((8, 40, 40)).astype("float32"))

        raw_paths, label_paths = get_panorama_paths(str(tmp_path), "manual")
        assert len(raw_paths) == 3
        raw_paths, label_paths = get_panorama_paths(str(tmp_path))
        assert len(raw_paths) == 5  # both choices, empty-file label dropped

        loader = get_panorama_loader(str(tmp_path), patch_shape=(8, 32, 32),
                                     batch_size=1, annotation_choice="manual")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        assert y.shape[-3:] == (8, 32, 32)

    def test_papila_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical import papila
        from torch_em_tpu.data.datasets.medical.papila import (
            get_papila_loader, get_papila_paths)

        rng = np.random.default_rng(128)
        root = tmp_path / "PapilaDB-PAPILA-17f8fa7746adb20275b5b6a0d99dc9dfe3007e9f"
        (root / "FundusImages").mkdir(parents=True)
        (root / "ExpertsSegmentations" / "Contours").mkdir(parents=True)
        # small test shape instead of the real (1934, 2576) fundus frames
        old_shape = papila._INPUT_SHAPE
        papila._INPUT_SHAPE = (48, 64, 3)
        try:
            for i in range(3):
                pid = f"RET{i:03d}OS"
                img = rng.integers(0, 255, (48, 64, 3)).astype("uint8")
                Image.fromarray(img).save(root / "FundusImages" / f"{pid}.jpg")
                contour = np.array([[8.0, 8.0], [40.0, 8.0], [40.0, 30.0], [8.0, 30.0]])
                for task in ("disc", "cup"):
                    for exp in ("exp1", "exp2"):
                        np.savetxt(root / "ExpertsSegmentations" / "Contours"
                                   / f"{pid}_{task}_{exp}.txt", contour)

            image_paths, gt_paths = get_papila_paths(str(tmp_path), "train")
            assert len(image_paths) == 3 and len(gt_paths) == 3
            from torch_em_tpu.utils.io import load_image
            mask = np.asarray(load_image(gt_paths[0]))
            assert mask.shape == (48, 64) and mask.max() == 1
            with pytest.raises(AssertionError):
                get_papila_paths(str(tmp_path), "train", task="not-a-task")
            with pytest.raises(ValueError):
                get_papila_paths(str(tmp_path), "not-a-split")

            loader = get_papila_loader(str(tmp_path), patch_shape=(32, 32),
                                       batch_size=1, split="train")
            x, y = next(iter(loader))
            assert x.shape == (1, 3, 32, 32)
            assert y.shape[-2:] == (32, 32)
        finally:
            papila._INPUT_SHAPE = old_shape

    def test_pengwin_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.pengwin import (
            get_pengwin_loader, get_pengwin_paths)
        from torch_em_tpu.utils.medical_io import save_mha

        rng = np.random.default_rng(129)
        # CT: mha volumes under data/CT/{images,labels}
        ct = tmp_path / "data" / "CT"
        (ct / "images").mkdir(parents=True)
        (ct / "labels").mkdir(parents=True)
        for i in range(2):
            save_mha(str(ct / "images" / f"{i:03d}.mha"),
                     rng.random((10, 40, 40)).astype("float32"))
            save_mha(str(ct / "labels" / f"{i:03d}.mha"),
                     rng.integers(0, 5, (10, 40, 40)).astype("uint8"))
        # X-Ray: tif images under train/{input,output}/images
        xr = tmp_path / "data" / "X-Ray" / "train"
        (xr / "input" / "images").mkdir(parents=True)
        (xr / "output" / "images").mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (48, 48)).astype("uint8")).save(
                xr / "input" / "images" / f"{i:03d}.tif")
            Image.fromarray(rng.integers(0, 5, (48, 48)).astype("uint8")).save(
                xr / "output" / "images" / f"{i:03d}.tif")

        assert len(get_pengwin_paths(str(tmp_path), "CT")[0]) == 2
        assert len(get_pengwin_paths(str(tmp_path), "X-Ray")[0]) == 2
        with pytest.raises(ValueError):
            get_pengwin_paths(str(tmp_path), "MRI")

        loader = get_pengwin_loader(str(tmp_path), patch_shape=(8, 32, 32),
                                    batch_size=1, modality="CT")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 32, 32)
        loader = get_pengwin_loader(str(tmp_path), patch_shape=(32, 32),
                                    batch_size=1, modality="X-Ray")
        x, y = next(iter(loader))
        assert x.shape[-2:] == (32, 32)

    def test_piccolo_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.piccolo import (
            get_piccolo_loader, get_piccolo_paths)

        rng = np.random.default_rng(130)
        root = tmp_path / "piccolo dataset-release0.1"
        for split in ("train", "validation", "test"):
            (root / split / "polyps").mkdir(parents=True)
            (root / split / "masks").mkdir(parents=True)
            for i in range(2):
                Image.fromarray(rng.integers(0, 255, (48, 48, 3)).astype("uint8")).save(
                    root / split / "polyps" / f"f{i:03d}.png")
                Image.fromarray((rng.random((48, 48)) > 0.5).astype("uint8") * 255).save(
                    root / split / "masks" / f"f{i:03d}.png")

        image_paths, gt_paths = get_piccolo_paths(str(tmp_path), "validation")
        assert len(image_paths) == len(gt_paths) == 2

        loader = get_piccolo_loader(str(tmp_path), patch_shape=(32, 32),
                                    batch_size=1, split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_plethora_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.plethora import (
            get_plethora_loader, get_plethora_paths)
        from torch_em_tpu.utils.medical_io import load_nifti, save_nifti

        rng = np.random.default_rng(131)
        subject, series = "LUNG1-001", "1.3.6.1.4.1.0001"
        image_dir = tmp_path / "data" / "images"
        gt_dir = tmp_path / "data" / "gt" / "Thoracic_Cavities"
        (image_dir / series).mkdir(parents=True)
        (gt_dir / subject).mkdir(parents=True)
        with open(tmp_path / "plethora_images.csv", "w") as f:
            f.write(f"Series UID,Subject ID\n{series},{subject}\n")
        # the CT volume is already converted (no pydicom needed); the ground
        # truth still runs through the re-orientation path
        save_nifti(str(image_dir / "preprocessed" / f"{subject}.nii.gz")
                   if (image_dir / "preprocessed").mkdir() is None else "",
                   rng.random((32, 32, 8)).astype("float32"))
        # the (a, b, c) ground truth comes out of the re-orientation as
        # (b, a, c); save it square-in-plane so it lands on the image shape
        save_nifti(str(gt_dir / subject / "seg.nii.gz"),
                   rng.integers(0, 3, (32, 32, 8)).astype("uint8"))

        image_paths, gt_paths = get_plethora_paths(str(tmp_path), "thoracic")
        assert len(image_paths) == len(gt_paths) == 1
        assert load_nifti(gt_paths[0]).shape == (32, 32, 8)

        loader = get_plethora_loader(str(tmp_path), batch_size=1,
                                     patch_shape=(16, 16, 4), task="thoracic")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 16, 16, 4)
        assert y.shape[-3:] == (16, 16, 4)

    def test_ravir_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.ravir import (
            get_ravir_loader, get_ravir_paths)

        rng = np.random.default_rng(132)
        root = tmp_path / "RAVIR_Dataset" / "train"
        (root / "training_images").mkdir(parents=True)
        (root / "training_masks").mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (48, 48)).astype("uint8")).save(
                root / "training_images" / f"IR_Case_{i:03d}.png")
            Image.fromarray(rng.integers(0, 3, (48, 48)).astype("uint8") * 100).save(
                root / "training_masks" / f"IR_Case_{i:03d}.png")

        image_paths, gt_paths = get_ravir_paths(str(tmp_path))
        assert len(image_paths) == len(gt_paths) == 3

        loader = get_ravir_loader(str(tmp_path), patch_shape=(32, 32), batch_size=2)
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_sa_med2d_layout(self, tmp_path):
        import h5py

        from torch_em_tpu.data.datasets.medical.sa_med2d import (
            get_sa_med2d_loader, get_sa_med2d_paths)

        rng = np.random.default_rng(133)
        data = tmp_path / "data"
        data.mkdir()
        # a preprocessed shard: 512x512 in production, smaller here
        with h5py.File(data / "ACDC_00.h5", "w") as f:
            f.create_dataset("raw", data=rng.random((3, 4, 64, 64)).astype("float32"))
            f.create_dataset("labels", data=rng.integers(0, 4, (4, 64, 64)).astype("uint8"))

        paths = get_sa_med2d_paths(str(tmp_path))
        assert len(paths) == 1

        loader = get_sa_med2d_loader(str(tmp_path), batch_size=1, patch_shape=(1, 32, 32))
        x, y = next(iter(loader))
        assert x.shape == (1, 3, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_segthy_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.segthy import (
            get_segthy_loader, get_segthy_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(134)
        root = tmp_path / "MRI_volunteer_dataset"
        (root / "MRI").mkdir(parents=True)
        (root / "MRI_thyroid_label").mkdir()
        for i in range(3):
            save_nifti(str(root / "MRI" / f"{i:03d}_MRI.nii.gz"),
                       rng.random((32, 32, 8)).astype("float32"))
            save_nifti(str(root / "MRI_thyroid_label" / f"{i:03d}_MRI_thyroid_label.nii.gz"),
                       rng.integers(0, 2, (32, 32, 8)).astype("uint8"))

        raw_paths, label_paths = get_segthy_paths(str(tmp_path), "train", "MRI")
        assert len(raw_paths) == len(label_paths) == 3
        assert all(os.path.exists(p) for p in raw_paths)
        with pytest.raises(ValueError):
            get_segthy_paths(str(tmp_path), "not-a-split", "MRI")

        loader = get_segthy_loader(str(tmp_path), patch_shape=(16, 16, 4),
                                   batch_size=1, split="train", source="MRI")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 16, 16, 4)
        assert y.shape[-3:] == (16, 16, 4)

    def test_siim_acr_layout(self, tmp_path):
        from PIL import Image

        from torch_em_tpu.data.datasets.medical.siim_acr import (
            get_siim_acr_loader, get_siim_acr_paths)

        rng = np.random.default_rng(135)
        root = tmp_path / "siim-acr-pneumothorax"
        (root / "png_images").mkdir(parents=True)
        (root / "png_masks").mkdir()
        for split, n in (("train", 3), ("test", 2)):
            for i in range(n):
                name = f"{i}_{split}_{i}_.png"
                Image.fromarray(rng.integers(0, 255, (48, 48)).astype("uint8")).save(
                    root / "png_images" / name)
                mask = np.zeros((48, 48), dtype="uint8")
                mask[10:20, 10:20] = 255  # both classes -> survives cleaning
                Image.fromarray(mask).save(root / "png_masks" / name)

        # published train re-split: first 400 -> val, rest -> train
        assert len(get_siim_acr_paths(str(tmp_path), "val")[0]) == 3
        assert len(get_siim_acr_paths(str(tmp_path), "train")[0]) == 0
        assert len(get_siim_acr_paths(str(tmp_path), "test")[0]) == 2
        with pytest.raises(ValueError):
            get_siim_acr_paths(str(tmp_path), "not-a-split")

        loader = get_siim_acr_loader(str(tmp_path), patch_shape=(32, 32),
                                     batch_size=1, split="val")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 32, 32)
        assert y.shape[-2:] == (32, 32)

    def test_spider_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.spider import (
            get_spider_loader, get_spider_paths)
        from torch_em_tpu.utils.medical_io import save_mha

        rng = np.random.default_rng(136)
        (tmp_path / "data" / "images").mkdir(parents=True)
        (tmp_path / "data" / "masks").mkdir()
        for i in range(2):
            save_mha(str(tmp_path / "data" / "images" / f"{i}_t1.mha"),
                     rng.random((8, 32, 32)).astype("float32"))
            save_mha(str(tmp_path / "data" / "masks" / f"{i}_t1.mha"),
                     rng.integers(0, 5, (8, 32, 32)).astype("uint8"))

        image_paths, gt_paths = get_spider_paths(str(tmp_path))
        assert len(image_paths) == len(gt_paths) == 2

        loader = get_spider_loader(str(tmp_path), patch_shape=(4, 16, 16), batch_size=1)
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 16, 16)
        assert y.shape[-3:] == (4, 16, 16)

    def test_toothfairy_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.toothfairy import (
            get_toothfairy_loader, get_toothfairy_paths)
        from torch_em_tpu.utils.medical_io import save_mha

        rng = np.random.default_rng(137)
        # v2: nnUNet-style mha folders
        v2 = tmp_path / "v2" / "Dataset112_ToothFairy2"
        (v2 / "imagesTr").mkdir(parents=True)
        (v2 / "labelsTr").mkdir()
        for i in range(3):
            save_mha(str(v2 / "imagesTr" / f"ToothFairy2_{i:03d}_0000.mha"),
                     rng.random((8, 32, 32)).astype("float32"))
            save_mha(str(v2 / "labelsTr" / f"ToothFairy2_{i:03d}.mha"),
                     rng.integers(0, 4, (8, 32, 32)).astype("uint8"))
        image_paths, gt_paths = get_toothfairy_paths(str(tmp_path / "v2"), "train", "v2")
        assert len(image_paths) == len(gt_paths) == 3
        with pytest.raises(ValueError):
            get_toothfairy_paths(str(tmp_path / "v2"), "not-a-split", "v2")

        # v1: patient folders with dense npy annotations -> nifti conversion
        v1 = tmp_path / "v1" / "ToothFairy_Dataset" / "Dataset"
        for pid in ("P1", "P2"):
            (v1 / pid).mkdir(parents=True)
            np.save(str(v1 / pid / "data.npy"), rng.random((8, 32, 32)).astype("float32"))
            np.save(str(v1 / pid / "gt_alpha.npy"),
                    rng.integers(0, 2, (8, 32, 32)).astype("uint8"))
        # a sparse-only patient is skipped
        (v1 / "P3").mkdir()
        np.save(str(v1 / "P3" / "data.npy"), rng.random((8, 32, 32)).astype("float32"))
        image_paths, gt_paths = get_toothfairy_paths(str(tmp_path / "v1"), "train", "v1")
        assert len(image_paths) == len(gt_paths) == 2

        loader = get_toothfairy_loader(str(tmp_path / "v2"), patch_shape=(4, 16, 16),
                                       batch_size=1, split="train", version="v2")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 4, 16, 16)
        assert y.shape[-3:] == (4, 16, 16)

    def test_verse_layout(self, tmp_path):
        from torch_em_tpu.data.datasets.medical.verse import (
            get_verse_loader, get_verse_paths)
        from torch_em_tpu.utils.medical_io import save_nifti

        rng = np.random.default_rng(138)
        for sub in ("sub-verse004", "sub-verse005"):
            (tmp_path / "data" / "train" / "rawdata" / sub).mkdir(parents=True)
            (tmp_path / "data" / "train" / "derivatives" / sub).mkdir(parents=True)
            save_nifti(str(tmp_path / "data" / "train" / "rawdata" / sub / f"{sub}_ct.nii.gz"),
                       rng.random((16, 16, 8)).astype("float32"))
            save_nifti(str(tmp_path / "data" / "train" / "derivatives" / sub /
                           f"{sub}_seg-vert_msk.nii.gz"),
                       rng.integers(0, 5, (16, 16, 8)).astype("uint8"))

        image_paths, gt_paths = get_verse_paths(str(tmp_path), "train")
        assert len(image_paths) == len(gt_paths) == 2

        loader = get_verse_loader(str(tmp_path), patch_shape=(8, 8, 4),
                                  batch_size=1, split="train")
        x, y = next(iter(loader))
        assert x.shape == (1, 1, 8, 8, 4)
        assert y.shape[-3:] == (8, 8, 4)
