"""Tests for the dataset-zoo machinery (no downloads, reference §4 pattern)."""

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
        assert n_modules >= 140, f"only {n_modules} dataset modules"
