import os

import h5py
import numpy as np
import pytest

import torch_em_tpu as te
from torch_em_tpu.models import UNet2d
from torch_em_tpu.transforms import BoundaryTransform


@pytest.fixture
def trained_checkpoint(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path = str(tmp_path / "data.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=np.random.rand(4, 64, 64).astype("float32"))
        f.create_dataset("labels", data=np.random.randint(0, 4, (4, 64, 64)).astype("uint32"))
    model = UNet2d(in_channels=1, out_channels=2, depth=2, initial_features=4,
                   final_activation="Sigmoid")
    loader = te.default_segmentation_loader(
        path, "raw", path, "labels", batch_size=2, patch_shape=(1, 32, 32), ndim=2,
        label_transform=BoundaryTransform(add_binary_target=True), n_samples=4,
    )
    trainer = te.default_segmentation_trainer(
        "util-test", model, loader, loader, mixed_precision=False, device="cpu", logger=None,
    )
    trainer.fit(iterations=2)
    return "./checkpoints/util-test", trainer


class TestUtil:
    def test_get_trainer_and_load_model(self, trained_checkpoint):
        from torch_em_tpu.utils.util import get_trainer, load_model, model_is_equal

        ckpt, orig_trainer = trained_checkpoint
        trainer = get_trainer(ckpt, "latest", device="cpu")
        assert trainer.iteration == 2
        model = load_model(ckpt, name="latest", device="cpu")
        assert model_is_equal(model, trainer.model)

    def test_get_normalizer(self, trained_checkpoint):
        from torch_em_tpu.utils.util import get_normalizer

        _, trainer = trained_checkpoint
        normalizer = get_normalizer(trainer)
        out = normalizer(np.random.rand(8, 8).astype("float32") * 50)
        assert abs(out.mean()) < 1e-3

    def test_reporting(self, trained_checkpoint):
        from torch_em_tpu.utils.reporting import get_training_summary

        _, trainer = trained_checkpoint
        md = get_training_summary(trainer, to_md=True)
        assert "Training Summary" in md

    def test_check_loader(self, trained_checkpoint, tmp_path):
        from torch_em_tpu.utils.debug import check_loader

        _, trainer = trained_checkpoint
        paths = check_loader(trainer.train_loader, n_samples=1, save_path=str(tmp_path / "dbg"))
        assert len(paths) == 1 and os.path.exists(paths[0])


class TestModelzoo:
    def test_export_import_roundtrip(self, trained_checkpoint, tmp_path):
        from torch_em_tpu.utils.modelzoo import export_bioimageio_model, import_bioimageio_model
        from torch_em_tpu.utils.util import model_is_equal

        ckpt, trainer = trained_checkpoint
        export_folder = str(tmp_path / "exported")
        ok = export_bioimageio_model(
            ckpt, export_folder, input_data=np.random.rand(1, 32, 32).astype("float32"),
            name="test-export", checkpoint_name="latest",
        )
        assert ok
        assert os.path.exists(os.path.join(export_folder, "rdf.yaml"))
        assert os.path.exists(os.path.join(export_folder, "test_input.npy"))
        model, normalizer = import_bioimageio_model(export_folder)
        assert model_is_equal(model, trainer.model)

    def test_mws_config(self):
        from torch_em_tpu.utils.modelzoo import get_mws_config

        cfg = get_mws_config([[-1, 0], [0, -1]])
        assert cfg["mws"]["offsets"] == [[-1, 0], [0, -1]]

    def test_exported_package_is_spec_conformant(self, trained_checkpoint, tmp_path):
        # schema-level validation of the produced package against the vendored
        # 0.4 model-RDF rules (the reference round-trips through
        # bioimageio.spec/core, reference modelzoo.py:602-614)
        from torch_em_tpu.utils.bioimageio_spec import validate_model_rdf
        from torch_em_tpu.utils.modelzoo import export_bioimageio_model

        ckpt, _ = trained_checkpoint
        export_folder = str(tmp_path / "exported_spec")
        ok = export_bioimageio_model(
            ckpt, export_folder, input_data=np.random.rand(1, 32, 32).astype("float32"),
            name="test-export-spec", checkpoint_name="latest",
        )
        assert ok
        errors, warnings = validate_model_rdf(export_folder)
        # the UNet family exports pytorch_state_dict weights, so the package
        # must be FULLY spec-conformant (no downgrades)
        assert errors == [], errors
        # the native jax entry is a documented extension -> warning, not error
        assert any("jax" in w for w in warnings)

    def test_spec_validator_catches_violations(self, trained_checkpoint, tmp_path):
        import yaml

        from torch_em_tpu.utils.bioimageio_spec import validate_model_rdf
        from torch_em_tpu.utils.modelzoo import export_bioimageio_model

        ckpt, _ = trained_checkpoint
        export_folder = str(tmp_path / "exported_mut")
        assert export_bioimageio_model(
            ckpt, export_folder, input_data=np.random.rand(1, 32, 32).astype("float32"),
            name="test-export-mut", checkpoint_name="latest",
        )
        rdf_path = os.path.join(export_folder, "rdf.yaml")
        with open(rdf_path) as f:
            good = yaml.safe_load(f)

        def errors_of(mutate):
            rdf = yaml.safe_load(yaml.safe_dump(good))
            mutate(rdf)
            with open(rdf_path, "w") as f:
                yaml.safe_dump(rdf, f)
            return validate_model_rdf(export_folder)[0]

        assert any("timestamp" in e for e in errors_of(lambda r: r.pop("timestamp")))
        assert any("axes" in e for e in errors_of(
            lambda r: r["inputs"][0].update(axes="bqyx")))
        assert any("shape rank" in e for e in errors_of(
            lambda r: r["inputs"][0].update(shape=[1, 1, 32])))
        assert any("cite" in e for e in errors_of(lambda r: r.update(cite=[])))
        assert any("weight format" in e for e in errors_of(
            lambda r: r.update(weights={"jax": r["weights"]["jax"]})))
        # test-tensor shape mismatch against the file on disk
        assert any("test tensor" in e for e in errors_of(
            lambda r: r["inputs"][0].update(shape=[2, 1, 32, 32])))


class TestValidation:
    def test_validate_checkpoint(self, trained_checkpoint):
        from torch_em_tpu.utils.validation import validate_checkpoint

        ckpt, _ = trained_checkpoint
        results = validate_checkpoint(
            ckpt, gpu_ids=["cpu"], max_samples=1, visualize=False,
            block_shape=(32, 32), halo=(8, 8),
        )
        assert len(results) == 1
        assert results[0].shape[0] == 2  # two output channels


class TestGridSearch:
    def test_grid_search(self, tmp_path):
        from torch_em_tpu.utils.grid_search import (
            BoundaryBasedInstanceSegmentation, instance_segmentation_grid_search,
        )
        from torch_em_tpu.utils.test import make_gt
        from torch_em_tpu.ops.host import find_boundaries

        # build a fake "model" that returns fg+boundary channels from gt
        gt = make_gt((64, 64)).astype("uint32")
        boundaries = find_boundaries(gt).astype("float32")
        fg = (gt > 0).astype("float32")

        class FakeSegmenter:
            def initialize(self, image):
                self._prediction = np.stack([fg, boundaries])

            is_initialized = True

            def generate(self, min_size=10, threshold1=0.5, threshold2=0.5):
                from torch_em_tpu.utils.segmentation import watershed_from_components

                return watershed_from_components(
                    self._prediction[1], self._prediction[0],
                    min_size=min_size, threshold1=threshold1, threshold2=threshold2,
                )

        im_path = str(tmp_path / "im.npy")
        gt_path = str(tmp_path / "gt.npy")
        np.save(im_path, fg)
        np.save(gt_path, gt)
        best_params, best_score = instance_segmentation_grid_search(
            FakeSegmenter(), [im_path], [gt_path], str(tmp_path / "results"),
            grid_search_values={"threshold1": [0.5], "min_size": [5, 10]},
        )
        assert "min_size" in best_params
        assert 0 <= best_score <= 1


class TestMedicalIO:
    """Round-trip tests for the pure-numpy NIfTI / MetaImage readers."""

    def test_nifti_roundtrip(self, tmp_path):
        from torch_em_tpu.utils.medical_io import load_nifti, save_nifti

        for dtype in ("uint8", "int16", "float32"):
            vol = (np.random.rand(13, 17, 9) * 100).astype(dtype)
            p = str(tmp_path / f"vol_{dtype}.nii")
            save_nifti(p, vol)
            back = load_nifti(p)
            assert back.shape == vol.shape
            np.testing.assert_allclose(np.asarray(back), vol)

    def test_nifti_gzip(self, tmp_path):
        from torch_em_tpu.utils.medical_io import load_nifti, save_nifti

        vol = (np.random.rand(8, 8, 8) * 10).astype("float32")
        p = str(tmp_path / "vol.nii.gz")
        save_nifti(p, vol)
        np.testing.assert_allclose(np.asarray(load_nifti(p)), vol)

    def test_mha_roundtrip(self, tmp_path):
        from torch_em_tpu.utils.medical_io import load_mha, save_mha

        for compressed in (True, False):
            vol = (np.random.rand(5, 12, 7) * 100).astype("int16")
            p = str(tmp_path / f"vol_{compressed}.mha")
            save_mha(p, vol, compressed=compressed)
            back = load_mha(p)
            assert back.shape == vol.shape
            np.testing.assert_array_equal(back, vol)

    def test_load_data_dispatch(self, tmp_path):
        from torch_em_tpu.utils.io import load_data
        from torch_em_tpu.utils.medical_io import save_mha, save_nifti

        vol = (np.random.rand(4, 6, 5) * 50).astype("float32")
        p1, p2 = str(tmp_path / "a.nii.gz"), str(tmp_path / "b.mha")
        save_nifti(p1, vol)
        save_mha(p2, vol)
        np.testing.assert_allclose(np.asarray(load_data(p1)), vol)
        np.testing.assert_allclose(np.asarray(load_data(p2)), vol)

    def test_nrrd_and_mrc_roundtrip(self, tmp_path):
        from torch_em_tpu.utils.io import load_data
        from torch_em_tpu.utils.medical_io import load_mrc, load_nrrd, save_mrc, save_nrrd

        vol = (np.random.rand(6, 8, 10) * 100).astype("float32")
        p1, p2 = str(tmp_path / "v.nrrd"), str(tmp_path / "v.mrc")
        save_nrrd(p1, vol)
        save_mrc(p2, vol)
        np.testing.assert_allclose(np.asarray(load_nrrd(p1)), vol)
        np.testing.assert_allclose(np.asarray(load_mrc(p2)), vol)
        np.testing.assert_allclose(np.asarray(load_data(p2)), vol)


class TestContainerIO:
    """write_data/load_data round trips over the tensorstore-backed formats."""

    def test_n5_round_trip_and_convention(self, tmp_path):
        import json

        from torch_em_tpu.utils.io import load_data, write_data

        data = np.arange(3 * 4 * 5, dtype="uint16").reshape(3, 4, 5)
        path = str(tmp_path / "vol.n5")
        write_data(path, "raw", data, chunks=(2, 4, 5))

        # round trip preserves numpy orientation
        back = load_data(path, "raw")
        assert back.shape == (3, 4, 5)
        np.testing.assert_array_equal(np.asarray(back[:]), data)
        # on-disk metadata follows the n5 (column-major) ecosystem convention
        with open(tmp_path / "vol.n5" / "raw" / "attributes.json") as f:
            attrs = json.load(f)
        assert attrs["dimensions"] == [5, 4, 3]
        assert attrs["blockSize"] == [5, 4, 2]

    def test_zarr_round_trip(self, tmp_path):
        from torch_em_tpu.utils.io import load_data, write_data

        data = np.arange(3 * 4 * 5, dtype="float32").reshape(3, 4, 5)
        path = str(tmp_path / "vol.zarr")
        write_data(path, "raw", data, chunks=(2, 4, 5))
        back = load_data(path, "raw")
        assert back.shape == (3, 4, 5)
        np.testing.assert_array_equal(np.asarray(back[:]), data)
