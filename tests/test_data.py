import os

import h5py
import numpy as np
import pytest
from PIL import Image

import torch_em_tpu.data as ted
from torch_em_tpu.segmentation import default_segmentation_dataset, default_segmentation_loader


@pytest.fixture
def h5_data(tmp_path):
    path = str(tmp_path / "data.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=np.random.rand(32, 64, 64).astype("float32"))
        f.create_dataset("labels", data=np.random.randint(0, 5, (32, 64, 64)).astype("uint32"))
    return path


@pytest.fixture
def image_data(tmp_path):
    raw_dir = tmp_path / "raw"
    label_dir = tmp_path / "labels"
    raw_dir.mkdir()
    label_dir.mkdir()
    for i in range(4):
        size = (48 + 4 * i, 52 + 2 * i)
        Image.fromarray((np.random.rand(*size) * 255).astype("uint8")).save(raw_dir / f"im{i}.png")
        Image.fromarray(np.random.randint(0, 4, size).astype("uint8")).save(label_dir / f"im{i}.png")
    return str(raw_dir), str(label_dir)


class TestSegmentationDataset:
    def test_3d_patches(self, h5_data):
        ds = ted.SegmentationDataset(h5_data, "raw", h5_data, "labels", patch_shape=(16, 32, 32))
        x, y = ds[0]
        assert x.shape == (1, 16, 32, 32)
        assert y.shape == (1, 16, 32, 32)
        assert x.dtype == np.float32

    def test_2d_from_3d(self, h5_data):
        ds = ted.SegmentationDataset(h5_data, "raw", h5_data, "labels", patch_shape=(1, 32, 32), ndim=2)
        x, y = ds[0]
        assert x.shape == (1, 32, 32)

    def test_len(self, h5_data):
        ds = ted.SegmentationDataset(h5_data, "raw", h5_data, "labels", patch_shape=(16, 32, 32))
        assert len(ds) == 8
        ds = ted.SegmentationDataset(h5_data, "raw", h5_data, "labels", patch_shape=(16, 32, 32), n_samples=100)
        assert len(ds) == 100

    def test_roi(self, h5_data):
        roi = (slice(0, 16), slice(0, 32), slice(0, 32))
        ds = ted.SegmentationDataset(h5_data, "raw", h5_data, "labels", patch_shape=(8, 16, 16), roi=roi)
        assert ds.shape == (16, 32, 32)

    def test_sampler_cap(self, tmp_path):
        path = str(tmp_path / "empty.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("raw", data=np.random.rand(16, 32, 32).astype("float32"))
            f.create_dataset("labels", data=np.zeros((16, 32, 32), dtype="uint32"))
        ds = ted.SegmentationDataset(
            path, "raw", path, "labels", patch_shape=(8, 16, 16),
            sampler=ted.MinForegroundSampler(min_fraction=0.5),
        )
        with pytest.raises(RuntimeError):
            ds[0]

    def test_pickling(self, h5_data):
        import pickle

        ds = ted.SegmentationDataset(h5_data, "raw", h5_data, "labels", patch_shape=(8, 16, 16))
        ds2 = pickle.loads(pickle.dumps(ds))
        x, y = ds2[0]
        assert x.shape == (1, 8, 16, 16)


class TestImageCollectionDataset:
    def test_basic(self, image_data):
        raw_dir, label_dir = image_data
        raws = sorted(os.path.join(raw_dir, f) for f in os.listdir(raw_dir))
        labels = sorted(os.path.join(label_dir, f) for f in os.listdir(label_dir))
        ds = ted.ImageCollectionDataset(raws, labels, patch_shape=(32, 32))
        x, y = ds[0]
        assert x.shape == (1, 32, 32)
        assert y.shape == (1, 32, 32)


class TestRawDataset:
    def test_two_views(self, h5_data):
        aug = lambda x: x + 1
        ds = ted.RawDataset(h5_data, "raw", patch_shape=(8, 16, 16), augmentations=(aug, aug))
        v1, v2 = ds[0]
        assert v1.shape == v2.shape == (1, 8, 16, 16)


class TestConcatAndLoader:
    def test_concat(self, h5_data):
        ds1 = ted.SegmentationDataset(h5_data, "raw", h5_data, "labels", patch_shape=(8, 16, 16), n_samples=3)
        ds2 = ted.SegmentationDataset(h5_data, "raw", h5_data, "labels", patch_shape=(8, 16, 16), n_samples=5)
        cat = ted.ConcatDataset(ds1, ds2)
        assert len(cat) == 8
        x, y = cat[7]
        assert x.shape == (1, 8, 16, 16)

    def test_loader_batches(self, h5_data):
        ds = ted.SegmentationDataset(h5_data, "raw", h5_data, "labels", patch_shape=(8, 16, 16), n_samples=7)
        loader = ted.DataLoader(ds, batch_size=3, shuffle=True, num_workers=2)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0][0].shape == (3, 1, 8, 16, 16)
        assert batches[-1][0].shape == (1, 1, 8, 16, 16)  # remainder

    def test_distributed_sampler(self, h5_data):
        ds = ted.SegmentationDataset(h5_data, "raw", h5_data, "labels", patch_shape=(8, 16, 16), n_samples=10)
        s0 = ted.DistributedIndexSampler(len(ds), num_replicas=2, rank=0)
        s1 = ted.DistributedIndexSampler(len(ds), num_replicas=2, rank=1)
        i0, i1 = s0.indices(), s1.indices()
        assert len(i0) == len(i1) == 5
        assert set(i0).isdisjoint(set(i1))


class TestFactory:
    def test_seg_dataset_sniffing(self, h5_data):
        ds = default_segmentation_dataset(h5_data, "raw", h5_data, "labels", patch_shape=(8, 16, 16))
        assert isinstance(ds, ted.SegmentationDataset)

    def test_image_collection_sniffing(self, image_data):
        raw_dir, label_dir = image_data
        ds = default_segmentation_dataset(
            raw_dir, "*.png", label_dir, "*.png", patch_shape=(32, 32), ndim=2,
        )
        assert isinstance(ds, ted.ImageCollectionDataset)

    def test_tensor_dataset(self):
        images = [np.random.rand(48, 48).astype("float32") for _ in range(3)]
        labels = [np.random.randint(0, 3, (48, 48)).astype("uint32") for _ in range(3)]
        ds = default_segmentation_dataset(images, None, labels, None, patch_shape=(32, 32))
        assert isinstance(ds, ted.TensorDataset)
        x, y = ds[0]
        assert x.shape == (1, 32, 32)

    def test_loader(self, h5_data):
        loader = default_segmentation_loader(
            h5_data, "raw", h5_data, "labels", batch_size=2, patch_shape=(8, 16, 16),
        )
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 8, 16, 16)


class TestMultiKeyChannels:
    def test_stacked_keys(self, tmp_path):
        """One container + a list of keys loads as a lazy channel stack
        (reference multi-key channel inputs, e.g. HPA)."""
        import h5py

        from torch_em_tpu.segmentation import default_segmentation_dataset

        p = str(tmp_path / "multi.h5")
        with h5py.File(p, "w") as f:
            for c in ("a", "b", "c"):
                f.create_dataset(f"raw/{c}", data=np.random.rand(64, 64).astype("float32"))
            f.create_dataset("labels", data=np.random.randint(0, 3, (64, 64)).astype("uint16"))
        ds = default_segmentation_dataset(
            [p], ["raw/a", "raw/b", "raw/c"], [p], "labels", (32, 32),
            ndim=2, with_channels=True,
        )
        x, y = ds[0]
        assert np.asarray(x).shape == (3, 32, 32)
        assert np.asarray(y).shape == (1, 32, 32)


@pytest.mark.slow
class TestProcessWorkers:
    """Process-based loader workers (SURVEY hard part #2): spawn pool,
    dataset pickled once per worker, handles reopened in the child."""

    def test_process_mode_matches_thread_mode(self, tmp_path):
        import h5py

        from torch_em_tpu.data import DataLoader, SegmentationDataset
        from torch_em_tpu.transforms.label import BoundaryTransform

        p = str(tmp_path / "x.h5")
        with h5py.File(p, "w") as f:
            f.create_dataset("raw", data=np.random.rand(16, 64, 64).astype("float32"))
            f.create_dataset("labels", data=np.random.randint(0, 4, (16, 64, 64)))
        ds = SegmentationDataset(
            p, "raw", p, "labels", patch_shape=(1, 32, 32), ndim=2,
            label_transform=BoundaryTransform(add_binary_target=True, ndim=2),
            label_dtype="float32",
        )
        loader = DataLoader(ds, batch_size=4, num_workers=2, worker_mode="process")
        try:
            n = 0
            for x, y in loader:
                assert x.shape == (4, 1, 32, 32) and y.shape == (4, 2, 32, 32)
                n += 1
                if n >= 3:
                    break
            assert n == 3
        finally:
            loader.shutdown()
