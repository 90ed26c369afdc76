import numpy as np
import pytest

from torch_em_tpu.metric import (
    MWSIOUMetric, MWSRandMetric, MWSVOIMetric, clDice, matching, rand_index,
    symmetric_best_dice_score, variation_of_information,
)
from torch_em_tpu.ops import native
from torch_em_tpu.ops.host import compute_affinities
from torch_em_tpu.ops.multicut import multicut_segmentation
from torch_em_tpu.utils.segmentation import (
    connected_components_with_boundaries, mutex_watershed_segmentation, size_filter,
    watershed_from_components, watershed_from_maxima,
    watershed_from_center_and_boundary_distances,
)


def make_gt(shape=(64, 64), seed=42):
    """Synthetic instance GT via seeded watershed on noise (reference util/test.py:14).

    Seeds are placed on a jittered grid so all objects have substantial size.
    """
    rng = np.random.default_rng(seed)
    from scipy import ndimage

    seeds = np.zeros(shape, dtype="uint32")
    label = 1
    step = shape[0] // 3
    for i in range(3):
        for j in range(3):
            c = (i * step + step // 2 + rng.integers(-4, 4), j * step + step // 2 + rng.integers(-4, 4))
            seeds[c] = label
            label += 1
    # grow Voronoi-like regions from the seeds (EDT indices -> nearest seed)
    indices = ndimage.distance_transform_edt(seeds == 0, return_distances=False, return_indices=True)
    return seeds[tuple(indices)]


class TestEvalMeasures:
    def test_perfect_match(self):
        gt = make_gt()
        m = matching(gt, gt)
        assert m["precision"] == 1.0 and m["recall"] == 1.0 and m["f1"] == 1.0
        vis, vim = variation_of_information(gt, gt)
        assert vis == pytest.approx(0.0, abs=1e-9)
        assert vim == pytest.approx(0.0, abs=1e-9)
        are, ri = rand_index(gt, gt)
        assert are == pytest.approx(0.0, abs=1e-9)
        assert symmetric_best_dice_score(gt, gt) == pytest.approx(1.0)

    def test_permuted_labels_still_perfect(self):
        gt = make_gt()
        perm = np.zeros(gt.max() + 1, dtype="uint32")
        perm[1:] = np.random.permutation(gt.max()) + 1
        seg = perm[gt]
        assert matching(seg, gt)["f1"] == 1.0
        vis, vim = variation_of_information(seg, gt)
        assert vis + vim == pytest.approx(0.0, abs=1e-9)

    def test_degraded_match_is_worse(self):
        gt = make_gt()
        seg = gt.copy()
        seg[:32] = 1  # merge the top half into one object
        assert matching(seg, gt)["f1"] < 1.0
        vis, vim = variation_of_information(seg, gt)
        assert vis + vim > 0.1

    def test_background_only_sides(self):
        # a decode can legitimately produce zero instances (e.g. an
        # over-merging grid-search candidate) — the metric must score it,
        # not crash (regression: boolean-mask shape error on empty overlap)
        gt = make_gt()
        empty = np.zeros_like(gt)
        m = matching(empty, gt)
        assert m["accuracy"] == 0.0 and m["n_pred"] == 0 and m["fn"] == m["n_true"] > 0
        m = matching(gt, empty)
        assert m["accuracy"] == 0.0 and m["n_true"] == 0 and m["fp"] == m["n_pred"] > 0
        m = matching(empty, empty)
        assert m["accuracy"] == 0.0 and m["tp"] == 0


class TestDecodings:
    def test_mutex_watershed_recovers_gt(self):
        gt = make_gt()
        offsets = [[-1, 0], [0, -1], [-9, 0], [0, -9]]
        affs, _ = compute_affinities(gt.astype("uint64"), offsets)
        disaffs = 1 - affs
        fg = np.ones(gt.shape, dtype="float32")
        seg = mutex_watershed_segmentation(fg, disaffs, offsets, min_size=5, strides=[1, 1])
        m = matching(seg, gt)
        assert m["f1"] > 0.9

    def test_watershed_from_components(self):
        gt = make_gt()
        from torch_em_tpu.ops.host import find_boundaries

        boundaries = find_boundaries(gt).astype("float32")
        fg = np.ones(gt.shape, dtype="float32")
        seg = watershed_from_components(boundaries, fg, min_size=5)
        assert matching(seg, gt)["f1"] > 0.8

    def test_connected_components_with_boundaries(self):
        gt = make_gt()
        from torch_em_tpu.ops.host import find_boundaries

        boundaries = find_boundaries(gt).astype("float32")
        fg = np.ones(gt.shape, dtype="float32")
        seg = connected_components_with_boundaries(fg, boundaries)
        assert len(np.unique(seg)) > 2

    def test_watershed_from_maxima(self):
        gt = make_gt()
        from torch_em_tpu.ops.host import find_boundaries

        boundaries = find_boundaries(gt).astype("float32")
        fg = np.ones(gt.shape, dtype="float32")
        seg = watershed_from_maxima(boundaries, fg, min_distance=3, min_size=5)
        assert seg.shape == gt.shape

    def test_distance_watershed_decode(self):
        gt = make_gt()
        from torch_em_tpu.transforms import PerObjectDistanceTransform

        target = PerObjectDistanceTransform(apply_label=False)(gt)
        fg, center_dist, bdist = target[0], target[1], target[2]
        seg = watershed_from_center_and_boundary_distances(center_dist, bdist, fg, min_size=5)
        assert seg.shape == gt.shape
        assert len(np.unique(seg)) > 2

    def test_multicut(self):
        gt = make_gt()
        from torch_em_tpu.ops.host import find_boundaries

        boundaries = find_boundaries(gt).astype("float32")
        seg = multicut_segmentation(boundaries)
        assert matching(seg, gt)["f1"] > 0.5

    def test_size_filter_with_hmap(self):
        gt = make_gt().astype("uint32")
        hmap = np.random.rand(*gt.shape).astype("float32")
        filtered = size_filter(gt, min_size=30, hmap=hmap, with_background=False)
        ids, sizes = np.unique(filtered[filtered != 0], return_counts=True)
        assert (sizes >= 30).all()


class TestInstanceMetrics:
    def test_mws_metrics(self):
        gt = make_gt()
        offsets = [[-1, 0], [0, -1], [-9, 0], [0, -9]]
        affs, _ = compute_affinities(gt.astype("uint64"), offsets)
        disaffs = 1 - affs
        fg = np.ones((1,) + gt.shape, dtype="float32")
        pred = np.concatenate([fg, disaffs], axis=0)[None]  # batch of 1
        target = gt[None, None].astype("float32")

        iou_metric = MWSIOUMetric(offsets=offsets, min_seg_size=5, strides=[1, 1])
        score = iou_metric(pred, target)
        assert score < 0.3  # low error for near-perfect affinities

        voi = MWSVOIMetric(offsets=offsets, min_seg_size=5, strides=[1, 1])(disaffs[None], target)
        assert voi < 1.5
        rand = MWSRandMetric(offsets=offsets, min_seg_size=5, strides=[1, 1])(disaffs[None], target)
        assert rand < 0.5


class TestClDice:
    def test_perfect(self):
        mask = np.zeros((32, 32), dtype="float32")
        mask[10:20, 5:28] = 1
        assert clDice(mask, mask) == pytest.approx(1.0)

    def test_soft_method(self):
        mask = np.zeros((32, 32), dtype="float32")
        mask[10:20, 5:28] = 1
        score = clDice(mask, mask, skeletonize_method="soft")
        assert score == pytest.approx(1.0, abs=1e-5)
