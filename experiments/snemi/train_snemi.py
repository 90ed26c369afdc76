"""SNEMI north-star recipe: affinity UNet3d + mutex-watershed decoding
(BASELINE.md config 3).

Run: python train_snemi.py -i /path/to/snemi [-n 100000]
"""

import torch_em_tpu as torch_em
from torch_em_tpu.data.datasets.electron_microscopy import get_snemi_loader
from torch_em_tpu.models import AnisotropicUNet
from torch_em_tpu.utils.training import parser_helper

OFFSETS = [
    [-1, 0, 0], [0, -1, 0], [0, 0, -1],
    [-2, 0, 0], [0, -3, 0], [0, 0, -3],
    [-3, 0, 0], [0, -9, 0], [0, 0, -9],
    [-4, 0, 0], [0, -27, 0], [0, 0, -27],
]


def main():
    parser = parser_helper(description="Train an affinity 3D U-Net on SNEMI",
                           default_iterations=100000, default_batch_size=1)
    args = parser.parse_args()

    model = AnisotropicUNet(
        in_channels=1, out_channels=len(OFFSETS),
        scale_factors=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]],
        initial_features=32, final_activation="Sigmoid", anisotropic_kernel=True,
    )

    patch_shape = (32, 256, 256)
    train_loader = get_snemi_loader(
        args.input, patch_shape=patch_shape, batch_size=args.batch_size,
        sample="train", offsets=OFFSETS, download=True, num_workers=4, shuffle=True,
        n_samples=1000,
    )
    val_loader = get_snemi_loader(
        args.input, patch_shape=patch_shape, batch_size=args.batch_size,
        sample="train", offsets=OFFSETS, download=True, num_workers=4, n_samples=25,
        rois=(slice(0, 25), slice(None), slice(None)),
    )

    # masked dice for the affinity channels (the target carries validity masks)
    loss = torch_em.loss.LossWrapper(
        torch_em.loss.DiceLoss(),
        transform=torch_em.loss.ApplyAndRemoveMask(masking_method="multiply"),
    )

    trainer = torch_em.default_segmentation_trainer(
        name="snemi-affinity-model",
        model=model,
        train_loader=train_loader,
        val_loader=val_loader,
        loss=loss,
        metric=loss,
        learning_rate=1e-4,
        mixed_precision=True,
    )
    trainer.fit(iterations=args.n_iterations)


def segment_example(checkpoint, raw):
    """Decode trained affinities with the mutex watershed."""
    import numpy as np

    from torch_em_tpu.utils.prediction import predict_with_halo
    from torch_em_tpu.utils.segmentation import mutex_watershed_segmentation
    from torch_em_tpu.utils.util import load_model

    model = load_model(checkpoint)
    affs = predict_with_halo(raw, model, block_shape=(32, 256, 256), halo=(4, 32, 32))
    fg = np.ones(affs.shape[1:], dtype="float32")
    return mutex_watershed_segmentation(fg, affs, OFFSETS)


if __name__ == "__main__":
    main()
