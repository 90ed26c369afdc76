"""SPOCO sparse-supervision embedding recipe (BASELINE.md config 4).

Trains a UNet2d predicting pixel embeddings with the SPOCO loss (two-network
EMA consistency). Run: python train_spoco_dsb.py -i /path/to/dsb
"""

from torch_em_tpu.data.datasets.light_microscopy import get_dsb_loader
from torch_em_tpu.loss import ContrastiveLoss, SPOCOLoss
from torch_em_tpu.models import UNet2d
from torch_em_tpu.trainer import OptimizerSpec
from torch_em_tpu.trainer.spoco_trainer import SPOCOTrainer
from torch_em_tpu.transforms.label import connected_components
from torch_em_tpu.utils.training import parser_helper


def main():
    parser = parser_helper(description="Train SPOCO embeddings on DSB",
                           default_iterations=50000, default_batch_size=8)
    args = parser.parse_args()

    n_embedding_dims = 8
    model = UNet2d(in_channels=1, out_channels=n_embedding_dims, initial_features=32)

    patch_shape = (1, 256, 256)
    loader_kwargs = dict(
        patch_shape=patch_shape, batch_size=args.batch_size, download=True,
        label_transform=connected_components, label_dtype="int32", num_workers=4,
    )
    train_loader = get_dsb_loader(args.input, split="train", shuffle=True, **loader_kwargs)
    val_loader = get_dsb_loader(args.input, split="test", **loader_kwargs)

    trainer = SPOCOTrainer(
        name="spoco-dsb",
        model=model,
        train_loader=train_loader,
        val_loader=val_loader,
        loss=SPOCOLoss(delta_var=0.75, delta_dist=2.0),
        metric=ContrastiveLoss(delta_var=0.75, delta_dist=2.0),
        optimizer=OptimizerSpec("adamw", lr=1e-4),
        momentum=0.999,
        mixed_precision=True,
    )
    trainer.fit(iterations=args.n_iterations)


if __name__ == "__main__":
    main()
