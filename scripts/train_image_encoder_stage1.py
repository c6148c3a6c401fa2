"""Stage-1 image encoder distillation entry point.

CLI equivalent of reference stage1/train_image_encoder_stage1.py: train a
student trunk against stored teacher embeddings (see
scripts/save_embedding_image_stage1.py for the export pass).

  python scripts/train_image_encoder_stage1.py \
      --images-dir data/sa1b --store data/teacher_embeds.bin \
      --backbone efficientvit --model b1 --batch-size 64 --epochs 50
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools
import glob
import os

import jax
import jax.numpy as jnp

from efficientsam3_tpu.data.sa1b import SA1BDistillationDataset, batch_iterator
from efficientsam3_tpu.parallel import make_mesh
from efficientsam3_tpu.train.stage1 import (
    Stage1ImageConfig,
    make_optimizer,
    make_student,
    stage1_train_step,
)
from efficientsam3_tpu.train.trainer import Trainer, TrainerConfig


def main():
    # multi-host: one process per host (reference train/train.py launchers)
    from efficientsam3_tpu.parallel import initialize_distributed

    initialize_distributed()

    ap = argparse.ArgumentParser()
    ap.add_argument("--images-dir", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--backbone", default="efficientvit")
    ap.add_argument("--model", default="b1")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--base-lr", type=float, default=1e-3)
    ap.add_argument("--image-size", type=int, default=1008)
    ap.add_argument("--checkpoint-dir", default="checkpoints/stage1")
    ap.add_argument("--dp", type=int, default=0, help="data-parallel devices (0=all)")
    args = ap.parse_args()

    cfg = Stage1ImageConfig(
        backbone_type=args.backbone, model_name=args.model,
        image_size=args.image_size, base_lr=args.base_lr,
        epochs=args.epochs, global_batch=args.batch_size,
    )
    paths = sorted(
        glob.glob(os.path.join(args.images_dir, "*.jpg"))
        + glob.glob(os.path.join(args.images_dir, "*.png"))
    )
    dataset = SA1BDistillationDataset(
        paths, args.store, image_size=cfg.image_size,
        embed_dim=cfg.embed_dim, embed_size=cfg.embed_size,
    )
    steps_per_epoch = len(dataset) // args.batch_size
    model = make_student(cfg)
    tx = make_optimizer(cfg, steps_per_epoch)

    rng = jax.random.PRNGKey(0)
    variables = model.init(
        rng, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)), train=True
    )
    opt_state = tx.init(variables["params"])

    raw_step = jax.jit(functools.partial(stage1_train_step, model, tx))

    def step(variables, opt_state, batch):
        return raw_step(
            variables, opt_state,
            jnp.asarray(batch["image"]), jnp.asarray(batch["teacher"]),
            jnp.asarray(batch["valid"]),
        )

    n_dev = args.dp or len(jax.devices())
    mesh = make_mesh({"dp": n_dev}) if n_dev > 1 else None
    trainer = Trainer(
        step,
        TrainerConfig(
            max_steps=cfg.epochs * steps_per_epoch,
            checkpoint_dir=args.checkpoint_dir,
            mesh=mesh,
        ),
    )
    trainer.run(
        variables, opt_state,
        batch_iterator(dataset, args.batch_size, epochs=cfg.epochs),
    )


if __name__ == "__main__":
    main()
