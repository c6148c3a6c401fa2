"""Teacher embedding export for stage-1 distillation.

CLI equivalent of reference stage1/save_embedding_image_stage1.py: one pass
of the ViT-H teacher over the dataset, storing [aug seed | fp16 embedding]
records; `--check-saved-embed` re-reads records and compares to fresh
teacher outputs (the reference's verification mode).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import os

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images-dir", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--teacher-checkpoint", default=None, help="sam3.pt path")
    ap.add_argument("--image-size", type=int, default=1008)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--check-saved-embed", action="store_true")
    args = ap.parse_args()

    from efficientsam3_tpu.data.sa1b import (
        SA1BDistillationDataset,
        export_teacher_embeddings,
    )
    from efficientsam3_tpu.models.vitdet import ViTTrunk

    teacher = ViTTrunk(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, args.image_size, args.image_size, 3))
    if args.teacher_checkpoint:
        from efficientsam3_tpu.utils.checkpoint import load_torch_state_dict
        from efficientsam3_tpu.utils.convert_model import convert_vitdet

        sd = load_torch_state_dict(args.teacher_checkpoint)
        params, _ = convert_vitdet(sd, "backbone.vision_backbone.trunk")
        variables = {"params": params}
    else:
        print("WARNING: no teacher checkpoint; exporting random-teacher embeddings")
        variables = teacher.init(rng, dummy)

    apply_fn = jax.jit(lambda img: teacher.apply(variables, jnp.asarray(img)))
    paths = sorted(
        glob.glob(os.path.join(args.images_dir, "*.jpg"))
        + glob.glob(os.path.join(args.images_dir, "*.png"))
    )

    if args.check_saved_embed:
        ds = SA1BDistillationDataset(paths, args.store, image_size=args.image_size)
        errs = []
        for i in range(min(len(ds), 16)):
            s = ds[i]
            fresh = np.asarray(apply_fn(s["image"][None]))[0]
            errs.append(np.abs(fresh.astype(np.float16) - s["teacher"]).max())
        print(f"max record error over {len(errs)} samples: {max(errs):.4f}")
        return

    export_teacher_embeddings(
        apply_fn, paths, args.store,
        image_size=args.image_size, batch_size=args.batch_size,
    )
    print(f"exported {len(paths)} records to {args.store}")


if __name__ == "__main__":
    main()
