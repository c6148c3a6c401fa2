"""Stage-3 joint finetune entry point.

CLI equivalent of reference stage3/train_stage3.py: finetune the student
trunks inside the full SAM3 model on mixed COCO-format sources with the
frozen-head optimizer partition.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools
import json

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sources", required=True,
                    help="JSON: [{name, ann, image_root, weight}, ...]")
    ap.add_argument("--backbone", default="efficientvit")
    ap.add_argument("--model", default="b1")
    ap.add_argument("--text-encoder", default="MobileCLIP-S0")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--max-steps", type=int, default=30000)
    ap.add_argument("--checkpoint", default=None, help="stage-1 spliced .pt")
    ap.add_argument("--checkpoint-dir", default="checkpoints/stage3")
    ap.add_argument("--context-length", type=int, default=32)
    ap.add_argument("--no-augment", action="store_true",
                    help="disable hflip/LSJ/color-jitter augmentations")
    args = ap.parse_args()

    # multi-host: one process per host, ranks wired from SLURM/torchrun-style
    # env (reference train/train.py:61-310 submitit/mp launch)
    from efficientsam3_tpu.parallel import initialize_distributed

    multi_host = initialize_distributed()
    if multi_host:
        print(f"multi-host: process {jax.process_index()}/{jax.process_count()}")

    from efficientsam3_tpu.build import build_efficientsam3_image_model
    from efficientsam3_tpu.data.stage3_mixed import Source, Stage3MixedDataset
    from efficientsam3_tpu.eval.coco_format import CocoDataset
    from efficientsam3_tpu.models.geometry import Prompt
    from efficientsam3_tpu.train.stage3 import (
        Stage3Config, make_stage3_optimizer, stage3_train_step,
    )
    from efficientsam3_tpu.train.trainer import Trainer, TrainerConfig
    from efficientsam3_tpu.utils.tokenizer import ClipTokenizer

    model = build_efficientsam3_image_model(
        backbone_type=args.backbone, model_name=args.model,
        text_encoder_type=args.text_encoder,
        text_encoder_context_length=args.context_length,
        dtype=jnp.bfloat16,
    )
    res = model.trunk.embed_size * 14
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        rng, jnp.zeros((1, res, res, 3)),
        jnp.zeros((1, args.context_length), jnp.int32), Prompt.empty(1, 8, 8),
    )
    if args.checkpoint:
        from efficientsam3_tpu.utils.checkpoint import load_torch_state_dict
        from efficientsam3_tpu.utils.convert_model import convert_image_model

        sd = load_torch_state_dict(args.checkpoint)
        params, stats = convert_image_model(
            sd, args.backbone, args.model, text_encoder_type=args.text_encoder
        )
        variables = {"params": params, "batch_stats": stats}

    cfg = Stage3Config()
    tx = make_stage3_optimizer(cfg, variables["params"])
    opt_state = tx.init(variables["params"])

    with open(args.sources) as f:
        srcs = [
            Source(s["name"], CocoDataset(s["ann"]), s["image_root"],
                   s.get("weight", 1.0))
            for s in json.load(f)
        ]
    dataset = Stage3MixedDataset(srcs, image_size=res, augment=not args.no_augment)
    tokenizer = ClipTokenizer()

    raw_step = jax.jit(functools.partial(stage3_train_step, model, tx))

    def step(variables, opt_state, batch):
        prompt = Prompt.empty(batch["images"].shape[0], 8, 8)
        step_batch = {
            "images": jnp.asarray(batch["images"]),
            "tokens": jnp.asarray(batch["tokens"]),
            "prompt": prompt,
            "rng": jax.random.PRNGKey(0),
            "targets": jax.tree.map(jnp.asarray, batch["targets"]),
        }
        return raw_step(variables, opt_state, step_batch)

    trainer = Trainer(
        step,
        TrainerConfig(
            max_steps=args.max_steps,
            checkpoint_dir=args.checkpoint_dir,
            save_param_prefixes=("trunk", "text_encoder"),  # partial ckpts
        ),
    )
    trainer.run(
        variables, opt_state,
        dataset.batches(tokenizer, args.batch_size, args.context_length),
    )


if __name__ == "__main__":
    main()
