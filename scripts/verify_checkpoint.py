"""Checkpoint integrity verifier.

Mirrors the reference stage-3 sanity tooling
(sam3/stage3/verify_checkpoint_integrity.py, sanity_check_merge.py): given
an orbax checkpoint directory (or a torch .pt state dict), check it against
a freshly built model of the requested config and report

  - missing parameters (in the model, absent from the checkpoint)
  - unexpected parameters (in the checkpoint, absent from the model)
  - shape mismatches
  - non-finite tensors (NaN/Inf counts)
  - total parameter count / bytes

Exit code 0 iff no missing/mismatched/non-finite entries (unexpected keys
are a warning by default; --strict makes them fatal).

Usage:
  python scripts/verify_checkpoint.py --ckpt-dir runs/stage3 \
      --backbone efficientvit --model-name b1
  python scripts/verify_checkpoint.py --torch-pt merged.pt ...
"""

from __future__ import annotations

import argparse
import sys


def flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}{k}/" if prefix or True else k))
    else:
        out[prefix[:-1]] = tree
    return out


def compare(want: dict, got: dict):
    """Compare flat {name: array-or-shapestruct} trees.

    Returns (missing, unexpected, mismatched, nonfinite, n_params, n_bytes)."""
    import numpy as np

    missing = sorted(set(want) - set(got))
    unexpected = sorted(set(got) - set(want))
    mismatched, nonfinite = [], []
    n_params = n_bytes = 0
    for k in sorted(set(want) & set(got)):
        g = np.asarray(got[k])
        n_params += g.size
        n_bytes += g.nbytes
        if tuple(g.shape) != tuple(want[k].shape):
            mismatched.append((k, tuple(g.shape), tuple(want[k].shape)))
        elif g.dtype.kind == "f":
            bad = int(np.sum(~np.isfinite(g)))
            if bad:
                nonfinite.append((k, bad))
    return missing, unexpected, mismatched, nonfinite, n_params, n_bytes


def main():
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", help="orbax checkpoint directory")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--torch-pt", help="torch state-dict .pt to verify instead")
    ap.add_argument("--backbone", default="efficientvit")
    ap.add_argument("--model-name", default="b1")
    ap.add_argument("--text-encoder", default="MobileCLIP-S0")
    ap.add_argument("--context-length", type=int, default=32)
    ap.add_argument("--strict", action="store_true",
                    help="unexpected checkpoint keys are fatal")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from efficientsam3_tpu.build import build_efficientsam3_image_model
    from efficientsam3_tpu.models.geometry import Prompt

    model = build_efficientsam3_image_model(
        backbone_type=args.backbone, model_name=args.model_name,
        text_encoder_type=args.text_encoder,
        text_encoder_context_length=args.context_length,
    )
    variables = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 1008, 1008, 3)),
        jnp.zeros((1, args.context_length), jnp.int32),
        Prompt.empty(1, 4, 4),
    )
    want = flatten(variables.get("params", variables))

    if args.torch_pt:
        from efficientsam3_tpu.utils.checkpoint import load_torch_state_dict
        from efficientsam3_tpu.utils.convert_model import convert_image_model

        sd = load_torch_state_dict(args.torch_pt)
        got_vars = convert_image_model(
            sd, jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
        )
        got = flatten(got_vars.get("params", got_vars))
    else:
        from efficientsam3_tpu.utils.checkpoint import load_checkpoint

        state, step = load_checkpoint(args.ckpt_dir, args.step)
        print(f"loaded step {step}")
        v = state.get("variables", state)
        got = flatten(v.get("params", v))

    missing, unexpected, mismatched, nonfinite, n_params, n_bytes = compare(
        want, got
    )

    print(f"parameters checked: {n_params:,} ({n_bytes / 1e6:.1f} MB)")
    for name, rows in (("missing", missing), ("unexpected", unexpected)):
        print(f"{name}: {len(rows)}")
        for k in rows[:20]:
            print(f"  {k}")
    print(f"shape mismatches: {len(mismatched)}")
    for k, g, w in mismatched[:20]:
        print(f"  {k}: ckpt {g} vs model {w}")
    print(f"non-finite tensors: {len(nonfinite)}")
    for k, bad in nonfinite[:20]:
        print(f"  {k}: {bad} bad values")

    fatal = bool(missing or mismatched or nonfinite)
    if args.strict:
        fatal = fatal or bool(unexpected)
    print("INTEGRITY OK" if not fatal else "INTEGRITY FAILED")
    sys.exit(1 if fatal else 0)


if __name__ == "__main__":
    main()
