"""Tensor-parallel PartitionSpec rules (mesh execution is validated by the
multichip dryrun subprocess, tests/test_multichip_launcher.py)."""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from efficientsam3_tpu.parallel import count_sharded, tp_param_spec


def _fake_params():
    return {
        "fusion_encoder": {
            "layers_0": {
                "self_attn": {
                    "q_proj": {"kernel": jnp.zeros((256, 256)), "bias": jnp.zeros(256)},
                    "out_proj": {"kernel": jnp.zeros((256, 256)), "bias": jnp.zeros(256)},
                },
                "linear1": {"kernel": jnp.zeros((256, 2048)), "bias": jnp.zeros(2048)},
                "linear2": {"kernel": jnp.zeros((2048, 256)), "bias": jnp.zeros(256)},
                "norm1": {"scale": jnp.zeros(256), "bias": jnp.zeros(256)},
            }
        },
        "decoder": {"query_embed": {"embedding": jnp.zeros((200, 256))}},
        "trunk": {"conv": {"kernel": jnp.zeros((3, 3, 3, 64))}},
    }


def test_column_row_rules():
    spec = tp_param_spec(_fake_params())
    enc = spec["fusion_encoder"]["layers_0"]
    assert enc["self_attn"]["q_proj"]["kernel"] == P(None, "tp")
    assert enc["self_attn"]["q_proj"]["bias"] == P("tp")
    assert enc["self_attn"]["out_proj"]["kernel"] == P("tp", None)
    assert enc["self_attn"]["out_proj"]["bias"] == P()  # row-parallel bias replicated
    assert enc["linear1"]["kernel"] == P(None, "tp")
    assert enc["linear2"]["kernel"] == P("tp", None)
    assert enc["norm1"]["scale"] == P()
    # embeddings and out-of-scope modules replicated
    assert spec["decoder"]["query_embed"]["embedding"] == P()
    assert spec["trunk"]["conv"]["kernel"] == P()
    assert count_sharded(spec) == 6


def test_works_on_eval_shape_tree():
    shapes = jax.eval_shape(_fake_params)
    spec = tp_param_spec(shapes)
    assert count_sharded(spec) == 6
