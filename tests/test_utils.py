"""Config / checkpoint / observability / tokenizer unit tests."""

import os

import numpy as np
import pytest

import jax.numpy as jnp


def test_config_overrides(tmp_path):
    from efficientsam3_tpu.config import ModelConfig, TrainConfig, load_config

    cfg = load_config(
        TrainConfig,
        overrides=["batch_size=8", "model.backbone_type=repvit", "model.model_name=m1.1"],
    )
    assert cfg.batch_size == 8
    assert cfg.model.backbone_type == "repvit"
    assert cfg.model.model_name == "m1.1"

    import json

    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"epochs": 3, "model": {"resolution": 504}}))
    cfg2 = load_config(TrainConfig, str(p))
    assert cfg2.epochs == 3 and cfg2.model.resolution == 504


def test_checkpoint_roundtrip_and_partial(tmp_path):
    from efficientsam3_tpu.utils.checkpoint import (
        latest_step,
        load_checkpoint,
        merge_params,
        save_checkpoint,
    )

    state = {
        "params": {
            "trunk": {"w": jnp.ones((2, 2))},
            "decoder": {"w": jnp.zeros((3,))},
        },
        "step": jnp.asarray(5),
    }
    save_checkpoint(str(tmp_path), 5, state)
    save_checkpoint(str(tmp_path), 9, state, param_prefixes=["trunk"])
    assert latest_step(str(tmp_path)) == 9
    partial, step = load_checkpoint(str(tmp_path), 9)
    assert step == 9
    assert "trunk" in partial["params"] and "decoder" not in partial["params"]
    merged = merge_params(state["params"], partial["params"])
    assert "decoder" in merged

    full, _ = load_checkpoint(str(tmp_path), 5)
    np.testing.assert_array_equal(full["params"]["trunk"]["w"], np.ones((2, 2)))


def test_frozen_audit():
    from efficientsam3_tpu.utils.checkpoint import assert_frozen_unchanged

    before = {"decoder": {"w": jnp.zeros((2,))}, "trunk": {"w": jnp.ones((2,))}}
    after_ok = {"decoder": {"w": jnp.zeros((2,))}, "trunk": {"w": jnp.full((2,), 2.0)}}
    assert_frozen_unchanged(before, after_ok, ["decoder"])
    after_bad = {"decoder": {"w": jnp.ones((2,))}, "trunk": {"w": jnp.ones((2,))}}
    with pytest.raises(AssertionError):
        assert_frozen_unchanged(before, after_bad, ["decoder"])


def test_meters_and_shape_logger():
    from efficientsam3_tpu.utils.observability import MeterBank, ShapeLogger

    bank = MeterBank()
    bank.update(loss=2.0)
    bank.update(loss=1.0)
    assert bank.meters["loss"].avg == 1.5

    calls = []
    sl = ShapeLogger(lambda x: calls.append(x.shape), "probe")
    sl(np.zeros((2, 3)))
    sl(np.zeros((2, 3)))
    sl(np.zeros((4, 3)))
    assert len(sl.seen) == 2


@pytest.mark.skipif(
    not os.path.exists("/root/reference/sam3/assets/bpe_simple_vocab_16e6.txt.gz"),
    reason="bpe asset unavailable",
)
def test_tokenizer_known_ids():
    os.environ.setdefault(
        "EFFICIENTSAM3_BPE_PATH",
        "/root/reference/sam3/assets/bpe_simple_vocab_16e6.txt.gz",
    )
    from efficientsam3_tpu.utils.tokenizer import ClipTokenizer

    tok = ClipTokenizer()
    ids = tok("a photo of a yellow dog", 16)[0]
    # canonical CLIP tokenization
    assert ids[:8].tolist() == [49406, 320, 1125, 539, 320, 4481, 1929, 49407]
    # truncation keeps EOT in the last slot
    long = tok("word " * 50, 8)[0]
    assert long[0] == 49406 and long[-1] == 49407


def test_metrics_writer_tensorboard_framing(tmp_path):
    """The dependency-free TB writer produces valid TFRecord framing
    (length + masked CRC32-C per record) and the scalar protos round-trip."""
    import glob
    import struct

    from efficientsam3_tpu.utils.observability import (
        MetricsWriter,
        _masked_crc,
    )

    d = str(tmp_path / "logs")
    w = MetricsWriter(d)
    w.write(3, {"loss": 1.25, "lr": 1e-3})
    w.write(4, {"loss": 0.75})
    w.close()

    assert (tmp_path / "logs" / "metrics.jsonl").exists()
    ev = glob.glob(d + "/events.out.tfevents.*")[0]
    data = open(ev, "rb").read()
    off = 0
    records = []
    while off < len(data):
        (ln,) = struct.unpack("<Q", data[off : off + 8])
        (hcrc,) = struct.unpack("<I", data[off + 8 : off + 12])
        assert hcrc == _masked_crc(data[off : off + 8])
        payload = data[off + 12 : off + 12 + ln]
        (pcrc,) = struct.unpack("<I", data[off + 12 + ln : off + 16 + ln])
        assert pcrc == _masked_crc(payload)
        records.append(payload)
        off += 16 + ln
    assert len(records) == 3  # file-version + 2 scalar events
    assert b"brain.Event:2" in records[0]
    assert b"loss" in records[1] and b"lr" in records[1]


def test_verify_checkpoint_compare():
    """Integrity comparison core (reference verify_checkpoint_integrity):
    missing/unexpected/shape-mismatch/non-finite classification."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "verify_checkpoint",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "verify_checkpoint.py"),
    )
    vc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vc)

    want_tree = {"a": {"w": np.zeros((2, 3)), "b": np.zeros(4)},
                 "c": {"w": np.zeros(5)}}
    got_tree = {"a": {"w": np.ones((2, 3)), "b": np.zeros((4, 1))},
                "d": {"x": np.zeros(1)}}
    got_tree["a"]["w"][0, 0] = np.nan
    want, got = vc.flatten(want_tree), vc.flatten(got_tree)
    missing, unexpected, mismatched, nonfinite, n, _ = vc.compare(want, got)
    assert missing == ["c/w"]
    assert unexpected == ["d/x"]
    assert mismatched == [("a/b", (4, 1), (4,))]
    assert nonfinite == [("a/w", 1)]
    assert n == 6 + 4
