"""Stage-1 data pipeline: export -> replayed-aug dataset -> batches."""

import numpy as np
import pytest

from efficientsam3_tpu import native

pytestmark = pytest.mark.skipif(native.lib() is None, reason="no g++ available")


def test_export_and_dataset_roundtrip(tmp_path):
    from PIL import Image

    from efficientsam3_tpu.data.sa1b import (
        SA1BDistillationDataset,
        batch_iterator,
        export_teacher_embeddings,
        replayed_augment,
    )

    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        img = (rng.random((40 + i * 5, 60, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)

    E, C, S = 4, 8, 32
    captured = {}

    def fake_teacher(imgs):
        captured.setdefault("batches", []).append(imgs.copy())
        # deterministic function of the input
        out = np.zeros((imgs.shape[0], E, E, C), np.float32)
        out[..., 0] = imgs.mean(axis=(1, 2, 3))[:, None, None]
        return out

    store = str(tmp_path / "store.bin")
    export_teacher_embeddings(
        fake_teacher, paths, store, image_size=S, batch_size=2, seed=1
    )

    ds = SA1BDistillationDataset(paths, store, image_size=S, embed_dim=C, embed_size=E)
    assert len(ds) == 4
    s0 = ds[0]
    assert s0["image"].shape == (S, S, 3)
    assert s0["teacher"].shape == (E, E, C)
    # the student sees EXACTLY the image the teacher saw (seed-replayed augs)
    teacher_input = captured["batches"][0][0]
    np.testing.assert_allclose(s0["image"], teacher_input, atol=1e-6)
    # teacher record matches the fake teacher's function of that image
    np.testing.assert_allclose(
        s0["teacher"][0, 0, 0], teacher_input.mean(), atol=1e-3
    )
    assert 0 < s0["valid"].sum() <= E * E

    batches = list(batch_iterator(ds, batch_size=2, epochs=1, shuffle=False))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, S, S, 3)
