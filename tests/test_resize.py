"""Tests for the bilinear resize op and the resize actor stage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from refined_ray.stages.multimodal import resize_bilinear


def test_identity_resize():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert (resize_bilinear(img, 8, 8) == img).all()


def test_downscale_constant_image():
    img = np.full((16, 16), 200, dtype=np.uint8)
    out = resize_bilinear(img, 4, 4)
    assert out.shape == (4, 4)
    assert (out == 200).all()


def test_upscale_gradient_monotone():
    img = np.tile(np.arange(0, 160, 10, dtype=np.uint8), (4, 1))  # h=4, w=16
    out = resize_bilinear(img, 4, 32)
    # horizontal gradient stays monotone after upscale
    assert (np.diff(out[0].astype(int)) >= 0).all()
    assert out[0, 0] == img[0, 0] and out[0, -1] == img[0, -1]  # corners align


def test_resize_stage(ray_session):
    import ray.data as rd

    from refined_ray.stages.multimodal import media_resize_stage

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "media": pa.array([b"hello world", b"other blob"], type=pa.binary()),
    }))
    rows = media_resize_stage(ds, out_h=8, out_w=8).take_all()
    assert len(rows) == 2
    for r in rows:
        assert (r["height"], r["width"]) == (8, 8)
        assert len(r["image"]) == 64
    # deterministic stub decode → deterministic resized bytes
    rows2 = media_resize_stage(ds, out_h=8, out_w=8).take_all()
    assert rows[0]["image"] == rows2[0]["image"]
