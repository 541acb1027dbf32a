"""Gates for the Stage protocol / pipeline builder (SURVEY §2.10)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from refined_ray.stages.protocol import Stage, build_pipeline


def _ds():
    import ray.data as rd

    return rd.from_arrow(pa.table({"x": [1, 2, 3, 4]}))


def test_plain_stage_chain(ray_session):
    double = Stage("double", lambda b: pa.table(
        {"x": pa.array(b["x"].to_numpy(zero_copy_only=False) * 2)}),
        requires=("x",))
    add_flag = Stage("flag", lambda b: b.append_column(
        "big", pa.array(b["x"].to_numpy(zero_copy_only=False) > 4)),
        requires=("x",), provides=("x", "big"))
    out = build_pipeline(_ds(), [double, add_flag]).take_all()
    assert [r["x"] for r in out] == [2, 4, 6, 8]
    assert [r["big"] for r in out] == [False, False, True, True]


def test_missing_column_names_the_stage(ray_session):
    bad = Stage("needs_y", lambda b: b, requires=("y",))
    with pytest.raises(Exception, match="needs_y"):
        build_pipeline(_ds(), [bad]).take_all()


def test_duplicate_stage_names_rejected(ray_session):
    s = Stage("a", lambda b: b)
    with pytest.raises(ValueError, match="duplicate"):
        build_pipeline(_ds(), [s, s])


def test_actor_class_stage(ray_session):
    import ray.data as rd

    from refined_ray.stages.multimodal import MediaResizer

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "media": pa.array([bytes(range(64))], type=pa.binary()),
    }))
    st = Stage("resize", MediaResizer,
               options={"fn_constructor_kwargs": {"out_h": 4, "out_w": 4},
                        "concurrency": 1, "batch_size": 8})
    rows = build_pipeline(ds, [st]).take_all()
    assert len(rows) == 1 and len(rows[0]["image"]) == 16
    assert rows[0]["height"] == 4 and rows[0]["width"] == 4
