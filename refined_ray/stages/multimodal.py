"""Multimodal (image/audio/video) stages: opaque binary columns +
typed metadata, processed by actor-pool ``map_batches`` stages.

The container has no decode libraries (PIL/ffmpeg), so the DECODERS are
deterministic stand-ins behind the same interface a real decoder would
use (≙ the strategy SURVEY.md prescribes): the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and
tested, and swapping ``_decode_stub`` for e.g. ``PIL.Image.open`` is a
one-function change.

Batch sizing: media blobs are orders of magnitude bigger than text
rows, so these stages run with SMALL batch_size (see
``media_feature_stage``) to keep batch × concurrency within worker
heap, per the engine's memory rules.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _decode_stub(blob: bytes) -> np.ndarray:
    """Deterministic fake 'decode': blob bytes → (16, 16) uint8 'image'.

    Real deployments replace this with an actual decoder; everything
    downstream (feature extraction, batching, schema) is unchanged.
    Raises ValueError on empty blobs like a real decoder would.
    """
    if not blob:
        raise ValueError("empty media blob")
    h = hashlib.blake2b(blob, digest_size=32).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], dtype=np.uint64)[0])
    return rng.integers(0, 256, size=(16, 16), dtype=np.uint8)


class MediaFeatureExtractor:
    """Actor-pool stage: binary media column → per-item features.

    State (a real model / decoder context) is built once per actor in
    ``__init__``; ``__call__`` is per batch.  Output schema:
      (id:int64, n_bytes:int64, byte_entropy:float64,
       mean_intensity:float64, feature:binary[64 f32])
    """

    def __init__(self, id_col: str = "doc_id", media_col: str = "media"):
        self.id_col = id_col
        self.media_col = media_col
        # "model": a fixed projection matrix, loaded once per actor
        rng = np.random.default_rng(1234)
        self.proj = rng.standard_normal((256, 64)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        blobs = batch[self.media_col].to_pylist()
        n_bytes, entropy, mean_int, feats = [], [], [], []
        for blob in blobs:
            b = np.frombuffer(blob, dtype=np.uint8)
            n_bytes.append(len(b))
            counts = np.bincount(b, minlength=256)
            p = counts[counts > 0] / len(b)
            entropy.append(float(-(p * np.log2(p)).sum()))
            img = _decode_stub(blob)
            mean_int.append(float(img.mean()))
            hist = np.bincount(img.ravel(), minlength=256).astype(np.float32)
            feats.append((hist @ self.proj).tobytes())
        return pa.table({
            self.id_col: pa.array(ids, type=pa.int64()),
            "n_bytes": pa.array(n_bytes, type=pa.int64()),
            "byte_entropy": pa.array(entropy, type=pa.float64()),
            "mean_intensity": pa.array(mean_int, type=pa.float64()),
            "feature": pa.array(feats, type=pa.binary()),
        })


def media_feature_stage(ds, id_col: str = "doc_id", media_col: str = "media",
                        concurrency=(1, 4), batch_size: int = 256):
    """Run the extractor actor pool with media-sized batches."""
    from .protocol import Stage

    return Stage(
        name="media_features", fn=MediaFeatureExtractor,
        provides=(id_col, "feat_mean", "feat_std", "feat_hash"),
        options={"fn_constructor_kwargs": {"id_col": id_col, "media_col": media_col},
                 "concurrency": concurrency, "batch_size": batch_size},
    ).apply(ds)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized bilinear resize of a 2-D uint8 image (align-corners
    sampling).  Pure numpy — a real deployment swaps in a library
    resize exactly like ``_decode_stub`` swaps for a real decoder, but
    unlike the decoder this op needs no external library at all."""
    h, w = img.shape
    ys = np.linspace(0, h - 1, out_h)
    xs = np.linspace(0, w - 1, out_w)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    f = img.astype(np.float64)
    top = f[y0[:, None], x0[None, :]] * (1 - fx) + f[y0[:, None], x1[None, :]] * fx
    bot = f[y1[:, None], x0[None, :]] * (1 - fx) + f[y1[:, None], x1[None, :]] * fx
    return np.clip(top * (1 - fy) + bot * fy, 0, 255).round().astype(np.uint8)


class MediaResizer:
    """Actor-pool stage: decode → resize to a fixed (h, w) → re-emit as
    bytes (the standard image-normalization step before a model stage).
    Output: (id:int64, height:int64, width:int64, image:binary[h*w])."""

    def __init__(self, id_col: str = "doc_id", media_col: str = "media",
                 out_h: int = 8, out_w: int = 8):
        self.id_col = id_col
        self.media_col = media_col
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        blobs = batch[self.media_col].to_pylist()
        imgs = [resize_bilinear(_decode_stub(b), self.out_h, self.out_w).tobytes()
                for b in blobs]
        n = len(ids)
        return pa.table({
            self.id_col: pa.array(ids, type=pa.int64()),
            "height": pa.array([self.out_h] * n, type=pa.int64()),
            "width": pa.array([self.out_w] * n, type=pa.int64()),
            "image": pa.array(imgs, type=pa.binary()),
        })


def media_resize_stage(ds, id_col: str = "doc_id", media_col: str = "media",
                       out_h: int = 8, out_w: int = 8,
                       concurrency=(1, 4), batch_size: int = 256):
    from .protocol import Stage

    return Stage(
        name="media_resize", fn=MediaResizer,
        options={"fn_constructor_kwargs": {"id_col": id_col, "media_col": media_col,
                                           "out_h": out_h, "out_w": out_w},
                 "concurrency": concurrency, "batch_size": batch_size},
    ).apply(ds)


class FrameSampler:
    """Actor-pool stage: video-shaped binary blob → sampled frame rows.

    A "video" is an opaque byte stream of fixed-size frame records
    (``frame_bytes`` each; a real container parser replaces the slicing
    exactly like ``_decode_stub`` replaces a real image decoder).  Every
    ``stride``-th frame is sampled and emitted as its OWN row — the
    fan-out (flat_map) shape every video pipeline needs, with the blob
    sliced zero-copy per frame.  Output:
      (id:int64, frame_idx:int64, n_frames:int64, frame_mean:float64,
       frame:binary[frame_bytes])
    """

    def __init__(self, id_col: str = "doc_id", media_col: str = "media",
                 frame_bytes: int = 256, stride: int = 4):
        self.id_col = id_col
        self.media_col = media_col
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        blobs = batch[self.media_col].to_pylist()
        out = {"id": [], "frame_idx": [], "n_frames": [], "frame_mean": [],
               "frame": []}
        for vid, blob in zip(ids, blobs):
            view = np.frombuffer(blob, dtype=np.uint8)
            n_frames = len(view) // self.frame_bytes
            for fi in range(0, n_frames, self.stride):
                frame = view[fi * self.frame_bytes:(fi + 1) * self.frame_bytes]
                out["id"].append(vid)
                out["frame_idx"].append(fi)
                out["n_frames"].append(n_frames)
                out["frame_mean"].append(float(frame.mean()))
                out["frame"].append(frame.tobytes())
        return pa.table({
            self.id_col: pa.array(out["id"], type=pa.int64()),
            "frame_idx": pa.array(out["frame_idx"], type=pa.int64()),
            "n_frames": pa.array(out["n_frames"], type=pa.int64()),
            "frame_mean": pa.array(out["frame_mean"], type=pa.float64()),
            "frame": pa.array(out["frame"], type=pa.binary()),
        })


def frame_sample_stage(ds, id_col: str = "doc_id", media_col: str = "media",
                       frame_bytes: int = 256, stride: int = 4,
                       concurrency=(1, 4), batch_size: int = 64):
    """Frame sampling with SMALL batches: the fan-out multiplies rows
    by n_frames/stride, so batch × expansion must fit worker heap."""
    from .protocol import Stage

    return Stage(
        name="frame_sample", fn=FrameSampler,
        options={"fn_constructor_kwargs": {"id_col": id_col, "media_col": media_col,
                                           "frame_bytes": frame_bytes, "stride": stride},
                 "concurrency": concurrency, "batch_size": batch_size},
    ).apply(ds)
