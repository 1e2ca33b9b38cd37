"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns and
processed by actor-pool ``map_batches`` stages — payloads never convert to
Python object rows, batches stay small because rows are wide.  The decode
kernels themselves (PIL/ffmpeg-style) are NOT available in this container,
so they are stubbed behind ``NotImplementedError`` / a deterministic fake —
the Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa


class BinaryMetadata:
    """Stateless metadata pass: byte length + md5 digest per payload.
    The minimal real op every multimodal pipeline starts with."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n_bytes = [len(p) if p is not None else 0 for p in payloads]
        digests = [hashlib.md5(p or b"").hexdigest() for p in payloads]
        return pa.table({
            "doc_id": batch[self.id_col],
            "n_bytes": pa.array(n_bytes, type=pa.int64()),
            "digest": pa.array(digests, type=pa.string()),
        })


class ImageDecodeStub:
    """Actor-pool decode stage.  ``__init__`` is where a real pipeline
    loads its codec/model once per actor; ``__call__`` decodes a batch.

    ``mode="fake"`` produces a deterministic fake decode (payload-seeded
    8x8 grayscale "thumbnail" + inferred width/height) so downstream
    schema/layout is exercised end-to-end; ``mode="real"`` raises
    NotImplementedError (no image libs in this container).
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.payload_col = payload_col
        self.id_col = id_col
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "image decode requires PIL/libjpeg, unavailable in this "
                "container; run with mode='fake' for plumbing tests")
        payloads = batch[self.payload_col].to_pylist()
        widths, heights, thumbs = [], [], []
        for p in payloads:
            p = p or b""
            digest = hashlib.blake2b(p, digest_size=16).digest()
            widths.append(16 + digest[0])
            heights.append(16 + digest[1])
            rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
            thumbs.append(rng.integers(0, 256, size=64, dtype=np.uint8)
                          .tobytes())
        return pa.table({
            "doc_id": batch[self.id_col],
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "thumb": pa.array(thumbs, type=pa.binary()),
        })


class EmbedStub:
    """Actor-pool feature-extraction stage: payload → embedding
    (deterministic fake; a real model would load in ``__init__`` and run
    batched inference in ``__call__``)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 dim: int = 32):
        self.payload_col = payload_col
        self.id_col = id_col
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        embs = []
        for p in payloads:
            digest = hashlib.blake2b(p or b"", digest_size=8).digest()
            rng = np.random.default_rng(int.from_bytes(digest, "little"))
            v = rng.standard_normal(self.dim)
            embs.append((v / np.linalg.norm(v)).astype(np.float32).tolist())
        return pa.table({
            "doc_id": batch[self.id_col],
            "embedding": pa.array(embs, type=pa.list_(pa.float32())),
        })


def binary_metadata(ds, *, payload_col: str = "payload",
                    id_col: str = "doc_id", concurrency: Optional[int] = None):
    return ds.map_batches(
        BinaryMetadata(payload_col, id_col), batch_format="pyarrow",
        batch_size=256)


def decode_images(ds, *, payload_col: str = "payload", id_col: str = "doc_id",
                  mode: str = "fake", concurrency: int = 2,
                  batch_size: int = 64):
    """Actor-pool decode: small batches (wide binary rows), one decoder
    per actor.  This is the shape a real 100 TB image pipeline uses."""
    return ds.map_batches(
        ImageDecodeStub,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col,
                               "mode": mode},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def embed_binary(ds, *, payload_col: str = "payload", id_col: str = "doc_id",
                 dim: int = 32, concurrency: int = 2, batch_size: int = 64):
    return ds.map_batches(
        EmbedStub,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col,
                               "dim": dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
