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


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP → (H, W, 3) uint8 RGB, pure
    numpy (format spec is public; no codec lib needed)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(data[10:14], "little")
    width = int.from_bytes(data[18:22], "little", signed=True)
    height = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = height > 0
    height = abs(height)
    nch = bpp // 8
    stride = (width * nch + 3) & ~3
    px = np.frombuffer(data, dtype=np.uint8,
                       count=stride * height, offset=off)
    img = px.reshape(height, stride)[:, :width * nch] \
        .reshape(height, width, nch)
    if bottom_up:
        img = img[::-1]
    return img[:, :, 2::-1].copy()  # BGR(A) → RGB


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → (H, W, 3) / (H, W) uint8."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM payload")
    rgb = data[:2] == b"P6"
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    # exactly ONE whitespace byte separates maxval from the raster; a
    # "\r\n"-terminated header (some Windows tools) would silently shift
    # the pixel offset — validate the byte, detect the unambiguous CRLF
    # case by length, and verify the raster length before frombuffer
    ws = data[pos:pos + 1]
    if not ws.isspace():
        raise ValueError("PPM/PGM header: expected whitespace after maxval")
    pos += 1
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    nch = 3 if rgb else 1
    need = w * h * nch
    # a "\r" followed by "\n" is a CRLF-terminated header (Windows
    # writers) whenever skipping the LF still leaves a full raster; a
    # bare-\r separator with a raster that happens to START with 0x0A is
    # the only layout this misreads, and only when trailing bytes also
    # exist — PPM writers use "\n" or "\r\n", never bare "\r", so CRLF
    # wins the ambiguity
    if (ws == b"\r" and data[pos:pos + 1] == b"\n"
            and len(data) - pos - 1 >= need):
        pos += 1
    if len(data) - pos < need:
        raise ValueError(
            "PPM/PGM raster truncated: need "
            f"{need} bytes, have {len(data) - pos}")
    img = np.frombuffer(data, dtype=np.uint8, count=w * h * nch, offset=pos)
    return img.reshape((h, w, 3) if rgb else (h, w)).copy()


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy fancy-indexing."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[rows[:, None], cols[None, :]]


class ImageDecode:
    """Actor-pool REAL decode stage for the formats decodable without
    external codec libs (BMP BI_RGB, binary PPM/PGM), emitting
    (doc_id, width, height, channels, thumb) with a nearest-neighbor
    ``thumb_size``² grayscale thumbnail.  JPEG/PNG/etc. raise with the
    honest unavailable-codec message (``ImageDecodeStub`` covers
    plumbing tests for those).  Format sniffing per payload; decode
    state (none needed here, a codec context in general) belongs in
    ``__init__`` — once per actor."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 thumb_size: int = 8, on_error: str = "raise"):
        if on_error not in ("raise", "skip"):
            raise ValueError(on_error)
        self.payload_col = payload_col
        self.id_col = id_col
        self.thumb_size = thumb_size
        self.on_error = on_error

    def _decode(self, p: bytes) -> np.ndarray:
        if p[:2] == b"BM":
            return decode_bmp(p)
        if p[:2] in (b"P5", b"P6"):
            return decode_ppm(p)
        raise ValueError(
            "payload is not BMP/PPM/PGM; JPEG/PNG decode requires "
            "PIL/libjpeg, unavailable in this container")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, chans, thumbs = [], [], [], [], []
        ts = self.thumb_size
        for doc_id, p in zip(batch[self.id_col].to_pylist(),
                             batch[self.payload_col].to_pylist()):
            try:
                img = self._decode(p or b"")
            except ValueError:
                if self.on_error == "skip":
                    continue
                raise
            gray = img if img.ndim == 2 else \
                img.astype(np.uint16).mean(axis=2).astype(np.uint8)
            ids.append(doc_id)
            heights.append(img.shape[0])
            widths.append(img.shape[1])
            chans.append(1 if img.ndim == 2 else img.shape[2])
            thumbs.append(resize_nearest(gray, ts, ts).tobytes())
        return pa.table({
            "doc_id": pa.array(ids, type=batch[self.id_col].type),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "channels": pa.array(chans, type=pa.int32()),
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
                  batch_size: int = 64, thumb_size: int = 8,
                  on_error: str = "raise"):
    """Actor-pool decode: small batches (wide binary rows), one decoder
    per actor.  This is the shape a real 100 TB image pipeline uses.

    ``mode="real"`` decodes BMP/PPM/PGM with the pure-numpy kernels
    (``ImageDecode``); ``mode="fake"`` exercises the plumbing with the
    deterministic stub (for codec-lib formats unavailable here)."""
    if mode == "real":
        return ds.map_batches(
            ImageDecode,
            fn_constructor_kwargs={"payload_col": payload_col,
                                   "id_col": id_col,
                                   "thumb_size": thumb_size,
                                   "on_error": on_error},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=1)
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


# ---------------------------------------------------------------------------
# audio: REAL WAV decode (stdlib wave — no external codec needed)

def synth_wav(doc_id: int, *, sample_rate: int = 8000) -> bytes:
    """Deterministic mono 16-bit PCM WAV for doc ``doc_id``: an
    integer-arithmetic sawtooth (``((i·freq) mod 2000) − 1000``), so an
    SQL oracle can replicate every sample EXACTLY (no libm sin whose
    last-ulp differs across libraries).  Length and frequency vary with
    the doc id."""
    import io
    import wave

    n = 800 + (doc_id % 5) * 160
    freq = 7 + (doc_id % 8) * 13
    i = np.arange(n, dtype=np.int64)
    q = ((i * freq) % 2000 - 1000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(q.tobytes())
    return buf.getvalue()


class AudioDecode:
    """Actor-pool REAL audio decode + feature extraction: parses RIFF/PCM
    WAV payloads with the stdlib ``wave`` module (8/16-bit PCM), then
    vectorized features per clip — sample_rate, channels, n_samples,
    duration, RMS, zero-crossing rate, and an ``n_frames``-window RMS
    vector (the frame-sample op).  Codec-library formats (MP3/AAC/…)
    raise the honest unavailable-codec error; decoder state belongs in
    ``__init__`` (once per actor)."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 n_frames: int = 8, on_error: str = "raise"):
        if on_error not in ("raise", "skip"):
            raise ValueError(on_error)
        self.payload_col = payload_col
        self.id_col = id_col
        self.n_frames = n_frames
        self.on_error = on_error

    def _decode(self, p: bytes):
        import io
        import wave

        if p[:4] != b"RIFF":
            raise ValueError(
                "payload is not RIFF/WAV; MP3/AAC decode requires ffmpeg, "
                "unavailable in this container")
        with wave.open(io.BytesIO(p), "rb") as w:
            sr = w.getframerate()
            ch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width == 2:
            s = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif width == 1:  # 8-bit WAV is unsigned
            s = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM width {width}")
        if ch > 1:
            s = s.reshape(-1, ch).mean(axis=1)
        return sr, ch, s

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pisa_ray.utils import round_half_away

        ids, srs, chs, ns, durs, rmss, zcrs, frames = \
            [], [], [], [], [], [], [], []
        for doc_id, p in zip(batch[self.id_col].to_pylist(),
                             batch[self.payload_col].to_pylist()):
            try:
                sr, ch, s = self._decode(p or b"")
            except ValueError:
                if self.on_error == "skip":
                    continue
                raise
            n = len(s)
            ids.append(doc_id)
            srs.append(sr)
            chs.append(ch)
            ns.append(n)
            durs.append(float(round_half_away(n / sr, 6)))
            rmss.append(float(round_half_away(
                np.sqrt(np.mean(s * s)) if n else 0.0, 6)))
            zcrs.append(float(round_half_away(
                np.mean(s[:-1] * s[1:] < 0.0) if n > 1 else 0.0, 6)))
            if n and self.n_frames:
                bounds = np.linspace(0, n, self.n_frames + 1).astype(int)
                fr = [float(np.sqrt(np.mean(s[a:b] * s[a:b]))) if b > a
                      else 0.0 for a, b in zip(bounds[:-1], bounds[1:])]
            else:
                fr = [0.0] * self.n_frames
            frames.append(fr)
        return pa.table({
            "doc_id": pa.array(ids, type=batch[self.id_col].type),
            "sample_rate": pa.array(srs, type=pa.int32()),
            "channels": pa.array(chs, type=pa.int32()),
            "n_samples": pa.array(ns, type=pa.int64()),
            "duration_s": pa.array(durs, type=pa.float64()),
            "rms": pa.array(rmss, type=pa.float64()),
            "zcr": pa.array(zcrs, type=pa.float64()),
            "frame_rms": pa.array(frames, type=pa.list_(pa.float64())),
        })


def decode_audio(ds, *, payload_col: str = "payload", id_col: str = "doc_id",
                 n_frames: int = 8, concurrency: int = 2,
                 batch_size: int = 64, on_error: str = "raise"):
    """Actor-pool audio decode + features (small batches, wide rows) —
    the audio leg of the multimodal plumbing, REAL end to end for WAV."""
    return ds.map_batches(
        AudioDecode,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col,
                               "n_frames": n_frames, "on_error": on_error},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


# ---------------------------------------------------------------------------
# video: REAL Y4M (YUV4MPEG2) parse + frame sampling (no codec libs needed)

def synth_y4m(doc_id: int, *, width: int = 16, height: int = 16) -> bytes:
    """Deterministic YUV4MPEG2 clip for doc ``doc_id``: 4:2:0 planar
    frames whose luma is the integer pattern
    ``(x + width·y + 7·f + doc_id) mod 251`` — SQL-replicable exactly."""
    n_frames = 4 + (doc_id % 4)
    header = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()
    out = [header]
    x = np.arange(width, dtype=np.int64)
    y = np.arange(height, dtype=np.int64)
    base = (x[None, :] + width * y[:, None]).astype(np.int64)
    chroma = np.full((height // 2) * (width // 2), 128, dtype=np.uint8)
    for f in range(n_frames):
        luma = ((base + 7 * f + doc_id) % 251).astype(np.uint8)
        out.append(b"FRAME\n")
        out.append(luma.tobytes())
        out.append(chroma.tobytes())  # U
        out.append(chroma.tobytes())  # V
    return b"".join(out)


class VideoFrameSample:
    """Actor-pool REAL video frame-sampling stage for YUV4MPEG2 payloads
    (uncompressed 4:2:0 — parseable with numpy alone): parse the stream
    header, stride through the raw frames, keep every ``step``-th frame,
    and emit per-sampled-frame mean luma (the frame-sample +
    feature-extract op).  Codec containers (MP4/H.264/…) raise the
    honest unavailable-codec error."""

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id",
                 step: int = 2, on_error: str = "raise"):
        if on_error not in ("raise", "skip"):
            raise ValueError(on_error)
        self.payload_col = payload_col
        self.id_col = id_col
        self.step = step
        self.on_error = on_error

    def _parse(self, p: bytes):
        if not p.startswith(b"YUV4MPEG2"):
            raise ValueError(
                "payload is not YUV4MPEG2; MP4/H.264 decode requires "
                "ffmpeg, unavailable in this container")
        nl = p.index(b"\n")
        width = height = None
        for tok in p[:nl].split(b" ")[1:]:
            if tok[:1] == b"W":
                width = int(tok[1:])
            elif tok[:1] == b"H":
                height = int(tok[1:])
        if not width or not height:
            raise ValueError("Y4M header missing W/H")
        frame_bytes = width * height + 2 * ((width // 2) * (height // 2))
        pos, lumas = nl + 1, []
        marker = b"FRAME"
        while pos < len(p):
            fnl = p.index(b"\n", pos)
            if p[pos:pos + 5] != marker:
                raise ValueError("bad FRAME marker")
            luma = np.frombuffer(
                p, dtype=np.uint8, count=width * height,
                offset=fnl + 1).reshape(height, width)
            lumas.append(luma)
            pos = fnl + 1 + frame_bytes
        return width, height, lumas

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pisa_ray.utils import round_half_away

        ids, ws, hs, nf, fidx, luma_means = [], [], [], [], [], []
        for doc_id, p in zip(batch[self.id_col].to_pylist(),
                             batch[self.payload_col].to_pylist()):
            try:
                w, h, lumas = self._parse(p or b"")
            except ValueError:
                if self.on_error == "skip":
                    continue
                raise
            sampled = list(range(0, len(lumas), self.step))
            ids.append(doc_id)
            ws.append(w)
            hs.append(h)
            nf.append(len(lumas))
            fidx.append(sampled)
            luma_means.append([
                float(round_half_away(float(lumas[i].mean()), 6))
                for i in sampled])
        return pa.table({
            "doc_id": pa.array(ids, type=batch[self.id_col].type),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "n_frames": pa.array(nf, type=pa.int64()),
            "frame_idx": pa.array(fidx, type=pa.list_(pa.int32())),
            "frame_mean_luma": pa.array(luma_means,
                                        type=pa.list_(pa.float64())),
        })


def sample_video_frames(ds, *, payload_col: str = "payload",
                        id_col: str = "doc_id", step: int = 2,
                        concurrency: int = 2, batch_size: int = 32,
                        on_error: str = "raise"):
    """Actor-pool video frame sampling (very small batches — video rows
    are the widest) — the video leg of the multimodal plumbing, REAL end
    to end for Y4M."""
    return ds.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col,
                               "step": step, "on_error": on_error},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
