"""Multimodal (image/audio/video) columns as opaque binary + metadata.

Training-data extension: payloads are ``binary`` columns with typed
sidecar metadata; decode / feature-extract / resize / frame-sample run
as ACTOR-POOL ``map_batches`` stages (a callable class — decoder init
happens once per actor in ``__init__``, work per batch in
``__call__``).

The REAL decode path handles netpbm images (P6 ppm / P5 pgm) with a
pure-numpy parser + vectorized nearest-neighbor resize, and baseline
PNG (8-bit gray/RGB/palette/alpha, non-interlaced — stdlib zlib
inflate + numpy scanline unfiltering) — genuine end-to-end decodes of
an uncompressed AND a compressed format, exercised by tests and the
``multimodal_embeddings`` gate, no external library needed. PIL stays
the fast path when installed (jpeg + exotic PNGs); video frame
sampling still stubs ffmpeg honestly; ``fake=True`` remains the
deterministic stand-in for bulk plumbing tests.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa


# ---------------------------------------------------------------------------
# Real netpbm decode kernels (pure numpy — no external image library)
# ---------------------------------------------------------------------------

def decode_netpbm(payload: bytes) -> np.ndarray:
    """Decode a binary netpbm image (P6 rgb / P5 gray) -> (h, w, 3)
    uint8. Raises ValueError on anything else."""
    if len(payload) < 2 or payload[:1] != b"P" or payload[1:2] not in b"56":
        raise ValueError("not a binary netpbm (P5/P6) payload")
    rgb = payload[1:2] == b"6"
    # header: magic, width, height, maxval — whitespace separated,
    # '#' comments allowed through the header
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if rgb else 1
    need = w * h * ch
    raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    img = raw.reshape(h, w, ch)
    if maxval != 255:
        # low-depth netpbm (maxval < 255) stores samples in 0..maxval;
        # rescale to full 8-bit intensity (round-2 review finding)
        img = (img.astype(np.uint16) * 255 // maxval).astype(np.uint8)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (h, w, c) -> (height, width, c)."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(height) * h / height).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(width) * w / width).astype(np.int64), w - 1)
    return img[yi[:, None], xi[None, :]]


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 ppm bytes (fixture/sink helper)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(img, dtype=np.uint8).tobytes()

# ---------------------------------------------------------------------------
# Baseline PNG codec (stdlib zlib + numpy — no external image library).
# Public-spec implementation (RFC 2083 / W3C PNG): chunk walk, inflate,
# per-scanline unfilter (None/Sub/Up/Average/Paeth), color normalize.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth_predict(left: np.ndarray, up: np.ndarray,
                   upleft: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over one pixel's byte lanes."""
    p = left + up - upleft
    pa_, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
    return np.where((pa_ <= pb) & (pa_ <= pc), left,
                    np.where(pb <= pc, up, upleft))


def _unfilter_scanlines(raw: np.ndarray, h: int, stride: int,
                        bpp: int) -> np.ndarray:
    """(h, 1 + stride) filtered bytes -> (h, stride) reconstructed.
    Sub/Up are whole-row numpy ops (Sub = per-lane cumsum mod 256);
    Average/Paeth walk pixels with the bpp lanes vectorized."""
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    zero = np.zeros(bpp, np.int32)
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: rec[x] = line[x] + rec[x - bpp]
            rec = (np.cumsum(line.reshape(-1, bpp), axis=0,
                             dtype=np.int64) % 256).reshape(-1) \
                .astype(np.int32)
        elif f == 2:  # Up
            rec = (line + prev) & 255
        elif f in (3, 4):  # Average / Paeth: left-dependent walk
            rec = np.empty(stride, np.int32)
            left = zero
            for x0 in range(0, stride, bpp):
                sl = slice(x0, x0 + bpp)
                up = prev[sl]
                ul = prev[x0 - bpp:x0] if x0 else zero
                if f == 3:
                    val = (line[sl] + ((left + up) >> 1)) & 255
                else:
                    val = (line[sl] + _paeth_predict(left, up, ul)) & 255
                rec[sl] = val
                left = val
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a baseline PNG -> (h, w, 3) uint8: 8-bit depth, color
    types 0/2/3/4/6, non-interlaced, CRC-verified chunk walk. Alpha is
    dropped (PIL ``convert("RGB")`` on opaque images agrees). Raises
    ValueError on anything outside the baseline subset."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        crc = payload[pos + 8 + length:pos + 12 + length]
        if len(data) != length or len(crc) != 4:
            raise ValueError("truncated PNG chunk")
        if zlib.crc32(ctype + data) != struct.unpack(">I", crc)[0]:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ct, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 \
            or ct not in _PNG_CHANNELS:
        raise ValueError(
            f"beyond baseline PNG subset (depth={depth}, color={ct}, "
            f"interlace={interlace}); install Pillow for this file")
    ch = _PNG_CHANNELS[ct]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("PNG pixel data size mismatch")
    img = _unfilter_scanlines(raw.reshape(h, 1 + stride), h, stride, ch) \
        .reshape(h, w, ch)
    if ct == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[img[:, :, 0]]
    if ct in (0, 4):  # gray (+alpha): replicate, drop alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(img[:, :, :3])  # RGB / RGBA


def _filter_scanline(f: int, line: np.ndarray, prev: np.ndarray,
                     bpp: int) -> np.ndarray:
    """Apply PNG filter ``f`` to one reconstructed scanline (encoder
    side — the exact inverse of ``_unfilter_scanlines`` row logic)."""
    line = line.astype(np.int32)
    prev = prev.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
    upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
    if f == 0:
        out = line
    elif f == 1:
        out = line - left
    elif f == 2:
        out = line - prev
    elif f == 3:
        out = line - ((left + prev) >> 1)
    elif f == 4:
        out = line - _paeth_predict(left, prev, upleft)
    else:
        raise ValueError(f"unknown PNG filter type {f}")
    return (out & 255).astype(np.uint8)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (8-bit RGB, non-interlaced), every
    scanline filtered with ``filter_type`` (0–4; non-zero choices let
    tests drive each decoder unfilter path)."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    flat = img.reshape(h, w * 3)
    prev = np.zeros(w * 3, np.uint8)
    rows = []
    for y in range(h):
        rows.append(bytes([filter_type]))
        rows.append(_filter_scanline(filter_type, flat[y], prev, 3)
                    .tobytes())
        prev = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return struct.pack(">I", len(data)) + ctype + data + \
            struct.pack(">I", zlib.crc32(ctype + data))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return PNG_SIG + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(b"".join(rows))) + \
        chunk(b"IEND", b"")


# Bound batches by PAYLOAD BYTES, not rows: a 256 KB-avg image column
# at batch_size=4096 is a 1 GB heap spike per task. Large binary
# columns want small row batches (SURVEY.md §7 hard part (d)).
DEFAULT_MEDIA_BATCH_ROWS = 64

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


@dataclass
class DecodeConfig:
    target_width: int = 224
    target_height: int = 224
    frames_per_clip: int = 8
    fake: bool = True  # deterministic fake instead of a real decoder


class ImageDecodeResize:
    """Actor-pool stage: binary image -> fixed-size float tensor.

    Use as ``ds.map_batches(ImageDecodeResize, fn_constructor_kwargs=
    {"cfg": cfg}, concurrency=N, batch_size=DEFAULT_MEDIA_BATCH_ROWS,
    num_cpus=1, batch_format="pyarrow")``.
    """

    def __init__(self, cfg: DecodeConfig | None = None):
        self.cfg = cfg or DecodeConfig()
        # once-per-actor setup: probe for an optional PIL install (the
        # jpeg/png path); the netpbm path needs nothing
        self._pil = None
        if not self.cfg.fake:
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError:
                self._pil = None

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        """Deterministic stand-in: tensor seeded by payload bytes so
        the pipeline output is reproducible and testable."""
        h = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
        rng = np.random.default_rng(int(h) % (2**32))
        return rng.random((self.cfg.target_height, self.cfg.target_width, 3),
                          dtype=np.float32)

    def _real_decode(self, payload: bytes) -> np.ndarray:
        """REAL decode: netpbm via the pure-numpy kernel, baseline PNG
        via the stdlib-zlib codec (PIL preferred when installed — it
        also covers interlaced/16-bit PNGs); remaining formats via PIL
        when installed, else an honest NotImplementedError."""
        if payload[:1] == b"P" and payload[1:2] in b"56":
            img = decode_netpbm(payload)
        elif payload[:8] == PNG_SIG:
            if self._pil is not None:
                img = self._pil_decode(payload)
            else:
                img = decode_png(payload)
        elif self._pil is not None:
            img = self._pil_decode(payload)
        else:
            raise NotImplementedError(
                "netpbm (P5/P6) and baseline PNG decode without Pillow; "
                "install an image library for jpeg/interlaced-png or "
                "use DecodeConfig(fake=True)")
        img = resize_nearest(img, self.cfg.target_width,
                             self.cfg.target_height)
        return (img.astype(np.float32) / np.float32(255.0))

    def _pil_decode(self, payload: bytes) -> np.ndarray:
        """The PIL fast path — one seam so tests can drive the exact
        call/convert plumbing with a stub Image module even where
        Pillow is not installed."""
        import io

        return np.asarray(
            self._pil.open(io.BytesIO(payload)).convert("RGB"))

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        decode = self._fake_decode if self.cfg.fake else self._real_decode
        payloads = batch.column("payload").to_pylist()
        tensors = [decode(p or b"") for p in payloads]
        return pd.DataFrame({
            "media_id": batch.column("media_id").to_pylist(),
            "tensor": [t.reshape(-1) for t in tensors],  # flat float32
            "tensor_shape": [list(t.shape) for t in tensors],
        })


class ImageFeatureExtract:
    """Actor-pool stage: decoded tensor -> feature vector (mean-pool
    fake; a real model load belongs in __init__, once per actor)."""

    def __init__(self, dim: int = 64):
        self.dim = dim
        # real path: self.model = load_model(...)  (once per actor)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for t in batch["tensor"]:
            v = np.asarray(t, dtype=np.float32)
            # deterministic pooled "embedding"
            chunks = np.array_split(v, self.dim)
            feats.append(np.array([c.mean() for c in chunks],
                                  dtype=np.float32))
        return pd.DataFrame({"media_id": batch["media_id"],
                             "embedding": feats})


class VideoFrameSample:
    """Actor-pool stage: video binary -> sampled frame payloads
    (deterministic byte-slicing fake; real path stubs ffmpeg)."""

    def __init__(self, cfg: DecodeConfig | None = None):
        self.cfg = cfg or DecodeConfig()
        if not self.cfg.fake:
            raise NotImplementedError(
                "real frame sampling requires ffmpeg; use fake=True")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        ids, frames, fnos = [], [], []
        n = self.cfg.frames_per_clip
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            data = payload or b""
            step = max(1, len(data) // n)
            for f in range(n):
                ids.append(mid)
                fnos.append(f)
                frames.append(data[f * step:(f + 1) * step][:4096])
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_no": pa.array(fnos, pa.int32()),
                         "frame": pa.array(frames, pa.large_binary())})


def decode_pipeline(ds, concurrency: int = 4,
                    cfg: DecodeConfig | None = None):
    """media Dataset -> embeddings Dataset via the two actor-pool
    stages, batch size bounded for large payloads."""
    decoded = ds.map_batches(
        ImageDecodeResize, fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow", batch_size=DEFAULT_MEDIA_BATCH_ROWS,
        concurrency=concurrency, num_cpus=1)
    return decoded.map_batches(
        ImageFeatureExtract, batch_format="pandas",
        batch_size=DEFAULT_MEDIA_BATCH_ROWS, concurrency=concurrency,
        num_cpus=1)


def fake_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media fixture for tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(int(rng.integers(1024, 65536))) for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array(["image/fake"] * n),
        "width": pa.array(np.full(n, 640, np.int32)),
        "height": pa.array(np.full(n, 480, np.int32)),
        "duration_ms": pa.array(np.zeros(n, np.int32)),
    })


def ppm_media_table(n: int = 16, seed: int = 42) -> pa.Table:
    """Media fixture whose payloads are REAL binary ppm images
    (deterministic gradients) — drives the genuine decode path."""
    rng = np.random.default_rng(seed)
    ids, payloads, ws, hs = [], [], [], []
    for i in range(n):
        w = int(rng.integers(16, 128))
        h = int(rng.integers(16, 128))
        y, x = np.mgrid[0:h, 0:w]
        img = np.stack([(x * 255 // max(1, w - 1)),
                        (y * 255 // max(1, h - 1)),
                        np.full((h, w), i * 255 // max(1, n - 1))],
                       axis=2).astype(np.uint8)
        ids.append(i)
        payloads.append(encode_ppm(img))
        ws.append(w)
        hs.append(h)
    return pa.table({
        "media_id": pa.array(np.asarray(ids, np.int64)),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array(["image/x-portable-pixmap"] * n),
        "width": pa.array(np.asarray(ws, np.int32)),
        "height": pa.array(np.asarray(hs, np.int32)),
        "duration_ms": pa.array(np.zeros(n, np.int32)),
    })


def png_media_table(n: int = 16, seed: int = 42,
                    filter_type: int = 0) -> pa.Table:
    """The ``ppm_media_table`` images re-encoded as real PNGs (same
    deterministic pixels, DEFLATE-compressed, chosen scanline filter)
    — drives the compressed-format decode path."""
    ppm = ppm_media_table(n, seed)
    payloads = [encode_png(decode_netpbm(p), filter_type)
                for p in ppm.column("payload").to_pylist()]
    return ppm.set_column(
        1, "payload", pa.array(payloads, pa.large_binary())) \
        .set_column(2, "mime", pa.array(["image/png"] * n))
