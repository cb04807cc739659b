"""Multimodal (image/audio/video) columns as opaque binary + metadata.

Training-data extension: payloads are ``binary`` columns with typed
sidecar metadata; decode / feature-extract / resize / frame-sample run
as ACTOR-POOL ``map_batches`` stages (a callable class — decoder init
happens once per actor in ``__init__``, work per batch in
``__call__``). The decode kernels themselves are STUBBED behind
``NotImplementedError`` / a deterministic fake because the image/audio
libraries are not in this container — the Ray-side plumbing (schema,
batch sizing for large payloads, actor signature, output layout) is
real and tested.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

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
        if self.cfg.fake:
            self._decoder = None  # deterministic fake path
        else:
            # real path requires PIL/libjpeg — not in this container
            raise NotImplementedError(
                "real image decoding requires Pillow; run with "
                "DecodeConfig(fake=True) or install an image library")

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        """Deterministic stand-in: tensor seeded by payload bytes so
        the pipeline output is reproducible and testable."""
        h = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
        rng = np.random.default_rng(int(h) % (2**32))
        return rng.random((self.cfg.target_height, self.cfg.target_width, 3),
                          dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        payloads = batch.column("payload").to_pylist()
        tensors = [self._fake_decode(p or b"") for p in payloads]
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
