"""Multimodal column stages: image / audio / video payloads as opaque
``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this environment, so
the decode kernels are deterministic fakes behind ``DecodeBackend`` — the
Ray-side plumbing (schema, batch sizing for large payloads, actor-pool
signatures, output layout) is real and tested. Swapping in a real backend
means implementing three methods; nothing else changes.

Scale notes: binary payloads dominate block size — callers should lower
``batch_size`` (payloads x batch x concurrency must fit worker heaps) and
keep stages in ``batch_format="pyarrow"`` (binary columns don't round-trip
pandas cleanly).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)


class DecodeBackend:
    """Deterministic fake decoders. A real deployment subclasses this with
    PIL / libav implementations; the pipeline code is backend-agnostic."""

    def decode_image(self, payload: bytes, w: int, h: int) -> np.ndarray:
        raise NotImplementedError(
            "real image decoding needs PIL/opencv (not in this environment); "
            "use FakeDecodeBackend for plumbing tests"
        )

    def decode_audio(self, payload: bytes, duration_ms: int) -> np.ndarray:
        raise NotImplementedError("real audio decoding needs ffmpeg/torchaudio")

    def sample_video_frames(self, payload: bytes, n: int) -> list[np.ndarray]:
        raise NotImplementedError("real video decoding needs ffmpeg")


class FakeDecodeBackend(DecodeBackend):
    """Payload-hash-seeded deterministic arrays standing in for pixels/PCM."""

    def decode_image(self, payload: bytes, w: int, h: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def decode_audio(self, payload: bytes, duration_ms: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        n = max(1, duration_ms * 16)  # 16 kHz fake PCM
        return rng.standard_normal(n).astype(np.float32)

    def sample_video_frames(self, payload: bytes, n: int) -> list[np.ndarray]:
        return [
            self.decode_image(payload + bytes([i]), 32, 32) for i in range(n)
        ]


class PillowDecodeBackend(DecodeBackend):
    """Real image decode via Pillow WHEN INSTALLED (import checked at
    construction, the import-try wiring for environments that have it;
    this container does not ship PIL, so tests cover only the gating).
    Audio/video still raise — they need ffmpeg-class dependencies."""

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "PillowDecodeBackend requires Pillow; install it or use "
                "FakeDecodeBackend / the default_backend() fallback"
            ) from e
        from PIL import Image

        self._Image = Image

    def decode_image(self, payload: bytes, w: int, h: int) -> np.ndarray:
        import io

        img = self._Image.open(io.BytesIO(payload)).convert("RGB")
        if img.size != (w, h):
            img = img.resize((w, h))
        return np.asarray(img, dtype=np.uint8)


def default_backend() -> DecodeBackend:
    """Pillow-backed image decode when the library exists, else the
    deterministic fake — explicit opt-in keeps the mm_* gate outputs
    environment-independent (pipelines default to FakeDecodeBackend)."""
    try:
        return PillowDecodeBackend()
    except ImportError:
        return FakeDecodeBackend()


class ImageFeatures:
    """Actor stage: decode + feature-extract images (mean RGB, a tiny
    grayscale 'embedding'). Backend loads ONCE per actor in __init__."""

    def __init__(self, backend: DecodeBackend | None = None, resize: int = 8):
        self.backend = backend or FakeDecodeBackend()
        self.resize = resize

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, means = [], []
        for payload, w, h in zip(
            batch.column("payload").to_pylist(),
            batch.column("meta_width").to_pylist(),
            batch.column("meta_height").to_pylist(),
        ):
            img = self.backend.decode_image(payload, w, h)
            gray = img.mean(axis=2)
            # nearest-neighbor resize to (resize, resize), flattened
            ys = np.linspace(0, gray.shape[0] - 1, self.resize).astype(int)
            xs = np.linspace(0, gray.shape[1] - 1, self.resize).astype(int)
            feats.append((gray[np.ix_(ys, xs)].ravel() / 255.0).astype(np.float32))
            means.append(img.reshape(-1, 3).mean(axis=0))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "mean_r": pa.array([m[0] for m in means], type=pa.float32()),
                "mean_g": pa.array([m[1] for m in means], type=pa.float32()),
                "mean_b": pa.array([m[2] for m in means], type=pa.float32()),
                "embedding": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


class AudioFeatures:
    """Actor stage: decode audio, emit RMS energy + zero-crossing rate."""

    def __init__(self, backend: DecodeBackend | None = None):
        self.backend = backend or FakeDecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, zcr = [], []
        for payload, dur in zip(
            batch.column("payload").to_pylist(),
            batch.column("meta_duration_ms").to_pylist(),
        ):
            pcm = self.backend.decode_audio(payload, dur)
            rms.append(float(np.sqrt(np.mean(pcm**2))))
            zcr.append(float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "rms": pa.array(rms, type=pa.float64()),
                "zcr": pa.array(zcr, type=pa.float64()),
            }
        )


class VideoFrameSample:
    """Actor stage: sample n frames per video, explode to one row per frame."""

    def __init__(self, backend: DecodeBackend | None = None, n_frames: int = 3):
        self.backend = backend or FakeDecodeBackend()
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, means = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            for i, frame in enumerate(
                self.backend.sample_video_frames(payload, self.n_frames)
            ):
                ids.append(mid)
                frame_idx.append(i)
                means.append(float(frame.mean()))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame": pa.array(frame_idx, type=pa.int32()),
                "mean_intensity": pa.array(means, type=pa.float64()),
            }
        )


def synth_media_table(n: int = 32, seed: int = 5) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        rows["media_id"].append(i)
        rows["kind"].append(kinds[i % 3])
        rows["payload"].append(rng.bytes(64 + int(rng.integers(64))))
        rows["meta_width"].append(int(rng.integers(16, 64)))
        rows["meta_height"].append(int(rng.integers(16, 64)))
        rows["meta_duration_ms"].append(int(rng.integers(100, 1000)))
    return pa.table(
        {f.name: pa.array(rows[f.name], type=f.type) for f in MEDIA_SCHEMA}
    )


def _only_kind(media, kind: str):
    import pyarrow.compute as pc

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("kind"), kind))

    return media.map_batches(flt, batch_format="pyarrow")


def image_pipeline(media, concurrency: int = 2):
    """Dataset of MEDIA_SCHEMA -> image features via an actor pool (small
    batches: payloads are the block-size driver)."""
    return _only_kind(media, "image").map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
        num_cpus=1,
    )


def audio_pipeline(media, concurrency: int = 2):
    """Dataset of MEDIA_SCHEMA -> audio features via an actor pool."""
    return _only_kind(media, "audio").map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
        num_cpus=1,
    )


def video_pipeline(media, concurrency: int = 2, n_frames: int = 3):
    """Dataset of MEDIA_SCHEMA -> sampled-frame features via an actor pool
    (one output row per sampled frame)."""
    return _only_kind(media, "video").map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_dataset(n: int = 64, seed: int = 5, num_blocks: int = 4):
    """Deterministic synthetic media Dataset (the queries() entry point —
    no real image/audio bytes exist in this environment)."""
    import ray.data

    return ray.data.from_arrow(synth_media_table(n, seed)).repartition(
        num_blocks
    )
