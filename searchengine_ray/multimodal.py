"""Multimodal column stages: image / audio / video payloads as opaque
``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this environment, so
two deterministic backends stand in behind ``DecodeBackend``:

* ``FakeDecodeBackend`` — payload-hash-seeded random arrays (plumbing tests).
* ``ByteDecodeBackend`` — pixels/PCM are pure integer functions of the
  payload bytes (tile the payload over the pixel/sample grid).  Because the
  decode rule is byte-exact and the feature stages emit exact integer
  aggregates, the whole pipeline is verifiable against a SQL oracle that
  re-derives the same sums with ``ascii(substr(...))`` + ``range()`` — this
  is what promotes the mm_* gates from rows-only to hash-checked.

The Ray-side plumbing (schema, batch sizing for large payloads, actor-pool
signatures, output layout) is real; swapping in a real backend means
implementing three methods; nothing else changes.  The feature stages are
backend-agnostic and integer-domain by design: real decoders produce uint8
RGB pixels and int16 PCM, for which channel sums / energy / mean-crossing
counts are exact integers too.

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

# ByteDecodeBackend constants (mirrored literally in the SQL oracles).
AUDIO_SAMPLES_PER_MS = 4
VIDEO_FRAME_W = 16
VIDEO_FRAME_H = 16
VIDEO_FRAME_STRIDE = 7919  # frame f starts at byte offset f*stride (prime)


class DecodeBackend:
    """Decoder interface. A real deployment subclasses this with PIL /
    libav implementations; the pipeline code is backend-agnostic.

    Contracts: ``decode_image`` -> uint8 array (h, w, 3);
    ``decode_audio`` -> integer PCM 1-D array (real audio is int16);
    ``sample_video_frames`` -> list of n uint8 frames."""

    def decode_image(self, payload: bytes, w: int, h: int) -> np.ndarray:
        raise NotImplementedError(
            "real image decoding needs PIL/opencv (not in this environment); "
            "use ByteDecodeBackend / FakeDecodeBackend for plumbing tests"
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
        return rng.integers(-32768, 32768, size=n, dtype=np.int16)

    def sample_video_frames(self, payload: bytes, n: int) -> list[np.ndarray]:
        return [
            self.decode_image(payload + bytes([i]), 32, 32) for i in range(n)
        ]


class ByteDecodeBackend(DecodeBackend):
    """SQL-derivable deterministic decode: tile the payload bytes over the
    pixel / sample grid.  Every output element is
    ``payload[(pos + offset) % len(payload)]`` so a DuckDB oracle can
    re-derive the downstream integer features with
    ``ascii(substr(text, pos % L + 1, 1))`` over ``range()`` laterals
    (payloads in the gates are the UTF-8 bytes of ``documents.text``,
    which is pure ASCII — byte == code point)."""

    @staticmethod
    def _bytes(payload: bytes) -> np.ndarray:
        if not len(payload):
            raise ValueError(
                "ByteDecodeBackend: empty payload (a zero-length media "
                "blob has no bytes to tile)"
            )
        return np.frombuffer(payload, dtype=np.uint8)

    def decode_image(self, payload: bytes, w: int, h: int) -> np.ndarray:
        b = self._bytes(payload)
        idx = np.arange(3 * w * h, dtype=np.int64) % len(b)
        return b[idx].reshape(h, w, 3)

    def decode_audio(self, payload: bytes, duration_ms: int) -> np.ndarray:
        b = self._bytes(payload)
        n = max(1, duration_ms * AUDIO_SAMPLES_PER_MS)
        idx = np.arange(n, dtype=np.int64) % len(b)
        # 8-bit unsigned PCM convention: recenter at 128.
        return b[idx].astype(np.int64) - 128

    def sample_video_frames(self, payload: bytes, n: int) -> list[np.ndarray]:
        b = self._bytes(payload)
        npix = 3 * VIDEO_FRAME_W * VIDEO_FRAME_H
        pos = np.arange(npix, dtype=np.int64)
        return [
            b[(pos + f * VIDEO_FRAME_STRIDE) % len(b)].reshape(
                VIDEO_FRAME_H, VIDEO_FRAME_W, 3
            )
            for f in range(n)
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
    environment-independent (gate pipelines pass ByteDecodeBackend)."""
    try:
        return PillowDecodeBackend()
    except ImportError:
        return FakeDecodeBackend()


class ImageFeatures:
    """Actor stage: decode images, emit exact per-channel byte sums.

    Integer-domain on purpose: for any uint8 RGB decode (real PIL included)
    ``sum_r/g/b`` and ``n_pix`` are exact, so the stage is hash-verifiable
    end-to-end with ByteDecodeBackend. Backend loads ONCE per actor."""

    def __init__(self, backend: DecodeBackend | None = None):
        self.backend = backend or FakeDecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        sums = []
        for payload, w, h in zip(
            batch.column("payload").to_pylist(),
            batch.column("meta_width").to_pylist(),
            batch.column("meta_height").to_pylist(),
        ):
            img = self.backend.decode_image(payload, w, h)
            sums.append(img.reshape(-1, 3).sum(axis=0, dtype=np.int64))
        s = np.asarray(sums, dtype=np.int64).reshape(-1, 3)
        npix = (
            batch.column("meta_width").to_numpy().astype(np.int64)
            * batch.column("meta_height").to_numpy().astype(np.int64)
        )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "sum_r": pa.array(s[:, 0], type=pa.int64()),
                "sum_g": pa.array(s[:, 1], type=pa.int64()),
                "sum_b": pa.array(s[:, 2], type=pa.int64()),
                "n_pix": pa.array(npix, type=pa.int64()),
            }
        )


class ImageEmbedding:
    """Actor stage: decode + produce a tiny grayscale embedding
    (``list<float32>``) plus float mean RGB — the float-feature demo kept
    alongside the integer-gated ImageFeatures stage."""

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
    """Actor stage: decode integer PCM, emit exact energy (sum of squared
    samples), mean-crossing count, and sample count.

    ``mean_crossings`` counts sign changes of ``pcm[i] - mean(pcm)`` using
    the cross-multiplied integer compare ``pcm[i]*n >= sum(pcm)`` — exact
    for any integer PCM (real int16 audio included), so the stage is
    hash-verifiable with ByteDecodeBackend."""

    def __init__(self, backend: DecodeBackend | None = None):
        self.backend = backend or FakeDecodeBackend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        energy, crossings, nsamp = [], [], []
        for payload, dur in zip(
            batch.column("payload").to_pylist(),
            batch.column("meta_duration_ms").to_pylist(),
        ):
            pcm = self.backend.decode_audio(payload, dur).astype(np.int64)
            n = len(pcm)
            total = int(pcm.sum())
            above = pcm * n >= total  # pcm[i] >= mean, exact integers
            energy.append(int((pcm * pcm).sum()))
            crossings.append(int(np.count_nonzero(above[1:] != above[:-1])))
            nsamp.append(n)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "energy": pa.array(energy, type=pa.int64()),
                "mean_crossings": pa.array(crossings, type=pa.int64()),
                "n_samples": pa.array(nsamp, type=pa.int64()),
            }
        )


class VideoFrameSample:
    """Actor stage: sample n frames per video, explode to one row per frame
    with the exact integer pixel-byte sum per frame."""

    def __init__(self, backend: DecodeBackend | None = None, n_frames: int = 3):
        self.backend = backend or FakeDecodeBackend()
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, sums = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            for i, frame in enumerate(
                self.backend.sample_video_frames(payload, self.n_frames)
            ):
                ids.append(mid)
                frame_idx.append(i)
                sums.append(int(frame.sum(dtype=np.int64)))
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame": pa.array(frame_idx, type=pa.int32()),
                "intensity_sum": pa.array(sums, type=pa.int64()),
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


def image_pipeline(media, concurrency: int = 2, backend=None):
    """Dataset of MEDIA_SCHEMA -> exact integer image features via an actor
    pool (small batches: payloads are the block-size driver)."""
    return _only_kind(media, "image").map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
        num_cpus=1,
    )


def image_embedding_pipeline(media, concurrency: int = 2, backend=None):
    """Dataset of MEDIA_SCHEMA -> float mean-RGB + list<float32> embedding
    (the float-output demo path; not hash-gated)."""
    return _only_kind(media, "image").map_batches(
        ImageEmbedding,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
        num_cpus=1,
    )


def audio_pipeline(media, concurrency: int = 2, backend=None):
    """Dataset of MEDIA_SCHEMA -> exact integer audio features via an actor
    pool."""
    return _only_kind(media, "audio").map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
        num_cpus=1,
    )


def video_pipeline(media, concurrency: int = 2, n_frames: int = 3, backend=None):
    """Dataset of MEDIA_SCHEMA -> sampled-frame integer features via an
    actor pool (one output row per sampled frame)."""
    return _only_kind(media, "video").map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"n_frames": n_frames, "backend": backend},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_dataset(n: int = 64, seed: int = 5, num_blocks: int = 4):
    """Deterministic synthetic media Dataset (plumbing tests — no real
    image/audio bytes exist in this environment)."""
    import ray.data

    return ray.data.from_arrow(synth_media_table(n, seed)).repartition(
        num_blocks
    )


def media_from_documents(sf_dir: str):
    """Derive a MEDIA_SCHEMA Dataset deterministically from the documents
    table: payload = UTF-8 bytes of ``text``, kind cycles by ``doc_id % 3``,
    metadata is an integer function of ``doc_id``.  This is the gate input —
    a DuckDB oracle can re-derive every payload byte from the same parquet,
    which (with ByteDecodeBackend) makes the mm_* pipelines hash-checkable.

    Derivation mirrored literally in the SQL oracles:
      kind            = ['image','audio','video'][doc_id % 3]
      meta_width      = 16 + (doc_id * 7) % 48
      meta_height     = 16 + (doc_id * 5) % 48
      meta_duration_ms = 100 + (doc_id * 13) % 900
    """
    import pyarrow.compute as pc
    import ray.data

    kinds = pa.array(["image", "audio", "video"], type=pa.string())

    def to_media(t: pa.Table) -> pa.Table:
        # loud oracle preconditions (the _ann_sq8_gate pattern): the SQL
        # side indexes CHARACTERS via ascii(substr(text, ...)) while this
        # side tiles BYTES, identical only for non-empty pure-ASCII text —
        # fail with a clear message instead of an opaque hash mismatch
        # (or a remainder-by-zero) on a corpus that breaks the premise.
        import pyarrow.compute as _pc

        if not t.num_rows:
            return pa.table(
                {f.name: pa.array([], type=f.type) for f in MEDIA_SCHEMA}
            )
        nbytes = _pc.binary_length(_pc.cast(t.column("text"), pa.binary()))
        nchars = _pc.utf8_length(t.column("text"))
        if not _pc.all(_pc.greater(nbytes, 0)).as_py():
            raise ValueError(
                "media_from_documents: empty documents.text row — media "
                "payloads must be non-empty"
            )
        if not _pc.all(_pc.equal(nbytes, nchars)).as_py():
            raise ValueError(
                "media_from_documents: non-ASCII documents.text — the "
                "byte-tiling decode and the ascii(substr()) oracles only "
                "agree on pure-ASCII corpora"
            )
        doc_id = t.column("doc_id").combine_chunks()
        ids = doc_id.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "media_id": doc_id,
                "kind": pc.take(kinds, pa.array(ids % 3)),
                "payload": pc.cast(t.column("text"), pa.binary()),
                "meta_width": pa.array(16 + (ids * 7) % 48, type=pa.int32()),
                "meta_height": pa.array(16 + (ids * 5) % 48, type=pa.int32()),
                "meta_duration_ms": pa.array(
                    100 + (ids * 13) % 900, type=pa.int32()
                ),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(to_media, batch_format="pyarrow")
