"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Engine convention for images/audio/video at 100 TB: the payload is a
``binary`` column (never decoded in SQL), metadata travels in typed columns,
and decode/feature-extraction runs as Arrow-batched ``mapInPandas`` stages —
the Spark-native analogue of the reference's Arrow flush boundary
(connector.py:232-237), but on the read/transform path the reference never
had.

This container ships no codec libraries (PIL/cv2/librosa), so the decoders
STUB the actual pixel/sample decode behind an import-try with a
deterministic fake (documented below); the Spark-side plumbing — schemas,
batch iteration, partition sizing — is real and tested. Swap ``_fake_*``
for the library call in production.

Scale notes:
- decode is CPU-heavy: repartition so batches are ~10-100 MB of payload
  (``spark.sql.files.maxPartitionBytes`` on read; explicit repartition
  after filters), and select ONLY the payload + key columns into the
  mapInPandas stage — every extra column rides the Arrow channel twice.
- never collect payloads; metadata-only projections must prune the binary
  column (columnar formats make that free).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

#: schema of decode_image_meta output
IMAGE_META_SCHEMA = (
    "key BIGINT, byte_len BIGINT, width BIGINT, height BIGINT, "
    "channels BIGINT, sha256 STRING"
)

#: schema of sample_frames output (one row per sampled frame)
FRAME_SCHEMA = (
    "key BIGINT, frame_idx BIGINT, offset BIGINT, frame_bytes BIGINT, "
    "frame_sha256 STRING"
)


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for image header parsing: dimensions derived
    from the content digest — stable across runs/engines/partitionings."""
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 1024, 16 + d[1] % 1024, (1, 3, 4)[d[2] % 3]


def _nullable_key(key):
    """NULL-keyed rows must flow THROUGH the kernel as NULL, never crash
    the task: a nullable int64 key column reaches pandas as float64 with
    NaN, and ``int(NaN)`` raised — i.e. one NULL-keyed asset in a 100 TB
    table aborted the whole decode job (found by the r06 adversarial
    sweep). SQL semantics downstream (group-by, joins) handle the NULL."""
    return None if pd.isna(key) else int(key)


def decode_image_meta(
    df: DataFrame, payload_col: str, key_col: str, force_stub: bool = False
) -> DataFrame:
    """binary payload → (dims, channels, digest) metadata rows.

    Real decode (PIL) when available; deterministic fake otherwise. One
    Arrow batch in, one out — constant memory per task regardless of table
    size.
    """

    def _decode(batches):
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if _HAS_PIL and not force_stub:  # pragma: no cover
                    import io

                    with Image.open(io.BytesIO(data)) as im:
                        w, h = im.size
                        c = len(im.getbands())
                else:
                    w, h, c = _fake_dims(data)
                rows.append(
                    {
                        "key": _nullable_key(key),
                        "byte_len": len(data),
                        "width": w,
                        "height": h,
                        "channels": c,
                        "sha256": hashlib.sha256(data).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=["key", "byte_len", "width", "height", "channels", "sha256"])

    return df.select(key_col, payload_col).mapInPandas(_decode, schema=IMAGE_META_SCHEMA)


#: schema of resize_images output
RESIZED_SCHEMA = "key BIGINT, resized BINARY, out_width BIGINT, out_height BIGINT"


def resize_images(
    df: DataFrame, payload_col: str, key_col: str, width: int = 224, height: int = 224
) -> DataFrame:
    """binary payload → resized binary payload (binary-in/binary-out stage).

    Real path: PIL ``Image.resize`` when available; stub emits a
    deterministic content-derived surrogate of the right conceptual shape
    (``width·height·channels`` bytes, seeded by the source digest) so
    downstream stages exercise realistic payload sizes. Binary columns ride
    the Arrow channel both ways — size batches accordingly (~10-100 MB).
    """

    def _resize(batches):
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if _HAS_PIL:  # pragma: no cover
                    import io

                    with Image.open(io.BytesIO(data)) as im:
                        out = io.BytesIO()
                        im.resize((width, height)).save(out, format="PNG")
                        resized = out.getvalue()
                else:
                    _, _, c = _fake_dims(data)
                    seed = hashlib.sha256(data).digest()
                    n = width * height * c
                    resized = (seed * (n // len(seed) + 1))[:n]
                rows.append(
                    {"key": _nullable_key(key), "resized": resized,
                     "out_width": width, "out_height": height}
                )
            yield pd.DataFrame(rows, columns=["key", "resized", "out_width", "out_height"])

    return df.select(key_col, payload_col).mapInPandas(_resize, schema=RESIZED_SCHEMA)


def extract_features(
    df: DataFrame, payload_col: str, key_col: str, dim: int = 64
) -> DataFrame:
    """binary payload → unit-norm float feature vector (array<float>) — the
    embed stage that feeds the similarity/ANN operators (plans/llm.py).

    Stub featurizer: ``dim`` floats derived from the content digest,
    L2-normalized (deterministic; swap for a real vision/audio model's
    forward pass). The output column shape matches the ``embeddings`` test
    table exactly, so the whole multimodal → embed → dedup/ANN pipeline
    composes.

    Digest material is CHAINED sha256 over hex strings (h₁ = sha256(data),
    h₂ = sha256(hex(h₁)), …) and the centering/normalization is derived
    from exact integer sums (mean = Σb/dim with dim a power of two — an
    exact binary division; ‖v‖² = Σb² − (Σb)²/dim), so every embedding
    value is one correctly-rounded IEEE expression over integers and the
    DuckDB oracle (sha256 is VARCHAR-only there) reproduces it
    bit-identically — the multimodal_video recipe applied to the embed
    stage.
    """
    assert dim & (dim - 1) == 0, "dim must be a power of two (exact mean)"

    def _embed(batches):
        import numpy as np

        for pdf in batches:
            keys, vecs = [], []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                raw = hashlib.sha256(data).digest()
                while len(raw) < dim:
                    raw += hashlib.sha256(raw[-32:].hex().encode()).digest()
                b = np.frombuffer(raw[:dim], dtype=np.uint8).astype(np.int64)
                sb = int(b.sum())
                sq = int((b * b).sum())
                mean = sb / float(dim)  # exact: dim is a power of two
                norm2 = sq - sb * sb / float(dim)  # exact for same reason
                norm = float(np.sqrt(norm2)) or 1.0
                keys.append(_nullable_key(key))
                vecs.append(((b - mean) / norm).astype(np.float32))
            yield pd.DataFrame({"key": keys, "embedding": vecs})

    return df.select(key_col, payload_col).mapInPandas(
        _embed, schema="key BIGINT, embedding ARRAY<FLOAT>"
    )


def sample_frames(
    df: DataFrame, payload_col: str, key_col: str, n_frames: int = 4
) -> DataFrame:
    """\"Video\" frame sampling stub: emit ``n_frames`` evenly-spaced byte
    slices per payload (1→N row expansion — the shape a real ffmpeg-backed
    sampler produces). Demonstrates fan-out inside mapInPandas with bounded
    batch memory."""

    def _sample(batches):
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                step = max(len(data) // max(n_frames, 1), 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(data) - 1, 0))
                    chunk = data[off:off + step]
                    rows.append(
                        {
                            "key": _nullable_key(key),
                            "frame_idx": i,
                            "offset": off,
                            "frame_bytes": len(chunk),
                            "frame_sha256": hashlib.sha256(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "key", "frame_idx", "offset", "frame_bytes", "frame_sha256",
                ],
            )

    return df.select(key_col, payload_col).mapInPandas(_sample, schema=FRAME_SCHEMA)


#: schema of decode_audio_meta output
AUDIO_META_SCHEMA = (
    "key BIGINT, n_samples BIGINT, sample_rate BIGINT, duration_ms BIGINT, "
    "rms_milli BIGINT, peak_milli BIGINT"
)

try:  # pragma: no cover - not present in this container
    import soundfile  # noqa: F401

    _HAS_SOUNDFILE = True
except Exception:
    _HAS_SOUNDFILE = False


def decode_audio_meta(
    df: DataFrame, payload_col: str, key_col: str, force_stub: bool = False
) -> DataFrame:
    """binary payload → audio metadata + loudness stats (the audio arm of
    the modality convention: payload stays opaque binary, decode runs
    Arrow-batched).

    Real path: ``soundfile``/librosa when available. Stub (this
    container): the payload's bytes are interpreted as signed 8-bit PCM
    and the sample rate derives from the content digest — deterministic
    across runs/partitionings. RMS and peak amplitude are emitted as
    integer MILLI-units of full scale so downstream aggregation is
    exact-integer (the loudness-gate analogue of the text suite's ppm
    discipline).

    Milli-unit math is IEEE-deterministic BY CONSTRUCTION so the DuckDB
    oracle can restate it exactly (the r04 verdict's multimodal_video
    recipe): the sum of squared samples is an exact INTEGER (Σb² over
    int8 bytes), and ``rms_milli = floor(1000·sqrt(Σb²/(16384·n)))`` is
    one correctly-rounded division + sqrt + multiply — bit-identical on
    any IEEE-754 engine evaluating the same expression, unlike a
    float-mean-then-banker's-round chain whose summation order leaks in.

    Scale: same rules as image decode — narrow projection into the
    kernel, ~10-100 MB of payload per batch, no shuffle in the stage.
    """

    def _decode(batches):
        import math

        import numpy as np

        rates = (8000, 16000, 44100)
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                if _HAS_SOUNDFILE and not force_stub:  # pragma: no cover - real decoder path
                    import io

                    import soundfile as sf

                    x, rate = sf.read(io.BytesIO(data), dtype="float64")
                    x = x.ravel()
                    n = len(x)
                    rms_milli = (
                        int(math.floor(1000.0 * math.sqrt((x * x).mean())))
                        if n
                        else 0
                    )
                    peak_milli = (
                        int(math.floor(1000.0 * float(np.abs(x).max())))
                        if n
                        else 0
                    )
                else:
                    v = np.frombuffer(data, dtype=np.int8).astype(np.int64)
                    rate = rates[hashlib.sha256(data).digest()[0] % 3]
                    n = len(v)
                    if n:
                        sq = int((v * v).sum())  # exact integer
                        mb = int(np.abs(v).max())
                        rms_milli = int(
                            math.floor(1000.0 * math.sqrt(sq / (16384.0 * n)))
                        )
                        peak_milli = int(math.floor(1000.0 * (mb / 128.0)))
                    else:
                        rms_milli = peak_milli = 0
                rows.append(
                    {
                        "key": _nullable_key(key),
                        "n_samples": n,
                        "sample_rate": int(rate),
                        "duration_ms": n * 1000 // int(rate),
                        "rms_milli": rms_milli,
                        "peak_milli": peak_milli,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "key", "n_samples", "sample_rate", "duration_ms",
                    "rms_milli", "peak_milli",
                ],
            )

    return df.select(key_col, payload_col).mapInPandas(
        _decode, schema=AUDIO_META_SCHEMA
    )
