"""Multimodal column plumbing: binary payloads with typed metadata.

Image/audio/video travel as opaque ``binary`` columns plus a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels. Decode backends (PIL/ffmpeg/soundfile) are NOT
available in this environment — the decode step is stubbed behind
``DecoderUnavailable`` with a deterministic fake for tests; the Spark-side
plumbing (schema, partitioning, UDF signature, batch shapes) is real.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary,"
    " meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"
CHECKSUM_FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, payload_md5 string,"
    " feature array<float>"
)


class DecoderUnavailable(NotImplementedError):
    """Raised when a real media decoder is required but not installed."""


def _try_import_pil():
    try:  # pragma: no cover - not installed in this environment
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def decode_image(payload: bytes):  # pragma: no cover - real backend path
    if not _try_import_pil():
        raise DecoderUnavailable(
            "image decode requires PIL; use fake_feature kernels in this environment"
        )
    import io

    import PIL.Image

    return np.asarray(PIL.Image.open(io.BytesIO(payload)))


def _fake_feature(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a decode→embed step: blake2b-seeded floats.

    Keeps the full Spark plumbing testable without media libraries.
    """
    digest = hashlib.blake2b(payload or b"", digest_size=dim * 2).digest()
    arr = np.frombuffer(digest, dtype=np.uint16).astype(np.float32)
    return arr / np.float32(65535.0)


def extract_features(
    media: DataFrame,
    dim: int = 16,
    use_real_decoder: bool = False,
    checksum: bool = False,
) -> DataFrame:
    """media table → per-item feature vectors (Arrow-batched kernel).

    With ``use_real_decoder=True`` the kernel decodes images via PIL and
    raises :class:`DecoderUnavailable` when absent; the default path uses the
    deterministic fake so schema/batching are exercised end-to-end.

    ``checksum=True`` adds ``payload_md5`` = md5 of the uppercase-hex payload
    computed INSIDE the Python kernel — proving the binary column survived
    the Arrow batch transfer byte-exactly (DuckDB recomputes it as
    ``md5(hex(payload))``).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes, sums = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                nbytes.append(len(raw))
                if checksum:
                    sums.append(hashlib.md5(raw.hex().upper().encode()).hexdigest())
                if use_real_decoder and kind == "image":
                    img = decode_image(raw)  # raises DecoderUnavailable w/o PIL
                    vec = img.astype(np.float32).ravel()[:dim]
                    vec = np.pad(vec, (0, dim - vec.size))
                else:
                    vec = _fake_feature(raw, dim)
                feats.append(vec.tolist())
            cols = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": nbytes,
                "feature": feats,
            }
            if checksum:
                cols["payload_md5"] = sums
            yield pd.DataFrame(cols)[
                ["media_id", "kind", "n_bytes", "payload_md5", "feature"]
                if checksum
                else ["media_id", "kind", "n_bytes", "feature"]
            ]

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema=CHECKSUM_FEATURE_SCHEMA if checksum else FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plan for video payloads: emits (media_id, frame_idx,
    ts_ms) rows from metadata only — the decode of each frame is the stubbed
    step. Pure JVM expressions; demonstrates explode-based fan-out."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(
                F.slice(
                    F.sequence(
                        F.lit(0),
                        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms),
                    ),
                    1,
                    max_frames,
                )
            ).alias("frame_idx", "ts_ms"),
        )
    )


def build_media_rows(n: int = 32, seed: int = 42) -> list[tuple]:
    """Deterministic synthetic media rows (plain Python — shared with the
    DuckDB oracle, which inlines the same payloads as blob literals)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(64 + (i % 5) * 16))
        rows.append(
            (
                i,
                kind,
                payload,
                {
                    "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "width": 64 if kind == "image" else None,
                    "height": 64 if kind == "image" else None,
                    "duration_ms": 5000 if kind != "image" else None,
                },
            )
        )
    return rows


def build_media_df(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests/benches."""
    return spark.createDataFrame(build_media_rows(n, seed), MEDIA_SCHEMA)
