"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed —
either a clearly-marked NotImplementedError (real codec path) or a
deterministic fake (hash-derived features) — but everything Spark-side is
real and tested: schema, Arrow batch shape, mapInPandas signature,
partitioning behavior.  Swapping the stub for PIL/torchaudio is a
one-function change inside the UDF.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_real(payload: bytes, kind: str):  # pragma: no cover - codec-less sandbox
    """Real PIXEL/SAMPLE decode path — requires PIL / soundfile / av,
    absent here.  Container-header METADATA decode needs no codec and is
    fully implemented below (sniff_media_meta)."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "plug PIL.Image.open / soundfile.read / av.open here"
    )


def sniff_media_meta(payload: bytes | None) -> dict:
    """REAL (not stubbed) container-header metadata decode — pure byte
    parsing of the PNG IHDR, JPEG SOF marker walk, GIF logical screen
    descriptor, and RIFF/WAVE fmt chunk.  No codec library involved, so
    this runs on executors as-is.

    Returns {mime, width, height, sample_rate} with None for fields the
    container does not carry / unknown formats.
    """
    out = {"mime": None, "width": None, "height": None, "sample_rate": None}
    b = payload or b""
    if b.startswith(b"\x89PNG\r\n\x1a\n") and len(b) >= 24:
        out["mime"] = "image/png"
        out["width"] = int.from_bytes(b[16:20], "big")
        out["height"] = int.from_bytes(b[20:24], "big")
    elif b.startswith(b"\xff\xd8"):
        out["mime"] = "image/jpeg"
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            # SOFn markers carry the frame header (C0-CF minus C4/C8/CC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                out["height"] = int.from_bytes(b[i + 5 : i + 7], "big")
                out["width"] = int.from_bytes(b[i + 7 : i + 9], "big")
                break
            i += 2 + seg_len
    elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        out["mime"] = "image/gif"
        out["width"] = int.from_bytes(b[6:8], "little")
        out["height"] = int.from_bytes(b[8:10], "little")
    elif b.startswith(b"RIFF") and b[8:12] == b"WAVE" and len(b) >= 28:
        out["mime"] = "audio/wav"
        out["sample_rate"] = int.from_bytes(b[24:28], "little")
    return out


META_OUT = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)


def extract_media_meta(media: DataFrame) -> DataFrame:
    """mapInPandas header sniff over the binary payload column — the
    metadata half of 'decode' that needs no codec (real, tested)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [sniff_media_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in metas],
                    "width": pd.array([m["width"] for m in metas], dtype="Int32"),
                    "height": pd.array([m["height"] for m in metas], dtype="Int32"),
                    "sample_rate": pd.array(
                        [m["sample_rate"] for m in metas], dtype="Int32"
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, schema=META_OUT)


def make_png(width: int, height: int) -> bytes:
    """Minimal valid-header PNG (signature + IHDR; no pixel data)."""
    ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big") + bytes(
        [8, 2, 0, 0, 0]
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"  # crc not validated by the sniffer
    )


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG: SOI + APP0 + SOF0 frame header + EOI."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    sof = (
        b"\xff\xc0"
        + (11).to_bytes(2, "big")
        + bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def make_wav(sample_rate: int) -> bytes:
    """Minimal RIFF/WAVE header (44 bytes, no samples)."""
    return (
        b"RIFF"
        + (36).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")   # PCM
        + (1).to_bytes(2, "little")   # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
        + b"data"
        + (0).to_bytes(4, "little")
    )


def _fake_feature(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for an encoder: sha256-seeded unit vector.

    Pure function of the bytes → identical on every executor and re-run.
    """
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    vec = (raw.astype(np.float64) / 2**32) - 0.5
    n = np.linalg.norm(vec)
    return (vec / n if n > 0 else vec).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction with explicit Arrow batch shape.

    Real pipelines put the expensive decode here; partition sizing rule:
    payload bytes per Arrow batch ≈ batch_hint × mean payload size must
    fit executor memory — tune spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def feat_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_feature(p, dim).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(feat_batches, schema=FEATURES)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame.

    The decode is stubbed; the fan-out (posexplode over the frame index
    sequence, bounded by meta.n_frames) is the real Spark shape.
    """
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("sample_idx", "frame_idx"),
        )
    )


def gen_media(n: int, seed: int = 13) -> list[dict]:
    """Deterministic fake media rows for tests."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "meta": {
                    "width": 640 if kind == "image" else None,
                    "height": 480 if kind == "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": 100 if kind == "video" else None,
                    "mime": f"{kind}/fake",
                },
            }
        )
    return rows
