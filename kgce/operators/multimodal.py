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
    """Real decode path — requires PIL / soundfile / av, absent here."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "plug PIL.Image.open / soundfile.read / av.open here"
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
