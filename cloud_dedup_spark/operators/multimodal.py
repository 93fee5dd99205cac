"""Multimodal (image/audio/video) column plumbing — Spark-side real, codecs stubbed.

Treats media as opaque ``binary`` payloads with typed metadata columns, the
standard shape for a training-data lake.  The Spark plumbing — schema,
Arrow batch iteration via ``mapInPandas``, partition sizing, deterministic
content ids — is real and tested; the actual decode (PIL/ffmpeg/torchaudio
are not in this container) is isolated behind ``Decoder`` implementations:
``StubDecoder`` raises NotImplementedError, ``FakeDecoder`` produces
deterministic features from the bytes so the distributed path is testable
end-to-end.

Scale notes: media rows are wide (MBs); ``spark.sql.files.maxPartitionBytes``
and the Arrow batch cap (session.py) keep per-task memory bounded.  Feature
extraction is embarrassingly parallel — no shuffle until the downstream
similarity join, which reuses operators/similarity.py on the emitted
embedding column.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),   # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


class Decoder:
    """Decode payload bytes → float feature vector.  Swap per deployment."""

    dim: int = 16

    def decode(self, kind: str, payload: bytes) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError


class StubDecoder(Decoder):
    """Container has no media libs — make that loud, not silent."""

    def decode(self, kind: str, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg/torchaudio; install on the "
            "cluster image and plug a real Decoder"
        )


class FakeDecoder(Decoder):
    """Deterministic bytes→features stand-in: exercises the full distributed
    path (Arrow batches, schema, downstream similarity joins) without codecs."""

    def decode(self, kind: str, payload: bytes) -> np.ndarray:
        digest = hashlib.blake2b(payload, digest_size=self.dim * 4).digest()
        raw = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
        vec = raw / np.float64(0xFFFFFFFF)
        return (vec / np.linalg.norm(vec)).astype(np.float32)


def extract_features(media: DataFrame, decoder: Decoder) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.

    Failures per row are isolated (feature=None), never task-fatal — a single
    corrupt payload must not kill a 100 TB job.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list[list[float] | None] = []
            shas: list[str] = []
            sizes: list[int] = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                data = bytes(payload)
                shas.append(hashlib.sha256(data).hexdigest())
                sizes.append(len(data))
                try:
                    feats.append(decoder.decode(kind, data).tolist())
                except NotImplementedError:
                    raise
                except Exception:
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content_sha256": shas,
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def exact_media_duplicates(features: DataFrame) -> DataFrame:
    """Byte-identical media groups — the exact channel works on any modality
    because it never decodes (reference MD5 principle, :100-111)."""
    return (
        features.groupBy("content_sha256")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sort_array(F.collect_list("media_id")).alias("media_ids"),
        )
        .filter(F.col("n_media") >= 2)
    )


def synthetic_media(spark, n: int = 64, seed: int = 42, dup_every: int = 8) -> DataFrame:
    """Deterministic fake media table for tests: every ``dup_every``-th row
    duplicates row 0's payload (planted exact-dup group)."""
    rng = np.random.RandomState(seed)
    base = rng.bytes(256)
    rows = []
    for i in range(n):
        payload = base if i % dup_every == 0 else rng.bytes(256)
        kind = ("image", "audio", "video")[i % 3]
        rows.append(
            (i, kind, f"application/x-{kind}", bytearray(payload), 64, 64, 1000)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
