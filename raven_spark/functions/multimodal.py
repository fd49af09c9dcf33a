"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
mapInPandas signatures, partitioning — while the actual codec work (PIL/
ffmpeg/librosa are not in this container) is STUBBED behind
``NotImplementedError`` or a deterministic fake, clearly marked.

Layout convention for a multimodal corpus table:

    asset_id BIGINT, kind STRING ('image'|'audio'|'video'),
    payload BINARY, meta STRUCT<width:int, height:int, sample_rate:int,
    n_frames:int, codec:string>

Binary payloads here use a tiny self-describing header (magic 'RVSB' +
dtype + shape) so pack/unpack round-trips losslessly — which also gives
the float-embedding <-> binary path an exact SQL oracle (norms computed
pre-pack equal norms computed post-unpack).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_MAGIC = b"RVSB"


def pack_floats(vec: np.ndarray) -> bytes:
    """float32 vector -> self-describing binary payload."""
    v = np.asarray(vec, dtype=np.float32)
    return _MAGIC + struct.pack("<BI", 1, v.size) + v.tobytes()


def unpack_floats(payload: bytes) -> np.ndarray:
    if payload[:4] != _MAGIC:
        raise ValueError("bad magic")
    (_dtype, n) = struct.unpack("<BI", payload[4:9])
    return np.frombuffer(payload[9 : 9 + 4 * n], dtype=np.float32)


@pandas_udf(T.BinaryType())
def pack_floats_udf(vecs: pd.Series) -> pd.Series:
    return vecs.map(lambda v: pack_floats(np.asarray(v, dtype=np.float32)))


@pandas_udf(T.ArrayType(T.FloatType()))
def unpack_floats_udf(payloads: pd.Series) -> pd.Series:
    return payloads.map(lambda b: unpack_floats(bytes(b)).tolist())


# --- decode / feature-extract stubs ------------------------------------------

MEDIA_FEATURES_SCHEMA = (
    "asset_id bigint, kind string, n_bytes int, width int, height int, "
    "sample_rate int, n_frames int, feature array<float>"
)


def decode_image(payload: bytes) -> np.ndarray:
    """STUB: real impl = PIL.Image.open(BytesIO(payload)) -> np array.
    The image libraries are not available in this container."""
    raise NotImplementedError("image decode requires PIL; not in sandbox")


def decode_audio(payload: bytes) -> np.ndarray:
    """STUB: real impl = soundfile/librosa decode."""
    raise NotImplementedError("audio decode requires soundfile; not in sandbox")


def _fake_meta(payload: bytes, kind: str) -> tuple[int, int, int, int]:
    """Deterministic fake decode for plumbing tests: metadata derived from
    payload bytes (stands in for a real header parse)."""
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    if kind == "image":
        return (64 + h % 1024, 64 + (h >> 10) % 1024, 0, 1)
    if kind == "audio":
        return (0, 0, 8000 + (h % 5) * 8000, 0)
    return (320, 240, 0, 1 + h % 300)


def extract_media_features(
    assets: DataFrame, feature_dim: int = 8, use_fake_decode: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real deployments swap ``_fake_meta``/the pooled-bytes feature for a
    codec decode + model embedding; batch shape, schema, and partitioning
    are exactly what the real path needs (payloads stay off the driver,
    one Arrow crossing, features come back as array<float>).
    """
    if not use_fake_decode:  # pragma: no cover — sandbox has no codecs
        raise NotImplementedError("real decode not available in sandbox")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _fake_meta(bytes(p), k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            feats = []
            for p in pdf["payload"]:
                raw = np.frombuffer(bytes(p), dtype=np.uint8)
                pad = (-len(raw)) % feature_dim
                mat = np.pad(raw, (0, pad)).reshape(-1, feature_dim).astype(np.float32)
                feats.append((mat.mean(axis=0) / 255.0).tolist())  # mean-pool "embedding"
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "sample_rate": [m[2] for m in metas],
                    "n_frames": [m[3] for m in metas],
                    "feature": feats,
                }
            )
            yield out

    return assets.mapInPandas(run, MEDIA_FEATURES_SCHEMA)


def embeddings_as_assets(embeddings: DataFrame) -> DataFrame:
    """Adapter: embeddings table -> multimodal asset table (payload =
    packed float vector), used by tests and the oracle round-trip query."""
    return embeddings.select(
        F.col("vec_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        pack_floats_udf(F.col("embedding")).alias("payload"),
    )
