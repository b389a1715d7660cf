"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with a typed metadata struct —
the lakehouse-native layout (one row per asset, bytes inline for
small assets or a URI for large ones). Decode/feature-extraction run
as Arrow-batched ``mapInPandas`` UDFs: the ONLY place this engine
drops out of JVM expressions, because codec work is inherently
Python/native-library territory.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
``decode_image_stub`` produces a deterministic fake feature vector;
the Spark-side plumbing — schema, batch iteration, partitioning — is
real and tested. Swap ``_fake_decode`` for a real decoder to go to
production; the plan shape does not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("checksum", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

N_FEATURES = 8


def attach_fake_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build a media table from any table: bytes = utf-8 of a text column.

    Stands in for reading real image/audio blobs; keeps the binary-column
    pipeline testable without codecs.
    """
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(payload_col), "utf-8").alias("content"),
        F.struct(
            F.length(F.col(payload_col)).alias("n_chars"),
            F.lit("synthetic").alias("origin"),
        ).alias("meta"),
    )


def _fake_decode(buf: bytes) -> list[float]:
    """Deterministic stand-in for image decode + feature extraction.

    Real implementation would be, e.g.::

        img = PIL.Image.open(io.BytesIO(buf)).resize((224, 224))
        return model.embed(np.asarray(img))

    which is unavailable here (no PIL in the container).
    """
    if not buf:
        return [0.0] * N_FEATURES
    return [float(sum(buf[i::N_FEATURES]) % 997) for i in range(N_FEATURES)]


def decode_image_stub(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/featurize over binary content via mapInPandas.

    Batches stream through Python workers; nothing is collected to the
    driver, and upstream partitioning is preserved — the pattern scales
    to arbitrarily many assets by adding executors.
    """

    out_schema = FEATURE_SCHEMA

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(b) for b in pdf["content"]],
                    "checksum": [sum(b) % 1_000_000_007 for b in pdf["content"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(decode_batches, schema=out_schema)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize requires a codec library not present in this
    container — clearly-marked stub per the build brief."""
    raise NotImplementedError(
        "image resize needs PIL/opencv (not in container); "
        "plumbing pattern: mapInPandas over MEDIA_SCHEMA -> same schema"
    )
