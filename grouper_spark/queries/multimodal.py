"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic stub — but everything Spark-side is real:
binary columns, metadata extraction in codegen (q41, oracle-checked),
and the Arrow-batched ``mapInPandas`` feature-extraction pipeline (q42,
rows-only) with the exact schema/batching shape a real decoder would
use. Swapping the stub for PIL/ffmpeg changes one function."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources import table
from . import query


@query(
    "q41_binary_metadata",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS payload_bytes,
       sha256(text) AS payload_sha,
       CASE WHEN octet_length(encode(text)) > 400 THEN 'large' ELSE 'small' END
         AS size_class
FROM documents
ORDER BY doc_id
""",
    tags=("multimodal",),
)
def q41_binary_metadata(spark, sf_dir):
    """Treat text as an opaque binary payload: byte length, content hash,
    size classing — all JVM-side over a binary column."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    nbytes = F.octet_length(payload)
    return d.select(
        "doc_id",
        nbytes.alias("payload_bytes"),
        F.sha2("text", 256).alias("payload_sha"),
        F.when(nbytes > 400, "large").otherwise("small").alias("size_class"),
    ).orderBy("doc_id")


# Deterministic fake "decode": a real implementation would decode image
# bytes and emit pixel features. STUB — replace with PIL/torchvision.
_FEATURE_DIM = 4
_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
        StructField("decoder", StringType()),
    ]
)


def _fake_decode_features(payload: bytes) -> list[float]:
    """STUB decoder: deterministic features from the first bytes.
    Raises NotImplementedError for payloads a real codec would reject."""
    if payload is None:
        raise NotImplementedError("real decoder required for null payloads")
    head = payload[:_FEATURE_DIM] + b"\x00" * max(0, _FEATURE_DIM - len(payload))
    return [float(b) / 255.0 for b in head[:_FEATURE_DIM]]


@query("q42_multimodal_features", oracle=None, tags=("multimodal", "rows_only"))
def q42_multimodal_features(spark, sf_dir):
    """mapInPandas feature-extraction pipeline over binary payloads:
    Arrow-batched, partition-parallel — the real plumbing for a decoder
    UDF (batch shape: one pandas DataFrame per Arrow batch)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def extract(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_bytes": payloads.map(len).astype("int64"),
                    "features": payloads.map(_fake_decode_features),
                    "decoder": "stub-v0",
                }
            )

    out = d.mapInPandas(extract, schema=_OUT_SCHEMA)
    # The UDF emits a real array<double> column (the plumbing a decoder
    # needs), but the driver's pandas canonicalizer cannot hash lists —
    # serialize it at the boundary and keep a scalar reduction alongside.
    return out.select(
        "doc_id",
        "payload_bytes",
        F.to_json("features").alias("features_json"),
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6).alias(
            "feature_sum"
        ),
        "decoder",
    ).orderBy("doc_id")
