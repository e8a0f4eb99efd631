"""Multimodal (image/audio/video) column plumbing.

Media is carried as an opaque ``binary`` column plus typed metadata — the
standard Spark layout for petabyte media corpora (payloads stay columnar in
parquet; only the batches being decoded materialize in Python).

The decode/feature kernels run through ``mapInPandas`` so bytes cross the
JVM→Python boundary once per Arrow batch, not per row. The actual codec
calls are STUBBED (no PIL/ffmpeg in this container): `decode_fake` derives
deterministic pseudo-metadata from the bytes so the plumbing — schema,
batching, partition sizing — is real and testable; swap `_decode_image`
for a real codec in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the decode stage (DDL string for mapInPandas).
DECODE_SCHEMA = (
    "media_id bigint, byte_len int, content_md5 string, "
    "width int, height int, n_frames int, format string"
)


def _decode_image(media_id: int, payload: bytes) -> dict:
    """STUB decode kernel — deterministic fake metadata from the bytes.

    Real implementation would call PIL/libav here; the container has no
    media libs, so we derive stable pseudo-dimensions instead. The Spark-side
    contract (one dict per media row, fixed keys) is the real interface.
    """
    n = len(payload)
    return {
        "media_id": media_id,
        "byte_len": n,
        "content_md5": __import__("hashlib").md5(payload).hexdigest(),
        "width": 64 + (n % 577),
        "height": 64 + (n % 433),
        "n_frames": 1 + (n % 7),
        "format": "fake/%d" % (n % 3),
    }


def decode_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Run the (stubbed) decode kernel over a binary column, Arrow-batched.

    Input: any frame with (id_col bigint, payload_col binary).
    Output: DECODE_SCHEMA. Partitioning note: media rows are wide — size
    ``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits in the
    Python worker; repartition upstream if payloads are >100 MB each.
    """
    src = df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _decode_image(int(i), bytes(p) if p is not None else b"")
                for i, p in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=DECODE_SCHEMA)


def frame_sample(df: DataFrame, id_col: str, n_frames_col: str, every: int = 2) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame index.

    Pure relational explode — the frame *selection* needs no Python at all;
    only the eventual pixel decode does.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every))
        ).alias("frame_idx"),
    )
