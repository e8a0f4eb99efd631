"""Continuous corpus ingestion: the streaming form of the corpus-prep
gates (q81's front half) for a documents STREAM — new crawl shards arrive
continuously, each micro-batch is quality-gated and deduplicated against
every document ever admitted, and survivors append to the training
corpus. Batch-equivalence contract: the SET of admitted content digests
equals the batch pipeline's distinct-digest set over the same rows
(which doc_id represents a digest is arrival-order dependent in a
stream, by nature).

All gates are pure Column expressions (`functions/text.py`) and run
unchanged on a stream; the dedup is Spark's streaming ``dropDuplicates``
state store. Without a watermark that state grows with the distinct
corpus forever — correct for dedup-against-all-history, and the state is
just the digest set (32 chars/doc: ~3 GiB per 100 M docs, RocksDB-backed
on a real cluster). Pass ``dedup_ttl`` + an event-time column to switch
to ``dropDuplicatesWithinWatermark`` when dedup-within-horizon is enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_features, tokenize


def corpus_ingest_stream(
    docs: DataFrame,
    min_quality: float = 0.45,
    dedup_ttl: str | None = None,
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """Quality-gate + streaming exact-dedup over a documents stream.

    Emits one row per first-seen content digest that passes the quality
    gate: (doc_id, dig, n_tokens, quality_score). Works identically on a
    batch frame (dropDuplicates degrades to the batch operator), which is
    what the equivalence test pins.
    """
    staged = docs.select(
        "doc_id", "text", tokenize(F.col("text")).alias("toks"),
        *([ts_col] if dedup_ttl is not None else []),
    )
    feats = quality_features(F.col("text"), F.col("toks"))
    gated = staged.select(
        "doc_id",
        F.md5(F.col("text")).alias("dig"),
        feats["n_tokens"].alias("n_tokens"),
        feats["quality_score"].alias("quality_score"),
        *([ts_col] if dedup_ttl is not None else []),
    ).filter(F.col("quality_score") >= min_quality)
    if dedup_ttl is not None:
        return gated.withWatermark(ts_col, dedup_ttl).dropDuplicatesWithinWatermark(
            ["dig"]
        )
    return gated.dropDuplicates(["dig"])
