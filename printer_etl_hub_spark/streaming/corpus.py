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


def minhash_ingest_sink(
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    min_quality: float | None = None,
    max_bucket: int | None = None,
):
    """foreachBatch sink: NEAR-dup ingest against a stored MinHash band
    index — the streaming form of the q108 batch flow (`operators/
    dedup.py::minhash_band_index` + `minhash_index_join`).

    Per micro-batch, in this order:
    1. optional quality gate (same Column gates as `corpus_ingest_stream`);
    2. the batch's band index (cost tracks the BATCH, never the corpus);
    3. cross pairs: batch index equi-joined against the STORED index —
       history never pays its own fan-out;
    4. in-batch pairs: bucket pairs within the batch's own index
       (`minhash_index_pairs`);
    5. append the batch's index rows and the discovered pairs.

    Because the stored-index join runs BEFORE the batch's rows are
    appended, every unordered pair is discovered exactly once — in the
    batch where its LATER member arrives — so the pair log needs no
    cross-batch dedup. Equivalence contract (pinned by
    ``tests/test_streaming.py``): after any partitioning of a corpus
    into micro-batches, the pair-log set equals
    ``minhash_lsh_pairs(whole_corpus)`` and the stored index equals
    ``minhash_band_index(whole_corpus)``.

    Exactly-once on at-least-once delivery: each batch writes its rows
    under ``<dir>/batch_id=<n>`` with overwrite, so a foreachBatch
    re-delivery after restart replaces its own partition instead of
    appending duplicates (the same idempotence idiom as the MERGE sink).
    Downstream keeper selection (connected components over the pair log
    → min-id keeper) stays a batch-side concern: the log is the durable
    artifact, survivorship is a projection over it.

    Scale: the stored index is the artifact you bucket by ``band_key``
    on a real cluster so step 3 is a co-located join; per-batch cost is
    batch-signature build + one equi-join whose probe side is the batch.
    """
    from ..operators.dedup import (
        minhash_band_index,
        minhash_index_join,
        minhash_index_pairs,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df
        if min_quality is not None:
            feats = quality_features(
                F.col(text_col), tokenize(F.col(text_col))
            )
            docs = docs.filter(feats["quality_score"] >= F.lit(min_quality))
        idx = minhash_band_index(
            docs, id_col, text_col, k=k, bands=bands, shingle_n=shingle_n
        ).localCheckpoint(eager=True)  # feeds 3 consumers; batch-sized
        try:
            # Exclude this batch's OWN partition from the history read:
            # on an at-least-once re-delivery the partition already holds
            # the batch's rows, and joining a batch against itself via
            # "history" would mint self-pairs and duplicate the in-batch
            # pairs. Partition pruning makes the exclusion free.
            hist = (
                spark.read.parquet(index_dir)
                .filter(F.col("batch_id") != F.lit(int(batch_id)))
                .select(id_col, "band_id", "band_key")
            )
        except Exception:  # first batch: no index yet
            hist = None
        if hist is not None:
            cross = (
                minhash_index_join(idx, hist, new_id="_n", hist_id="_h")
                .select(
                    F.least("_n", "_h").alias("a_id"),
                    F.greatest("_n", "_h").alias("b_id"),
                )
                .distinct()
            )
        else:
            cross = None
        inb = minhash_index_pairs(idx, max_bucket=max_bucket)
        pairs = inb if cross is None else inb.unionByName(cross).distinct()
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/batch_id={batch_id}")
        idx.write.mode("overwrite").parquet(f"{index_dir}/batch_id={batch_id}")

    return _sink
