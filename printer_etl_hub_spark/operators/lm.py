"""Bigram language-model operators: batch model build + model-applied
scoring.

The split matters for streaming: q143 (plans/textops.py) scores a corpus
against ITS OWN statistics in one plan; production routing scores NEW
documents against a FROZEN model trained offline (the CCNet deployment
shape). ``kn_bigram_model`` builds that frozen model as a plain
DataFrame — which makes applying it to a stream a stream-static join,
no state store, no retraining (see streaming/corpus.py::
kn_routing_stream). When the scored corpus equals the training corpus,
``kn_score_with_model`` reproduces q143's (doc_id, n_bigrams,
mean_kn_p) bit-exactly — the contract tests/test_streaming.py pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

#: Absolute discount of the interpolated Kneser-Ney estimate (q143's).
KN_D = 0.75


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-occurrence (doc_id, u, v) bigram stream (q143's derivation)."""
    d = docs.select(F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("w"))
    bigrams = F.when(
        F.size("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 1),
            lambda i: F.struct(
                F.element_at(F.col("w"), i).alias("u"),
                F.element_at(F.col("w"), i + 1).alias("v"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<u:string,v:string>>"))
    return d.select("doc_id", F.explode(bigrams).alias("p")).select(
        "doc_id", "p.u", "p.v"
    )


def kn_bigram_model(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Train the interpolated-KN bigram model from a static corpus →
    one row per observed bigram: (u, v, p) with
    ``p = max(c(uv)-D,0)/c(u·) + (D·N1+(u·)/c(u·)) · N1+(·v)/B``
    (q143's fixed-order IEEE expression — identical scores by
    construction). Shape: one corpus bigram groupBy + two vocab-sized
    stat aggs + ONE 1-row broadcast (B); the result is the broadcast-
    able model artifact a router ships, bounded by the distinct-bigram
    count, never the corpus.
    """
    doc_bg = _doc_bigrams(docs, id_col, text_col)
    big = doc_bg.groupBy("u", "v").agg(F.count(F.lit(1)).alias("n_uv"))
    ustats = big.groupBy("u").agg(
        F.sum("n_uv").alias("ctx"), F.count(F.lit(1)).alias("ncr")
    )
    vstats = big.groupBy("v").agg(F.count(F.lit(1)).alias("ncl"))
    btot = big.agg(F.count(F.lit(1)).alias("b"))
    D = F.lit(KN_D)
    ctx_d = F.col("ctx").cast("double")
    term1 = F.greatest(F.col("n_uv").cast("double") - D, F.lit(0.0)) / ctx_d
    term2 = ((D * F.col("ncr").cast("double")) / ctx_d) * (
        F.col("ncl").cast("double") / F.col("b").cast("double")
    )
    return (
        big.join(ustats, "u")
        .join(vstats, "v")
        .join(F.broadcast(btot))
        .select("u", "v", (term1 + term2).alias("p"))
    )


def kn_score_with_model(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a FROZEN model → (doc_id, n_bigrams,
    mean_kn_p). Bigrams unseen by the model are dropped by the inner
    join (a router can only price transitions it has statistics for);
    when docs ⊆ the training corpus every bigram matches and the output
    equals q143's row for row. The join is stream-static-safe: ``docs``
    may be a streaming frame, ``model`` must be static. Mean through
    decimal(38,18) (q143's tie lesson), rounded 9.
    """
    doc_bg = _doc_bigrams(docs, id_col, text_col)
    scored = doc_bg.join(model, ["u", "v"])
    p18 = F.col("p").cast("decimal(38,18)")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(
            F.sum(p18).cast("double") / F.count(F.lit(1)).cast("double"), 9
        ).alias("mean_kn_p"),
    )
