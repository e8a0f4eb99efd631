"""The engine's declared query surface: name → (spark_fn, oracle_sql).

``REGISTRY`` insertion order is part of the external contract: the
correctness driver gates the FIRST 50 entries each round. ``GATE_ORDER``
makes that window explicit so coverage can be rotated deliberately.
Round 4 leads with the two composed-pipeline flagships (q81 corpus
prep, q82 embedding dedup) which postdate the round-3 gate run and have
no external CORRECTNESS row yet, then the mid-round additions
(q100-q105), then re-evidences the queries whose newest external green
row is round 1/2 (q12, q14, q16-q19, q39-q45, q49-q50, q52-q56;
q02-q07/q09-q11 yielded their slots to newer zero-row queries and rotate
back next round). The remaining 19 slots backfill from the
round-3-green set, front-loading the queries whose implementation
changes this round (q77 distributed shard packing, q31 guard rework,
q72 checkpoint option) so the changes are externally re-verified.
q37 stays OUTSIDE the window by design: its estimator output has no
exact oracle (pinned by a tolerance test instead), and every gated
entry must be able to turn green. Everything not named in GATE_ORDER
follows in module order, so the full surface stays importable and
tested either way.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .relational import RELATIONAL_QUERIES
from .textops import TEXT_QUERIES
from .tpch_pack import TPCH_PACK_QUERIES


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle_sql: str | None


_ALL: dict[str, tuple] = {
    **RELATIONAL_QUERIES,
    **TEXT_QUERIES,
    **TPCH_PACK_QUERIES,
}

#: First 50 = the driver's correctness window for this round.
GATE_ORDER = [
    # Flagship composed pipelines — committed after the round-3 gate
    # ran, so these are the only implemented+oracled queries with zero
    # external CORRECTNESS rows. Lead with them.
    "q81_corpus_prep",
    "q82_embedding_dedup",
    # Mid-round additions with zero external rows anywhere: SemDeDup,
    # PQ encode, the leakage-safe split, the Kneser-Ney count prep, BM25
    # retrieval, and Count-Min heavy hitters.
    "q100_semantic_dedup",
    "q101_pq_encode",
    "q102_leakage_safe_split",
    "q103_kn_ngram_stats",
    "q104_bm25_topk",
    "q105_cms_heavy_hitters",
    # Re-evidence: the queries whose newest external green row is
    # round 1/2 (rotated out of the round-3 window). q02/q03/q04 yielded
    # their slots to q97/q98/q99, and q05/q06/q07/q09/q10/q11 to q100-q105
    # (zero external rows beats two-round-old green; all stay covered by
    # unit tests + the local oracle-diff suite, and rotate back next
    # round).
    "q12_point_lookup",
    "q14_group_representative",
    "q16_rollup",
    "q17_setops",
    "q18_json_extract",
    "q19_catalog_lookup",
    "q39_sliding_window",
    "q40_tpch_q10",
    "q41_semi_anti_join",
    "q42_tpch_q18",
    "q43_exact_percentiles",
    "q44_tpch_q4",
    "q45_tpch_q14",
    "q49_distinct_agg",
    "q50_cube",
    "q52_unpivot",
    "q53_rank_windows",
    "q54_tpch_q17",
    "q55_string_agg",
    "q56_date_functions",
    # Queries whose implementation changed this round (distributed shard
    # packing, brute-force guard rework, CC checkpoint option, the
    # MinHash multiply-mod family) — external re-verification required.
    "q77_token_shards",
    "q31_embedding_topk",
    "q72_dup_clusters",
    "q28_minhash_lsh",
    # New this round — zero external rows anywhere else: the S10 Brother
    # scrape's exact oracle and the five added pipeline ops.
    "q83_brother_toner",
    "q84_repetition_quality",
    "q85_chunk_windows",
    "q86_ngram_collision",
    "q87_mixture_sample",
    "q88_label_centroids",
    "q89_unigram_commonness",
    "q90_bloom_decontam",
    "q91_segment_dedup",
    "q92_tfidf_topk",
    "q93_lloyd_step",
    "q94_kmeans_train",
    "q95_quality_deciles",
    "q96_source_leakage",
    "q97_sequence_spans",
    "q98_bpe_pairs",
    "q99_corpus_datasheet",
    # q38 stays for re-verification: ivf_topk gained the trained-centroids
    # parameter this round. (The rest of the r3-green backfill — q01/q08/
    # q13/q15/q21/q23/q71 — rotated out across this round's edits; all are
    # r3-green and on the bench or local-suite path regardless.)
    "q38_ivf_topk",
]

# Import-time contract checks. Explicit raises (not assert) so the
# window stays validated even under ``python -O``.
if len(GATE_ORDER) != 50:
    raise ValueError(f"GATE_ORDER must have exactly 50 entries, got {len(GATE_ORDER)}")
if len(set(GATE_ORDER)) != 50:
    raise ValueError("duplicate names in GATE_ORDER")
_missing = [n for n in GATE_ORDER if n not in _ALL]
if _missing:
    raise ValueError(f"GATE_ORDER names not in registry: {_missing}")

REGISTRY: dict[str, QuerySpec] = {
    name: QuerySpec(*_ALL[name]) for name in GATE_ORDER
}
for name, (fn, sql) in _ALL.items():
    if name not in REGISTRY:
        REGISTRY[name] = QuerySpec(fn, sql)
