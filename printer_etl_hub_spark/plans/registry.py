"""The engine's declared query surface: name → (spark_fn, oracle_sql).

``REGISTRY`` insertion order is part of the external contract: the
correctness driver gates the FIRST 50 entries each round. ``GATE_ORDER``
makes that window explicit so coverage can be rotated deliberately.

Round-7 window (executes the round-6 ledger plan exactly — VERDICT r6
"Next round" items #2 and #6):
1. q141-q148 — zero external rows (landed after the round-6 window
   filled; judge-verified exact locally in round 6). They lead.
2. Changed-impl deferrals q89/q90/q124 — carried the round-6
   materialize_release change without a window slot (named in the
   round-6 docstring); q90/q124 additionally bench-regressed ~2.2x in
   r6, so their rows double as re-verification after the re-measure.
3. q108_incremental_minhash — the streaming family's external evidence
   row (VERDICT r6 item #6): its batch flow is the one the hardened
   minhash_ingest_sink shares (band index, bucket caps, pair dedup).
4. The oldest-r4 backfill, numeric order, filling the remaining 38
   slots: q12, q14, q16-q19, q28, q31, q38-q45, q49/q50/q52-q56, q72,
   q77, q82-q88, q91, q93-q97. Displaced to round 8: q98, q99, q102,
   q104 (still r4-green; lead the next backfill).

Round-7 additions (q149-q221: nineteen waves — curation audits, QA
harnesses, index-health tables, integrity/provenance/packing audits,
dedup-impact/delta/calibration/routing/events-analytics tables) land
OUTSIDE the window
(it is full with staleness repayment) — the same deferral q106-q112,
q138-q140, and q141-q148 took; all 73 are locally oracle-verified at
sf0.001+sf0.01; q149-q198 lead round 8's window (50 slots exactly);
q199-q221 plus the r4-displaced q98/q99/q102/q104 lead round 9's
backfill.

q37 stays OUTSIDE the window by design: its estimator output has no
exact oracle (pinned by a tolerance test instead), and every gated
entry must be able to turn green. Everything not named in GATE_ORDER
follows in module order, so the full surface stays importable and
tested either way.

Rotation ledger (newest external green per query, as of the END of r6,
verified against CORRECTNESS_r01-r06):
r6: q20-q24, q26, q27, q29, q30, q32-q36, q46-q48, q51, q57-q71,
    q73-q76, q78-q80, q81, q92, q114, q123, q126, q127, q132,
    q138-q140;
r5: q01-q11, q13, q15, q25, q100, q101, q103, q105-q113, q115-q122,
    q124, q125, q128-q131, q133-q137;
r4: q12, q14, q16-q19, q28, q31, q38-q45, q49, q50, q52-q56, q72,
    q77, q82-q91, q93-q99, q102, q104;
never: q37 (by design), q141-q148 (gated THIS round — round 7),
    q149-q221 (land this round, lead round 8).
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
    # -- group 1: zero external rows (landed after the r6 window filled)
    "q141_gopher_rules",
    "q142_repetition_fractions",
    "q143_kn_score",
    "q144_langid_margin",
    "q145_mixture_weights",
    "q146_threshold_sweep",
    "q147_ngram_novelty",
    "q148_length_moments",
    # -- group 2: changed-impl deferrals from r6 (materialize_release)
    "q89_unigram_commonness",
    "q90_bloom_decontam",
    "q124_vocab_coverage",
    # -- group 3: streaming family's external evidence row (VERDICT r6 #6)
    "q108_incremental_minhash",
    # -- group 4: oldest-r4 backfill, numeric order (q98/q99/q102/q104
    #    displaced to round 8)
    "q12_point_lookup",
    "q14_group_representative",
    "q16_rollup",
    "q17_setops",
    "q18_json_extract",
    "q19_catalog_lookup",
    "q28_minhash_lsh",
    "q31_embedding_topk",
    "q38_ivf_topk",
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
    "q72_dup_clusters",
    "q77_token_shards",
    "q82_embedding_dedup",
    "q83_brother_toner",
    "q84_repetition_quality",
    "q85_chunk_windows",
    "q86_ngram_collision",
    "q87_mixture_sample",
    "q88_label_centroids",
    "q91_segment_dedup",
    "q93_lloyd_step",
    "q94_kmeans_train",
    "q95_quality_deciles",
    "q96_source_leakage",
    "q97_sequence_spans",
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
