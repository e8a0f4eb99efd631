"""The engine's declared query surface: name → (spark_fn, oracle_sql).

``REGISTRY`` insertion order is part of the external contract: the
correctness driver gates the FIRST 50 entries each round. ``GATE_ORDER``
makes that window explicit so coverage can be rotated deliberately.

Round-10 window (executes the round-9 pre-committed backfill plan
exactly — VERDICT r9 "Next round" item #1): the 14 round-9 additions
lead (q241-q254), then the 36 oldest-evidence r5 queries in numeric
order (q02, q04, q06, q08-q11, q13, q15, q25, q100, q101, q103,
q105-q107, q109-q113, q115-q122, q125, q128-q131, q133, q134) —
50 slots exactly.

Round-11 backfill plan (pre-committed): the round-10 additions lead
the window, then the three r5 leftovers (q135_quality_keeper,
q136_decontaminated_split, q137_drop_ledger) and the r6 cohort in
numeric order (q20-q24, q26, q27, q29, q30, q32-q36, q46-q48, q51,
q57-q71, q73-q76, q78-q81, q92, q114, q123, q126, q127, q132,
q138-q140) until the 50 slots fill; whatever r6 queries don't fit
lead round 12 with the r7 cohort.

q37 stays OUTSIDE the window by design: its estimator output has no
exact oracle (pinned by a tolerance test instead), and every gated
entry must be able to turn green. Everything not named in GATE_ORDER
follows in module order, so the full surface stays importable and
tested either way.

Rotation ledger (newest external green per query, as of the END of r9,
verified against CORRECTNESS_r01-r09):
r9: q199-q240, q98, q99, q102, q104, q01, q03, q05, q07 (all 50;
    CORRECTNESS_r09 ≡ the round-9 GATE_ORDER);
r8: q149-q198 (all 50; CORRECTNESS_r08 ≡ the round-8 GATE_ORDER);
r7: q12, q14, q16-q19, q28, q31, q38-q45, q49, q50, q52-q56, q72,
    q77, q82-q91, q93-q97, q108, q124, q141-q148;
r6: q20-q24, q26, q27, q29, q30, q32-q36, q46-q48, q51, q57-q71,
    q73-q76, q78-q80, q81, q92, q114, q123, q126, q127, q132,
    q138-q140;
r5: q02, q04, q06, q08-q11, q13, q15, q25, q100, q101, q103,
    q105-q107, q109-q113, q115-q122, q125, q128-q131, q133-q137;
never: q37 (by design), q241-q254 (landed round 9, judge-verified
    exact twice that session; gated THIS round — r10), q255-q265
    (landed round 10 AFTER this round's window was committed;
    oracle-verified exact at sf0.001 + sf0.01 in-session and
    pre-committed to LEAD the round-11 window above).
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
    # Round-10 window (executes the round-9 pre-committed backfill plan
    # exactly — VERDICT r9 "Next round" item #1): the 14 round-9
    # additions (q241-q254) lead, then the 36 oldest-evidence r5
    # queries in numeric order.
    "q241_brand_affinity",
    "q242_lang_propagation",
    "q243_cooc_window",
    "q244_audience_overlap",
    "q245_pca_power",
    "q246_rank_tau",
    "q247_ltv_cohorts",
    "q248_hybrid_fusion",
    "q249_daily_acf",
    "q250_ab_experiment",
    "q251_markov_stationary",
    "q252_seasonality_strength",
    "q253_histogram_quantiles",
    "q254_pca_scores",
    "q02_bad_value_filter",
    "q04_enrichment_join",
    "q06_pivot_orderstatus",
    "q08_severity_argmax",
    "q09_top2_per_group",
    "q10_dedup_keep_first",
    "q11_collect_sorted",
    "q13_merge_upsert",
    "q15_window_running",
    "q25_quality_score",
    "q100_semantic_dedup",
    "q101_pq_encode",
    "q103_kn_ngram_stats",
    "q105_cms_heavy_hitters",
    "q106_jl_project",
    "q107_pq_adc_topk",
    "q109_scd2_merge",
    "q110_scd2_asof",
    "q111_event_funnel",
    "q112_cohort_retention",
    "q113_sq8_quantize",
    "q115_domain_cap",
    "q116_bigram_lm_score",
    "q117_epoch_upsample",
    "q118_hard_negatives",
    "q119_shared_substring_runs",
    "q120_bpe_apply",
    "q121_boilerplate_filter",
    "q122_winnowing",
    "q125_overlap_stitch",
    "q128_ts_pattern_search",
    "q129_tokenizer_fertility",
    "q130_span_corruption",
    "q131_winnow_matches",
    "q133_lexical_diversity",
    "q134_vocab_growth",
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
