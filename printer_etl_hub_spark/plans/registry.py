"""The engine's declared query surface: name → (spark_fn, oracle_sql).

``REGISTRY`` insertion order is part of the external contract: the
correctness driver gates the FIRST 50 entries each round. ``GATE_ORDER``
makes that window explicit so coverage can be rotated deliberately.

Round-9 window (executes the round-8 ledger plan exactly — VERDICT r8
"Next round" item #1): q199-q221 (the remaining 23 round-7 additions),
the r4-displaced q98/q99/q102/q104, the 19 round-8 additions
(q222-q240), and the 4 free slots filled with the oldest-evidence r5
queries q01/q03/q05/q07 — 50 slots exactly. After this window
executes, every ever-gated query's newest external green is round 5
or newer, and the additions backlog is fully repaid.

Round-10 backfill plan (pre-committed): the 14 round-9 additions lead
the window — q241_brand_affinity, q242_lang_propagation,
q243_cooc_window, q244_audience_overlap, q245_pca_power,
q246_rank_tau, q247_ltv_cohorts, q248_hybrid_fusion, q249_daily_acf,
q250_ab_experiment, q251_markov_stationary,
q252_seasonality_strength, q253_histogram_quantiles,
q254_pca_scores — and the remaining 36 slots go to the
oldest-evidence r5 cohort in numeric order (q02, q04, q06, q08-q11,
q13, q15, q25, q100, q101, q103, q105-q107, q109-q113, q115-q122,
q125, q128-q131, q133-q137 — 39 queries; the 3 left over lead
round 11 with the rest of r5/r6).

q37 stays OUTSIDE the window by design: its estimator output has no
exact oracle (pinned by a tolerance test instead), and every gated
entry must be able to turn green. Everything not named in GATE_ORDER
follows in module order, so the full surface stays importable and
tested either way.

Rotation ledger (newest external green per query, as of the END of r8,
verified against CORRECTNESS_r01-r08):
r8: q149-q198 (all 50; CORRECTNESS_r08 ≡ the round-8 GATE_ORDER);
r7: q12, q14, q16-q19, q28, q31, q38-q45, q49, q50, q52-q56, q72,
    q77, q82-q91, q93-q97, q108, q124, q141-q148;
r6: q20-q24, q26, q27, q29, q30, q32-q36, q46-q48, q51, q57-q71,
    q73-q76, q78-q80, q81, q92, q114, q123, q126, q127, q132,
    q138-q140;
r5: q01-q11, q13, q15, q25, q100, q101, q103, q105-q107, q109-q113,
    q115-q122, q125, q128-q131, q133-q137;
r4: q98, q99, q102, q104 (displaced twice; gated THIS round — r9);
never: q37 (by design), q199-q221 (landed round 7, judge-verified
    exact locally in both r7 and r8 sessions; gated THIS round — r9),
    q222-q240 (landed round 8, judge-verified exact that session;
    gated THIS round — r9).
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
    # Round-9 window (executes the round-8 ledger plan exactly —
    # VERDICT r8 "Next round" item #1): the remaining 23 round-7
    # additions (q199-q221), the r4-displaced four (q98/q99/q102/q104),
    # the 19 round-8 additions (q222-q240), and the 4 free slots filled
    # with the oldest-evidence r5 queries (q01/q03/q05/q07).
    "q199_gate_pass_rates",
    "q200_budget_allocation",
    "q201_source_containment_matrix",
    "q202_shard_balance",
    "q203_component_cohesion",
    "q204_referential_integrity",
    "q205_order_balance",
    "q206_value_sanity",
    "q207_key_uniqueness",
    "q208_windowed_funnel",
    "q209_rfm_segments",
    "q210_lsh_pr",
    "q211_freshness_audit",
    "q212_graph_triangles",
    "q213_top_paths",
    "q214_weekly_drift",
    "q215_clustering_coeff",
    "q216_robust_outliers",
    "q217_pit_feature_join",
    "q218_key_skew",
    "q219_neardup_survivorship",
    "q220_head_share",
    "q221_depth_revenue",
    "q98_bpe_pairs",
    "q99_corpus_datasheet",
    "q102_leakage_safe_split",
    "q104_bm25_topk",
    "q222_zipf_curve",
    "q223_effective_vocab",
    "q224_class_weights",
    "q225_reliability_bins",
    "q226_user_gini",
    "q227_degree_assortativity",
    "q228_ewma_anomaly",
    "q229_dow_profile",
    "q230_cusum_changepoint",
    "q231_brand_hhi",
    "q232_stratified_split",
    "q233_ks_drift",
    "q234_join_cardinality",
    "q235_balanced_sample",
    "q236_range_splits",
    "q237_funnel_latency",
    "q238_cell_purity",
    "q239_inter_event_gaps",
    "q240_kcore",
    "q01_pricing_summary",
    "q03_normalize_projection",
    "q05_postal_split",
    "q07_first_per_slot",
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
