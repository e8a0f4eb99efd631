"""The engine's declared query surface: name → (spark_fn, oracle_sql).

``REGISTRY`` insertion order is part of the external contract: the
correctness driver gates the FIRST 50 entries each round. ``GATE_ORDER``
makes that window explicit so coverage can be rotated deliberately.

Round-11 window (executes the round-10 pre-committed backfill plan
exactly — VERDICT r10 "Next round" item #2): the 11 round-10 additions
lead (q255-q265, so they get their first external CORRECTNESS rows),
then the three r5 leftovers (q135-q137), then the r6 cohort in numeric
order (q20-q24, q26, q27, q29, q30, q32-q36, q46-q48, q51, q57-q71,
q73-q75) — 50 slots exactly.

Round-12 backfill plan (pre-committed): the r6 leftovers (q76,
q78-q81, q92, q114, q123, q126, q127, q132, q138-q140 — 15) lead,
then the 13 round-11 additions (q266-q278: Mann-Whitney, Gopher
rules, burstiness, seq patterns, Kaplan-Meier, Holt-Winters, assoc
rules, Mann-Kendall, OLS fit, skip-grams, budget sample, deadline
funnel, Kruskal-Wallis — each oracle-verified exact at sf0.001 +
sf0.01 in-session, each with a SCALE clone invariant), then the r7
cohort in numeric order (q12, q14, q16-q19, q28, q31, q38-q45, q49,
q50, q52-q56, q72, q77 — 22 fit) to fill the 50 slots; the remaining
r7 queries (q82-q91, q93-q97, q108, q124, q141-q148) lead round 13.

q37 stays OUTSIDE the window by design: its estimator output has no
exact oracle (pinned by a tolerance test instead), and every gated
entry must be able to turn green. Everything not named in GATE_ORDER
follows in module order, so the full surface stays importable and
tested either way.

Rotation ledger (newest external green per query, as of the END of
r10, verified against CORRECTNESS_r01-r10):
r10: q241-q254, q02, q04, q06, q08-q11, q13, q15, q25, q100, q101,
    q103, q105-q107, q109-q113, q115-q122, q125, q128-q131, q133,
    q134 (all 50; CORRECTNESS_r10 ≡ the round-10 GATE_ORDER);
r9: q199-q240, q98, q99, q102, q104, q01, q03, q05, q07;
r8: q149-q198;
r7: q12, q14, q16-q19, q28, q31, q38-q45, q49, q50, q52-q56, q72,
    q77, q82-q91, q93-q97, q108, q124, q141-q148;
r6: q20-q24, q26, q27, q29, q30, q32-q36, q46-q48, q51, q57-q71,
    q73-q76, q78-q80, q81, q92, q114, q123, q126, q127, q132,
    q138-q140;
r5: q135-q137 (the rest of the r5 cohort has newer evidence above);
never: q37 (by design), q255-q265 (landed round 10 AFTER that round's
    window was committed; oracle-verified exact at sf0.001 + sf0.01
    in-session and LEADING the round-11 window above).
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
    # Round-11 window (executes the round-10 pre-committed backfill
    # plan exactly - VERDICT r10 "Next round" item #2): the 11
    # round-10 additions (q255-q265) lead, then the three r5
    # leftovers (q135-q137), then the r6 cohort in numeric order
    # until the 50 slots fill. The r6 leftovers (q76, q78-q81, q92,
    # q114, q123, q126, q127, q132, q138-q140) lead round 12 with
    # the r7 cohort.
    "q255_exactsubstr",
    "q256_chi2_keyness",
    "q257_edit_dups",
    "q258_holt_linear",
    "q259_hits",
    "q260_theil_sen",
    "q261_rrf_fusion",
    "q262_benford_audit",
    "q263_markov_attribution",
    "q264_lorenz_curve",
    "q265_winsorized_moments",
    "q135_quality_keeper",
    "q136_decontaminated_split",
    "q137_drop_ledger",
    "q20_events_tumbling",
    "q21_sessionize",
    "q22_asof_last_click",
    "q23_dedup_exact",
    "q24_lang_id",
    "q26_token_count",
    "q27_fingerprint",
    "q29_ngram_jaccard",
    "q30_simhash",
    "q32_embedding_lsh",
    "q33_multimodal_decode",
    "q34_tpch_q3",
    "q35_tpch_q5",
    "q36_salted_agg",
    "q46_asof_join",
    "q47_range_join",
    "q48_hypertable_rollup",
    "q51_token_topk",
    "q57_tpch_q6",
    "q58_tpch_q7",
    "q59_tpch_q8",
    "q60_tpch_q9",
    "q61_tpch_q13",
    "q62_tpch_q15",
    "q63_tpch_q19",
    "q64_tpch_q21",
    "q65_tpch_q22",
    "q66_tpch_q2",
    "q67_tpch_q11",
    "q68_tpch_q16",
    "q69_tpch_q20",
    "q70_tpch_q12",
    "q71_json_harvest",
    "q73_corpus_clean",
    "q74_attribution",
    "q75_stratified_sample",
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
