"""The engine's declared query surface: name → (spark_fn, oracle_sql).

``REGISTRY`` insertion order is part of the external contract: the
correctness driver gates the FIRST 50 entries each round. ``GATE_ORDER``
makes that window explicit so coverage can be rotated deliberately.

Round-5 window (staleness-driven rotation, per the round-4 plan):
1. q106-q120 — the zero-external-row set: the seven operators that
   landed after the round-4 window filled (judge-verified locally in
   round 4) plus this round's eight additions (q113 SQ8, q114 ANN
   recall, q115 domain cap, q116 bigram LM, q117 epoch upsample, q118
   hard negatives, q119 substring runs, q120 BPE apply). They lead.
2. q02-q07/q09-q11 — rotate back as promised in round 4; their newest
   external green row is round 2.
3. q100/q101/q103/q105 (+q109 in group 1) — re-verification of the
   queries whose implementation changed THIS round (cache-release
   materialization in SemDeDup/PQ, the q103 single-pass continuation
   counts, the q105 vocab-weighted CMS build, the q109 max-derived
   fresh keys).
4. Backfill from the round-3-green set (45 queries, all equally stale).
   Deferred to round 6: the TPC-H pack (q35, q57-q70 — textbook SQL
   with the strongest local coverage and zero drift since round 3) and
   the group-4 bottom displaced by the round-5 additions (q71,
   q73-q76, q78-q80 by q113-q120; q33/q34/q36/q46/q47/q48/q51,
   q29/q30/q32, and q20-q24/q26/q27 by q121-q137 — all covered by the
   local oracle-diff suite and unit tests every session). Round 6
   should lead with THOSE.
5. q121-q137 (the round-5 later waves: boilerplate excision,
   winnowing + match pairs, DSIR importance, vocab coverage, overlap
   stitching, LSH recall, source divergence, TS subsequence search,
   tokenizer fertility, span corruption, PageRank, lexical diversity,
   Heaps curve, quality keeper, decontaminated split, drop ledger) —
   never externally gated, so they take the bottom of this round's
   window. The last displacements (q20-q24/q26/q27, all r3-green) are
   re-evidenced through this round's gated compositions where their
   semantics compose (q23 exact-dedup keeper ⊂ q137; q25's score is
   kept in-window and is also ⊂ q135/q137) and by the batch≡stream
   equivalence tests (q20/q21).

q37 stays OUTSIDE the window by design: its estimator output has no
exact oracle (pinned by a tolerance test instead), and every gated
entry must be able to turn green. Everything not named in GATE_ORDER
follows in module order, so the full surface stays importable and
tested either way.

Rotation ledger (newest external green per query, as of r4):
r4: q12-q19(6), q28, q31, q38-q45, q49-q56(8), q72, q77, q81-q105;
r3: q01, q08, q13, q15, q20-q27, q29, q30, q32-q36, q46-q48, q51,
    q57-q70, q71, q73-q76, q78-q80;
r2: q02-q07, q09-q11; never: q106-q137 (all gated this round), q37
(by design).
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
    # -- group 1: zero external rows (landed after the r4 window filled,
    #    plus the round-5 additions q113-q118)
    "q106_jl_project",
    "q107_pq_adc_topk",
    "q108_incremental_minhash",
    "q109_scd2_merge",
    "q110_scd2_asof",
    "q111_event_funnel",
    "q112_cohort_retention",
    "q113_sq8_quantize",
    "q114_ann_recall",
    "q115_domain_cap",
    "q116_bigram_lm_score",
    "q117_epoch_upsample",
    "q118_hard_negatives",
    "q119_shared_substring_runs",
    "q120_bpe_apply",
    # -- group 2: rotate back, newest green = round 2
    "q02_bad_value_filter",
    "q03_normalize_projection",
    "q04_enrichment_join",
    "q05_postal_split",
    "q06_pivot_orderstatus",
    "q07_first_per_slot",
    "q09_top2_per_group",
    "q10_dedup_keep_first",
    "q11_collect_sorted",
    # -- group 3: implementation changed this round, re-verify
    "q100_semantic_dedup",
    "q101_pq_encode",
    "q103_kn_ngram_stats",
    "q105_cms_heavy_hitters",
    # -- group 4: round-3-green backfill (TPC-H pack q35/q57-q70
    #    deferred to round 6; new round-5 queries displace from here,
    #    bottom first — q71/q73-q76/q78-q80 displaced by q113-q120)
    "q01_pricing_summary",
    "q08_severity_argmax",
    "q13_merge_upsert",
    "q15_window_running",
    "q25_quality_score",
    # -- group 5: the round-5 new waves (q121-q130) — never externally
    #    gated; they take the bottom of the window, displacing the
    #    r3-green q33/q34/q36/q46/q47/q48/q51 and q29/q30/q32 to the
    #    round-6 backfill. q29's exact truth CTE chain is re-evidenced
    #    THROUGH q126's oracle this round; q32's sign-LSH carries an r4
    #    row via q82.
    "q121_boilerplate_filter",
    "q122_winnowing",
    "q123_dsir_importance",
    "q124_vocab_coverage",
    "q125_overlap_stitch",
    "q126_lsh_recall",
    "q127_source_divergence",
    "q128_ts_pattern_search",
    "q129_tokenizer_fertility",
    "q130_span_corruption",
    "q131_winnow_matches",
    "q132_pagerank",
    "q133_lexical_diversity",
    "q134_vocab_growth",
    "q135_quality_keeper",
    "q136_decontaminated_split",
    "q137_drop_ledger",
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
