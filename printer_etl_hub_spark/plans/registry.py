"""The engine's declared query surface: name → (spark_fn, oracle_sql).

``REGISTRY`` insertion order is part of the external contract: the
correctness driver gates the FIRST 50 entries each round. ``GATE_ORDER``
makes that window explicit so coverage can be rotated deliberately.

Round-13 window (executes the round-12 pre-committed backfill plan —
VERDICT r12 "Next round" item #1): the r7 remainder in numeric
order leads (q72, q77, q82-q91, q93-q97, q108, q124, q141-q148 —
27 queries; the r12 pre-commit prose miscounted this cohort as 26,
so one fewer r8 slot fits than it predicted), then the 13 round-12
additions (q279-q291: Welch t, Spearman rho, Cramér's V, Wilcoxon
signed-rank, Brown-Forsythe, Cohen's kappa, Calinski-Harabasz,
Davies-Bouldin, temperature mixture, dim robust scaling, Pettitt
changepoint, CUPED, McNemar — each oracle-verified exact at
sf0.001 + sf0.01 in-session at r12, each with a SCALE wave-31..36
clone invariant AND an independent Python formula pin), then the
r8 cohort (q149-q198) in numeric order to fill the 50 slots
(q149-q158 fit; q159-q198 lead round 14).

Round-14 backfill plan (pre-committed): the r8 remainder in numeric
order (q159-q198 — 40), then the round-13 additions q292-q313 (22:
log-rank, Cliff's delta, Cochran's Q, Ljung-Box, binned drift,
Durbin-Watson, silhouette, runs test, ANOVA F, curriculum phases,
Cohen's d, Mantel-Haenszel, Fleiss' kappa, Chow, classical
decomposition, forecast scorecard, language-bias AUC, Brier
calibration, Friedman/Kendall W, negbin fit, Grubbs, sampling-gate
KS — each oracle-verified exact at sf0.001 + sf0.01 in-session at
r13, each with a SCALE wave-37..40 clone invariant AND an
independent Python pin) — 40 + 22 > 50, so the window is q159-q198
then q292-q301, and q302-q313 lead the round-15 additions block. Binding rule, as every round:
r8-remainder-then-r13-additions in numeric order, truncated at 50.

q37 stays OUTSIDE the window by design: its estimator output has no
exact oracle (pinned by a tolerance test instead), and every gated
entry must be able to turn green. Everything not named in GATE_ORDER
follows in module order, so the full surface stays importable and
tested either way.

Rotation ledger (newest external green per query, as of the END of
r12, verified against CORRECTNESS_r01-r12):
r12: q76, q78-q81, q92, q114, q123, q126, q127, q132, q138-q140,
    q266-q278, q12, q14, q16-q19, q28, q31, q38-q45, q49, q50,
    q52-q56 (all 50; CORRECTNESS_r12 ≡ the round-12 GATE_ORDER);
r11: q255-q265, q135-q137, q20-q24, q26, q27, q29, q30, q32-q36,
    q46-q48, q51, q57-q71, q73-q75;
r10: q241-q254, q02, q04, q06, q08-q11, q13, q15, q25, q100, q101,
    q103, q105-q107, q109-q113, q115-q122, q125, q128-q131, q133,
    q134;
r9: q199-q240, q98, q99, q102, q104, q01, q03, q05, q07;
r8: q149-q198;
r7: q72, q77, q82-q91, q93-q97, q108, q124, q141-q148;
never: q37 (by design), q292-q313 (landed round 13 AFTER that round's
    window was committed; oracle-verified exact at sf0.001 + sf0.01
    in-session at r13 and pre-committed to the round-14 window).
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
    # Round-13 window (executes the round-12 pre-committed backfill
    # plan - VERDICT r12 "Next round" item #1): the 27 r7-remainder
    # queries lead, then the 13 round-12 additions (q279-q291, first
    # external gate), then the r8 cohort in numeric order until the
    # 50 slots fill (through q158; q159 onward rolls to round 14).
    "q72_dup_clusters",
    "q77_token_shards",
    "q82_embedding_dedup",
    "q83_brother_toner",
    "q84_repetition_quality",
    "q85_chunk_windows",
    "q86_ngram_collision",
    "q87_mixture_sample",
    "q88_label_centroids",
    "q89_unigram_commonness",
    "q90_bloom_decontam",
    "q91_segment_dedup",
    "q93_lloyd_step",
    "q94_kmeans_train",
    "q95_quality_deciles",
    "q96_source_leakage",
    "q97_sequence_spans",
    "q108_incremental_minhash",
    "q124_vocab_coverage",
    "q141_gopher_rules",
    "q142_repetition_fractions",
    "q143_kn_score",
    "q144_langid_margin",
    "q145_mixture_weights",
    "q146_threshold_sweep",
    "q147_ngram_novelty",
    "q148_length_moments",
    "q279_welch_t",
    "q280_spearman_rho",
    "q281_cramers_v",
    "q282_wilcoxon_signed",
    "q283_brown_forsythe",
    "q284_cohens_kappa",
    "q285_calinski_harabasz",
    "q286_davies_bouldin",
    "q287_temperature_mixture",
    "q288_dim_robust_scaling",
    "q289_pettitt",
    "q290_cuped",
    "q291_mcnemar",
    "q149_pii_density",
    "q150_label_outliers",
    "q151_effective_tokens",
    "q152_minhash_calibration",
    "q153_crosslingual_dups",
    "q154_rare_tokens",
    "q155_degree_histogram",
    "q156_quality_dup_crosstab",
    "q157_collocations",
    "q158_langid_confusion",
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
