"""The recall harnesses' sampling knobs (round-6 advice item #4): at
100x the EXACT ground-truth side must price at sample size, not corpus
size. Contracts pinned here:

- frac=1.0 is the oracle-gated default and the sampled paths never
  perturb it (the gate itself runs via test_oracle_diff.py);
- the sample is a deterministic md5 gate — rerunning reproduces it;
- q114's sampled run is BIT-IDENTICAL to the full run filtered to the
  sampled queries (candidates stay the full corpus), and its exact side
  provably restricts the query side of the theta-join (plan check);
- q126/q138 sampled runs evaluate only in-sample ids.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from printer_etl_hub_spark.plans.common import md5_sample_gate
from printer_etl_hub_spark.plans.textops import (
    q114_ann_recall,
    q126_lsh_recall,
    q138_adc_recall,
)
from printer_etl_hub_spark.tables import load_tables

from conftest import SF_SMOKE


def _gate_ids(spark, table, id_col, frac, salt):
    t = load_tables(spark, SF_SMOKE)[table]
    return {
        r[0]
        for r in t.filter(md5_sample_gate(F.col(id_col), frac, salt=salt))
        .select(id_col)
        .collect()
    }


def test_q114_sampled_equals_full_restricted(spark):
    spark.catalog.clearCache()
    full = {r.vec_id: r for r in q114_ann_recall(spark, SF_SMOKE).collect()}
    sampled = {
        r.vec_id: r for r in q114_ann_recall(spark, SF_SMOKE, sample_frac=0.5).collect()
    }
    want_ids = _gate_ids(spark, "embeddings", "vec_id", 0.5, "annq")
    # non-trivial sample, strictly smaller than the corpus
    assert sampled and want_ids and set(sampled) == want_ids < set(full)
    # candidates stay the FULL corpus: every sampled row bit-equals the
    # full run's row for that query
    for vid, r in sampled.items():
        f = full[vid]
        assert (r.n_hits, r.k_found, r.recall) == (f.n_hits, f.k_found, f.recall), vid


def test_q114_sampled_exact_side_restricts_query_side(spark):
    """Plan check: the md5 gate must sit UNDER the exact side's theta-join
    (on its query side), so the ground truth prices at |sample|·|corpus|.
    The gate compiles to pmod(conv(substring(md5(...)))); the unsampled
    plan contains no pmod at all, so its presence below the join is the
    restriction."""
    df = q114_ann_recall(spark, SF_SMOKE, sample_frac=0.5)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # Anchor on the Join NODE carrying the a_id != b_id condition (a line
    # containing both "Join" and a negated vid equality) rather than the
    # exact literal "NOT (vid" — plan-printing details vary across Spark
    # versions but a theta-join prints as a Join node with its condition.
    m = re.search(r"Join\b[^\n]*NOT[^\n]*vid", plan)
    assert m, plan[:3000]
    join_at = m.start()
    assert "pmod" in plan[join_at:], plan[join_at : join_at + 3000]
    full_plan = (
        q114_ann_recall(spark, SF_SMOKE)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "pmod" not in full_plan


def test_q126_sampled_subcorpus_only_and_deterministic(spark):
    spark.catalog.clearCache()
    a = {
        (r.a_id, r.b_id, r.jaccard, r.lsh_hit)
        for r in q126_lsh_recall(spark, SF_SMOKE, sample_frac=0.6).collect()
    }
    b = {
        (r.a_id, r.b_id, r.jaccard, r.lsh_hit)
        for r in q126_lsh_recall(spark, SF_SMOKE, sample_frac=0.6).collect()
    }
    assert a == b  # deterministic sample, no RNG
    want_ids = _gate_ids(spark, "documents", "doc_id", 0.6, "lshdoc")
    assert all(x in want_ids and y in want_ids for (x, y, _, _) in a)
    full = {(r.a_id, r.b_id) for r in q126_lsh_recall(spark, SF_SMOKE).collect()}
    assert {(x, y) for (x, y, _, _) in a} < full or len(a) < len(full)


def test_q138_sampled_subcorpus_only(spark):
    spark.catalog.clearCache()
    rows = q138_adc_recall(spark, SF_SMOKE, sample_frac=0.5).collect()
    assert rows
    want_ids = _gate_ids(spark, "embeddings", "vec_id", 0.5, "adcs")
    assert {r.vec_id for r in rows} <= want_ids
    again = q138_adc_recall(spark, SF_SMOKE, sample_frac=0.5).collect()
    assert {(r.vec_id, r.true_dist, r.adc_hit) for r in rows} == {
        (r.vec_id, r.true_dist, r.adc_hit) for r in again
    }
