"""Boundary-shape oracle sweep: pathological document shapes vs DuckDB.

Exercises the arithmetic edges a uniform corpus never hits — token
counts exactly AT the n-gram/segment boundaries, a 5 000-token outlier
document, single-character and whitespace-only-adjacent text, a 30-way
duplicate block, regex metacharacters. The FULL 98-query sweep passes
over this corpus (verified round 4, ~85 s); CI runs the
boundary-sensitive subset. Widen via
``SPARK_GRAFT_TEST_SF=/tmp/peh_pathological_corpus pytest tests/test_oracle_diff.py``.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from printer_etl_hub_spark.plans import REGISTRY

#: Queries whose expressions have hard token-count boundaries (gram
#: windows, segment slicing, span packing, pair generation) or per-row
#: costs that scale with document length.
BOUNDARY_SENSITIVE = [
    "q23_dedup_exact",
    "q26_token_count",
    "q29_ngram_jaccard",
    "q73_corpus_clean",
    "q77_token_shards",
    "q84_repetition_quality",
    "q85_chunk_windows",
    "q86_ngram_collision",
    "q91_segment_dedup",
    "q96_source_leakage",
    "q97_sequence_spans",
    "q98_bpe_pairs",
    # Round-4 additions with token-count boundaries (bigram windows need
    # >= 2 tokens; CMS/BM25 hash every raw token incl. the empty-string
    # token of blank text):
    "q103_kn_ngram_stats",
    "q104_bm25_topk",
    "q105_cms_heavy_hitters",
    # Round-5 additions with span/gram/window boundaries: q121 slices
    # fixed-width segments, q122's char-gram + winnow window needs
    # >= k+w-1 chars, q123's bigram window needs >= 2 tokens, q124
    # joins the raw token stream against a cutoff-tie-broken vocab.
    "q121_boilerplate_filter",
    "q122_winnowing",
    "q123_dsir_importance",
    "q124_vocab_coverage",
    # q125's prefix/suffix slices sit AT the token-count boundary; q126
    # composes the q28/q29 pair generators; q127's zero-cell closed form
    # must hold when a source's token set is disjoint from the rest.
    "q125_overlap_stitch",
    "q126_lsh_recall",
    "q127_source_divergence",
    # q129 folds the BPE merge chain over boundary-length tokens; q130's
    # span grid sits AT the segment-width boundary.
    "q129_tokenizer_fertility",
    "q130_span_corruption",
    # q131 self-joins the winnow fingerprint sets of boundary-shaped docs.
    "q131_winnow_matches",
    # q132 iterates over the near-dup edge set the 30-way duplicate
    # block generates (dense clique + isolated nodes in one graph).
    "q132_pagerank",
    # q133's Simpson index hits the n<=1 token-count guard; q134's
    # arithmetic bucketing must hold at the id extremes.
    "q133_lexical_diversity",
    "q134_vocab_growth",
    # q135-q137 compose CC/gram/segment subtrees over the duplicate
    # block and the boundary-length docs.
    "q135_quality_keeper",
    "q136_decontaminated_split",
    "q137_drop_ledger",
    # q140's ceil-crop slices sit AT the token-count boundary.
    "q140_crop_pairs",
    # Round-6 wave: q142's dup-n-gram windows need >= n tokens; q143's
    # bigram tables need >= 2; q146 composes the pair generator at its
    # lowest cutoff; q147's gram windows sit at the 3-token boundary;
    # q148's skew guard hits 1-doc sources (variance 0).
    "q142_repetition_fractions",
    "q143_kn_score",
    "q146_threshold_sweep",
    "q147_ngram_novelty",
    "q148_length_moments",
    # Round-7 wave: q151/q155/q156 compose the pair generator + CC over
    # the 30-way duplicate block; q152's shingle sets need >= 3 words;
    # q157's bigrams need >= 2 tokens; q160 splits at punctuation-run
    # boundaries; q161 slices exactly-10-token prefixes.
    "q151_effective_tokens",
    "q152_minhash_calibration",
    "q155_degree_histogram",
    "q156_quality_dup_crosstab",
    "q157_collocations",
    "q160_sentence_stats",
    "q161_template_prefixes",
    # Round-7 third batch: q170 composes the pair generator + CC over
    # the 30-way duplicate block; q171's shingle sets need >= 3 words
    # and the duplicate block makes every bucket a 30-member clique.
    "q170_cluster_spread",
    "q171_band_bucket_stats",
    # Round-7 fifth wave: q179's distinct-token postings hit the
    # empty-string-token and single-char boundaries; q180/q182 compose
    # the pair generator (30-way duplicate block = dense pair cliques;
    # q182 additionally sums detection probabilities AT the j=1.0
    # boundary); q181's ceil-division sits exactly at the W-token
    # boundary for the 5000-token outlier (512·9+392).
    "q179_token_df_spectrum",
    "q180_source_dup_matrix",
    "q181_chunk_plan",
    "q182_band_config_sweep",
    # Round-7 sixth wave: q183 composes the pair generator + q77's
    # prefix-sum sharding over the duplicate block; q185's five
    # ceil-divisions all sit at token-count boundaries for the
    # 5000-token outlier.
    "q183_shard_leakage",
    "q185_packing_sweep",
    # Round-7 waves 7-9: q186 composes the pair generator + CC over the
    # 30-way duplicate block (its size histogram must show the 30-way
    # clique); q187/q193 derive the v2 snapshot from boundary-shaped
    # text (concat on whitespace-only docs, df deltas over the
    # duplicate block); q189 hits the n_tokens=0 / zero-variance
    # correlation guards; q190 composes q143's >= 2-token bigram
    # window; q194 digests the duplicate block (30-way keep-one) and
    # sqrt's tiny token masses; q195 composes the pair generator with
    # containment normalization at the |A|-shingle boundary.
    "q186_dup_cluster_sizes",
    "q187_corpus_delta",
    "q189_len_quality_corr",
    "q190_kn_band_routing",
    "q193_vocab_drift",
    "q194_dedup_adjusted_mixture",
    "q195_containment_pairs",
    # Round-7 wave 10: q197's last-10-token slice sits AT the length
    # boundary (len == 10 keeps exactly the whole doc); q198 composes
    # the cross-postings pair generator over the duplicate block (every
    # new doc derived from a clone matches all 30 copies); q199 rolls
    # up q141's zero-token guards; q200's floor/leftover arithmetic
    # must apportion exactly when shares tie.
    "q197_template_suffixes",
    "q198_snapshot_neardup",
    "q199_gate_pass_rates",
    "q200_budget_allocation",
    # Round-7 wave 11: q201 aggregates per-direction containment over
    # the 30-way duplicate block's dense cliques; q202 composes q77's
    # prefix-sum sharding (the 5000-token outlier straddles budgets);
    # q203 measures edge density ON the duplicate block's clique — its
    # density row must be exactly 1.0 there.
    "q201_source_containment_matrix",
    "q202_shard_balance",
    "q203_component_cohesion",
    # Round-7 wave 13: q210 composes BOTH pair generators (minhash bands
    # + exact Jaccard) over the duplicate block and full-outer joins the
    # two pair sets — band-collision and shingle boundaries together.
    "q210_lsh_pr",
    # Round-7 wave 14: q212 counts the duplicate block's 30-clique
    # triangles (C(30,3) = 4060 exactly) through the pair generator.
    "q212_graph_triangles",
    # Round-7 wave 15: q215's coefficient must be exactly 1.0 on the
    # 30-way duplicate clique and NULL on wedge-free 2-node components.
    "q215_clustering_coeff",
    # Round-7 wave 18: q219 rolls up q135's keeper election over the
    # duplicate block (exactly one keeper per 30-way clique).
    "q219_neardup_survivorship",
    # Round-8 additions: q222/q220-class rank over a vocabulary the
    # duplicate block makes extremely head-heavy (doubling ratios at
    # count ties exercise the (negc, tok) tie-break); q223's sum of c^2
    # spikes on the duplicate block (DECIMAL(38,0) path); q225 bins
    # boundary-shaped quality scores (empty/whitespace docs -> bin 0)
    # against 30-way digest groups; q227 computes Newman's r on the
    # duplicate block's regular clique (zero degree variance -> NULL
    # assortativity guard fires); q232/q235's per-source ranks must be
    # exact permutations when a source is dominated by one digest;
    # q238's argmax tie-break at identical cosines (30 identical
    # embeddings score equal against every centroid).
    "q222_zipf_curve",
    "q223_effective_vocab",
    "q225_reliability_bins",
    "q227_degree_assortativity",
    "q232_stratified_split",
    "q235_balanced_sample",
    "q238_cell_purity",
    # q240: the 30-way duplicate block IS a 2-core (peel is a no-op on
    # it); acyclic fringe must peel away within the pinned rounds and
    # the converged flag must agree cross-engine.
    "q240_kcore",
    # Round-9 additions: q242 propagates labels over the duplicate
    # block's clique (every member votes the same lang — no flips — and
    # the vote tie-break fires on cross-clique bridges); q243 indexes
    # w[i+d] AT the token-count boundary for d = 1..3 (len-2/3/4 docs
    # produce exactly their legal pairs, len-1 and empty docs none);
    # q246's top-50 head equals the WHOLE source when a source has < 50
    # docs and its all-tied quality pairs land in `tied`; q248 composes
    # q104's BM25 (empty-string tokens of blank text) with the cosine
    # top-k over 30 identical embeddings (rank tie-break by vec_id);
    # q254 projects the duplicate block's identical vectors to
    # identical scores (tie-break by vec_id at the |score| boundary).
    "q242_lang_propagation",
    "q243_cooc_window",
    "q246_rank_tau",
    "q248_hybrid_fusion",
    "q254_pca_scores",
    # Round-10 addition: q255's overlapping 20-token windows sit AT the
    # token-count boundary (len-19 docs produce no window, len-20
    # exactly one); the 30-way duplicate block must excise to empty
    # kept_text in EVERY member; the 5000-token outlier exercises the
    # interval-merge fold's linearity.
    "q255_exactsubstr",
    # Round-10 additions: q256's disjoint-vocabulary source makes every
    # kept token maximally keyed (d = n2 exactly — the 2x2 corner) and
    # the repeated-single-token doc drives a token's c_t toward n1;
    # q257's 30-way exact-duplicate block shares one (len-bucket,
    # prefix) block and must emit all C(30,2) distance-0 pairs —
    # C(30,2) < the 64-doc stop-block cap, by design.
    "q256_chi2_keyness",
    "q257_edit_dups",
    # Round-11 addition: q267 splits lines/words at the same
    # boundary shapes (empty text -> one empty token; bullet and
    # ellipsis detection on whitespace-only lines).
    "q267_gopher_rules",
    # Round-12 additions: q283's per-source lower-median sits AT the
    # token-count boundaries (single-char and 5000-token docs in one
    # source skew the deviation frame); q284 classifies the empty and
    # metacharacter documents ('unknown' ties) identically.
    "q283_brown_forsythe",
    "q284_cohens_kappa",
    # q286's pair distances must NULLIF-skip coincident label centroids
    # (the duplicate embedding block makes identical vectors common);
    # q285's scatter hits the same replicated-vector geometry.
    "q285_calinski_harabasz",
    "q286_davies_bouldin",
]


@pytest.fixture(scope="module")
def patho_dir():
    from build_pathological_corpus import build

    dst = "/tmp/peh_pathological_corpus"
    if not os.path.exists(f"{dst}/documents.parquet"):
        build(dst)
    return dst


@pytest.fixture(scope="module")
def patho_duck(patho_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{patho_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", BOUNDARY_SENSITIVE)
def test_boundary_query_matches_oracle_on_pathological(name, spark, patho_dir, patho_duck):
    from test_oracle_diff import _cells_equal, _normalize

    spec = REGISTRY[name]
    got = spec.fn(spark, patho_dir).toPandas()
    want = patho_duck.execute(spec.oracle_sql).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), f"{name} rows {len(got)} vs {len(want)}"
    g, w = _normalize(got), _normalize(want)
    for c in g.columns:
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(g[c].tolist(), w[c].tolist()))
            if not _cells_equal(x, y)
        ][:5]
        assert not bad, f"{name}.{c} first diffs: {bad}"
