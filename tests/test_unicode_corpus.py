"""Cross-engine oracle sweep over a MULTILINGUAL corpus.

The sf corpora are ASCII; this sweep re-runs the most text-keyed oracle
comparisons over Hebrew/CJK/Cyrillic/Korean/emoji/accented text
(scripts/build_unicode_corpus.py) so the md5/tokenize/regex paths are
pinned portable on real multibyte content, not just ASCII. The FULL
97-query sweep also passes over this corpus (verified round 4); CI runs
the text-keyed subset to bound suite time — widen via
``SPARK_GRAFT_TEST_SF=/tmp/peh_unicode_corpus pytest tests/test_oracle_diff.py``.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from printer_etl_hub_spark.plans import REGISTRY

#: The queries whose oracle keys derive from document TEXT (digest, shingle,
#: token, segment, or pair keys) — the surface multibyte content stresses.
TEXT_KEYED = [
    "q23_dedup_exact",
    "q26_token_count",
    "q27_fingerprint",
    "q28_minhash_lsh",
    "q29_ngram_jaccard",
    "q30_simhash",
    "q72_dup_clusters",
    "q73_corpus_clean",
    "q91_segment_dedup",
    "q96_source_leakage",
    "q98_bpe_pairs",
    # Round-4 additions whose oracle keys hash or tokenize raw text:
    "q102_leakage_safe_split",
    "q103_kn_ngram_stats",
    "q105_cms_heavy_hitters",
    # Round-5 additions keyed on span hashes / char grams / bigram hashes:
    "q121_boilerplate_filter",
    "q122_winnowing",
    "q123_dsir_importance",
    "q125_overlap_stitch",
    "q126_lsh_recall",
    "q129_tokenizer_fertility",
    "q130_span_corruption",
    "q131_winnow_matches",
    "q132_pagerank",
    "q133_lexical_diversity",
    "q134_vocab_growth",
    "q135_quality_keeper",
    "q136_decontaminated_split",
    "q137_drop_ledger",
    "q140_crop_pairs",
    # Round-6/7 waves keyed on raw text, char counts, or token hashes —
    # multibyte text stresses length() vs codepoints, replace() symbol
    # counting, md5-of-text digests, and token-keyed joins:
    "q141_gopher_rules",
    "q142_repetition_fractions",
    "q143_kn_score",
    "q147_ngram_novelty",
    "q149_pii_density",
    "q151_effective_tokens",
    "q152_minhash_calibration",
    "q153_crosslingual_dups",
    "q154_rare_tokens",
    "q155_degree_histogram",
    "q157_collocations",
    "q160_sentence_stats",
    "q161_template_prefixes",
    "q163_incremental_exact_dedup",
    # Round-7 third batch: q166's length()/regexp counting must agree on
    # multibyte codepoints; q167/q169 key on raw tokens; q170/q171 hash
    # multibyte shingles; q172 scores multibyte text.
    "q166_char_class_profile",
    "q167_source_vocab_overlap",
    "q169_token_burstiness",
    "q170_cluster_spread",
    "q171_band_bucket_stats",
    "q172_quality_histogram",
    # Round-7 fifth wave: q179 groups raw multibyte tokens; q180 md5s
    # multibyte text AND hashes multibyte shingles; q181 counts
    # multibyte tokens; q182 hashes multibyte shingles through the
    # pair generator.
    "q179_token_df_spectrum",
    "q180_source_dup_matrix",
    "q181_chunk_plan",
    "q182_band_config_sweep",
    # Round-7 sixth wave: q183 hashes multibyte shingles and counts
    # multibyte tokens through the sharder; q185 counts multibyte
    # tokens through five window budgets.
    "q183_shard_leakage",
    "q185_packing_sweep",
    # Round-7 waves 7-9: q186/q195 hash multibyte shingles through the
    # pair generator; q187/q193 concat and length-count multibyte text
    # (length() must agree on code points, not bytes); q189's
    # alpha-ratio regex strips multibyte letters identically; q190
    # groups raw multibyte bigrams; q194 md5s multibyte text.
    "q186_dup_cluster_sizes",
    "q187_corpus_delta",
    "q189_len_quality_corr",
    "q190_kn_band_routing",
    "q193_vocab_drift",
    "q194_dedup_adjusted_mixture",
    "q195_containment_pairs",
    # Round-7 wave 10: q197 digests multibyte suffix tokens; q198
    # hashes multibyte shingles through the cross-postings join; q199
    # regex-counts multibyte letters through q141's rules; q200 token-
    # counts multibyte text into the apportionment.
    "q197_template_suffixes",
    "q198_snapshot_neardup",
    "q199_gate_pass_rates",
    "q200_budget_allocation",
    # Round-7 wave 11: q201/q203 hash multibyte shingles through the
    # containment/Jaccard pair generators; q202 token-counts multibyte
    # text through the sharder.
    "q201_source_containment_matrix",
    "q202_shard_balance",
    "q203_component_cohesion",
    # Round-7 wave 13: q210 hashes multibyte shingles through both pair
    # generators.
    "q210_lsh_pr",
    # Round-7 wave 14: q212 hashes multibyte shingles into the triangle
    # joins.
    "q212_graph_triangles",
    "q215_clustering_coeff",
    "q219_neardup_survivorship",
    # Round-8 additions: q222/q223 tokenize and count multibyte types
    # (the doubling-ratio tie-break and c^2 sums must agree on code
    # points); q225 md5s multibyte text into digest groups and regex-
    # strips multibyte letters in the quality score; q227 hashes
    # multibyte shingles through the pair generator into the degree
    # moments; q232/q235 md5 multibyte-keyed doc ids (ids are numeric,
    # but the per-source strata ARE the multibyte sources).
    "q222_zipf_curve",
    "q223_effective_vocab",
    "q225_reliability_bins",
    "q227_degree_assortativity",
    "q232_stratified_split",
    "q235_balanced_sample",
    # q240 hashes multibyte shingles through the pair generator into
    # six peel rounds.
    "q240_kcore",
    # Round-9 additions: q242 hashes multibyte shingles through the
    # pair generator and votes on multibyte lang labels (lexicographic
    # tie-break must agree on non-ASCII label strings too); q243 keys
    # pairs on raw multibyte tokens with least/greatest string
    # comparisons; q246 ranks multibyte-sourced quality scores (the
    # alpha-ratio regex strips multibyte letters identically in both
    # engines).
    "q242_lang_propagation",
    "q243_cooc_window",
    "q246_rank_tau",
    # Round-10 addition: q255 md5s multibyte 20-token windows and
    # reassembles kept_text from multibyte tokens (single-space joins
    # must agree with DuckDB's string_agg on non-ASCII).
    "q255_exactsubstr",
    # Round-10 additions: q256 ranks multibyte keywords (token
    # tie-break compares non-ASCII strings identically cross-engine);
    # q257's length buckets, 8-char prefixes, and Levenshtein must all
    # count CHARACTERS, not bytes, identically on multibyte text.
    "q256_chi2_keyness",
    "q257_edit_dups",
    # Round-11 addition: q267 counts code points on raw multibyte text
    # (the documented reason it never lowers before length()).
    "q267_gopher_rules",
    # Round-12 additions: q283's length histogram and per-source
    # lower-median count multibyte TOKENS (whitespace split of lowered
    # text must agree cross-engine on non-ASCII); q284's stop-word
    # classifier tokenizes the same lowered multibyte stream.
    "q283_brown_forsythe",
    "q284_cohens_kappa",
]


@pytest.fixture(scope="module")
def uni_dir():
    from build_unicode_corpus import build

    dst = "/tmp/peh_unicode_corpus"
    if not os.path.exists(f"{dst}/documents.parquet"):
        build(dst)
    return dst


@pytest.fixture(scope="module")
def uni_duck(uni_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{uni_dir}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", TEXT_KEYED)
def test_text_keyed_query_matches_oracle_on_unicode(name, spark, uni_dir, uni_duck):
    from test_oracle_diff import _cells_equal, _normalize

    spec = REGISTRY[name]
    got = spec.fn(spark, uni_dir).toPandas()
    want = uni_duck.execute(spec.oracle_sql).df()
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
