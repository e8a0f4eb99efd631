"""DataFrame→DataFrame operators (SURVEY.md §2.3-2.5 + training-data ops)."""

from .argmax import argmax_per_group, top_k_per_group  # noqa: F401
from .cms import cms_build, cms_estimate  # noqa: F401
from .dedup import (  # noqa: F401
    boilerplate_filter,
    dedup_exact,
    minhash_band_index,
    minhash_index_join,
    minhash_index_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    semantic_dedup,
    simhash_docs,
    winnow_fingerprints,
    winnow_match_pairs,
)
from .pivot import first_per_slot_pivot, varbind_pivot  # noqa: F401
from .profile import hot_keys, partition_histogram, profile_columns  # noqa: F401
from .similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    ivf_topk,
    jl_project,
    kmeans_fit,
    pq_adc_topk,
    pq_train_encode,
    sign_lsh_pairs,
)
from .upsert import merge_upsert, scd2_apply  # noqa: F401
