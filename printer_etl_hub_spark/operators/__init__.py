"""DataFrame→DataFrame operators (SURVEY.md §2.3-2.5 + training-data ops)."""

from .argmax import argmax_per_group, top_k_per_group  # noqa: F401
from .dedup import (  # noqa: F401
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_docs,
)
from .pivot import first_per_slot_pivot, varbind_pivot  # noqa: F401
from .similarity import cosine_topk_bruteforce, ivf_topk, sign_lsh_pairs  # noqa: F401
from .upsert import merge_upsert  # noqa: F401
