"""Scalar function library — every reference scalar op as a native Column.

All functions here return ``pyspark.sql.Column`` expressions built from
JVM-side built-ins (whole-stage-codegen'd; no Python in the hot path).
See SURVEY.md §2.6 for the reference-operator ↔ function mapping.
"""

from .normalize import (  # noqa: F401
    BAD_VALUE_SENTINELS,
    bytes_to_text,
    canonicalize_id,
    dash_if_blank,
    is_bad_value,
    norm_text,
    norm_ws,
    normalize_color,
    safe_bigint,
    sanitize_control_chars,
    split_postal,
    status_online_offline,
)
from .extract import (  # noqa: F401
    clamp_pct,
    compute_supply_percent,
    error_code,
    friendly_color,
    hr_error_flags,
    pct_with_symbol,
    severity_rank,
    severity_tag_snmp,
    toner_type_display,
    triage_three,
)
from .text import (  # noqa: F401
    char_ngrams,
    doc_fingerprint64,
    lang_id,
    quality_features,
    simhash16,
    tokenize,
    word_shingles,
)
