"""Text-analysis scalar functions for training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting, document
fingerprinting, shingling, and the hash primitives behind MinHash / SimHash
dedup. Everything is a native Column expression over arrays (no explode
needed for per-doc signatures, no Python UDFs) — at 100 TB these run inside
whole-stage codegen with zero shuffle until the dedup join itself.

Cross-engine determinism: hashes are md5-based (identical in Spark and
DuckDB), array folds are per-row, and every float fold is sequential —
so the DuckDB oracle can reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword sets for the n-gram/heuristic language ID.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "zu"),
    "es": ("el", "la", "de", "que", "y", "los", "un", "es"),
    "fr": ("le", "la", "les", "et", "des", "un", "est", "que"),
}


def tokenize(col: Column) -> Column:
    """Whitespace tokenizer: lower + trim + split on runs of whitespace."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token array.

    Returns an empty array when the doc has fewer than ``n`` tokens.
    The shingle set feeds MinHash (`operators/dedup.py`).
    """
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + k).cast("int")) for k in range(n)]
        ),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(tokens) >= n, F.array_distinct(sh)).otherwise(empty)


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams of a (lowercased) string."""
    s = F.lower(col)
    idx = F.sequence(F.lit(1), F.length(s) - (n - 1))
    grams = F.array_distinct(F.transform(idx, lambda i: F.substring(s, i, n)))
    empty = F.array().cast("array<string>")
    return F.when(F.length(s) >= n, grams).otherwise(empty)


def minhash_component(shingles: Column, seed: int) -> Column:
    """One MinHash signature component: min over md5("{seed}:"+shingle).

    Lexicographic min of a keyed md5 hex digest is a valid min-wise
    independent permutation surrogate, and — unlike xxhash — is computable
    identically in DuckDB for the oracle. Null when the shingle set is empty.
    """
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def minhash_signature(shingles: Column, k: int = 12) -> list[Column]:
    """k MinHash components (list of Columns, one per seed)."""
    return [minhash_component(shingles, i) for i in range(k)]


def simhash16(tokens: Column) -> Column:
    """16-bit SimHash over the distinct-token set.

    Bit b of each token comes from the first 4 hex digits of its md5; bit b
    of the document is 1 when strictly more tokens set the bit than clear it.
    """
    toks = F.array_distinct(tokens)
    n = F.size(toks)

    def bit_set(b: int):
        return lambda t: (
            F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int").bitwiseAND(F.lit(1 << b))
            != 0
        )

    out = F.lit(0)
    for b in range(16):
        votes = F.size(F.filter(toks, bit_set(b)))
        out = out + F.when(votes * 2 > n, F.lit(1 << b)).otherwise(F.lit(0))
    return out.cast("int")


def doc_fingerprint64(col: Column) -> Column:
    """60-bit document fingerprint: md5 of the whitespace-normalized text,
    first 15 hex digits as a bigint (DuckDB-reproducible)."""
    norm = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("bigint")


def stopword_count(tokens: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def lang_id(tokens: Column) -> Column:
    """Heuristic language ID: argmax stopword count with a fixed tie order
    (en > de > es > fr > unknown). Returns 'unknown' when no stopwords hit."""
    scores = {lang: stopword_count(tokens, lang) for lang in STOPWORDS}
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, "unknown")
    for lang in ("en", "de", "es", "fr"):
        expr = expr.when(scores[lang] == best, lang)
    return expr.otherwise("unknown")


def quality_features(text: Column, tokens: Column) -> dict[str, Column]:
    """Quality-scoring features: lengths, ratios, and a composite score.

    All arithmetic is per-row double math (bit-identical across engines).
    """
    n_chars = F.length(text).cast("bigint")
    n_tokens = F.size(tokens).cast("bigint")
    alpha_chars = F.length(F.regexp_replace(F.lower(text), r"[^a-z]", "")).cast("bigint")
    stop_en = stopword_count(tokens, "en").cast("bigint")
    avg_token_len = F.when(
        n_tokens > 0,
        (n_chars - (n_tokens - 1)).cast("double") / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tokens > 0, stop_en.cast("double") / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_chars > 0, alpha_chars.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + alpha_ratio * 0.3
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": avg_token_len,
        "stopword_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio,
        "quality_score": score,
    }


# ---------------------------------------------------------------------------
# Corpus cleaning (training-data prep): HTML strip, PII redaction.
# All native regexp Column expressions — the regex subset used is valid in
# both Java (Spark) and RE2-ish (DuckDB) dialects so cleaning is
# oracle-checkable cross-engine.
# ---------------------------------------------------------------------------

#: Conservative cross-dialect PII patterns (no lookaround, no \b ambiguity).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
PHONE_RE = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"


def strip_html(col: Column) -> Column:
    """Drop tags, unescape the five XML entities, collapse whitespace.

    Tag regex is non-greedy per-tag (`<[^>]*>`) — linear scan, safe for
    arbitrary corpus bytes (never backtracks across tags).
    """
    no_tags = F.regexp_replace(col, "<[^>]*>", " ")
    unescaped = no_tags
    for ent, ch in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"),
    ):
        unescaped = F.replace(unescaped, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(unescaped, "\\s+", " "))


def redact_pii(col: Column) -> Column:
    """Mask emails, IPv4s, and phone-ish digit runs with typed tokens.

    Order matters: emails first (their local part would otherwise be
    phone-matched), then IPs (dotted quads would phone-match), then phones.
    """
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")
