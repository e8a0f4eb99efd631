#!/usr/bin/env python
"""Build a multilingual documents corpus for cross-engine sweeps.

Hebrew, CJK, Cyrillic, Korean, emoji, and accented Latin text drawn from
the PORTABLE script families (tests/test_cross_engine_hash.py), with
planted cross-source exact duplicates — every other table copied from
sf0.001 so the full registry runs unchanged. Deterministic (seeded).

Usage: python scripts/build_unicode_corpus.py [dest_dir]
"""

from __future__ import annotations

import os
import random
import sys

SRC = "/root/testdata/sf0.001"
DEFAULT_DST = "/tmp/peh_unicode_corpus"

FRAGMENTS = [
    "שלום עולם מדפסת דוח",
    "日本語 テスト 中文 文档 数据",
    "emoji \U0001F600 mixed",
    "café naïve résumé",
    "STRASSE ß GROSS",
    "table scan merge join",
    "печать отчёт данные",
    "한국어 문서 처리",
]


def build(dst: str = DEFAULT_DST) -> str:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    rng = random.Random(13)
    rows = []
    for i in range(200):
        n = rng.randint(3, 40)
        words: list[str] = []
        for _ in range(n):
            words.extend(rng.choice(FRAGMENTS).split())
        text = " ".join(words[: n * 3])
        lang = rng.choice(["en", "de", "es", "fr", "zh"])
        rows.append((i, text, lang, f"src{rng.randint(0, 5)}", len(text)))
    for j in range(20):  # exact duplicates across sources (q23/q96 food)
        base = rows[j]
        rows.append((1000 + j, base[1], base[2], f"src{(j + 1) % 6}", base[4]))
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", rows)
    con.execute(
        f"COPY (SELECT * FROM docs ORDER BY doc_id) "
        f"TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    return dst


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_DST))
