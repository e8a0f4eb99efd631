#!/usr/bin/env python
"""Build a pathological-shape documents corpus for boundary sweeps.

One 5 000-token document (oracle-tractable; the engine itself was timed
fine at 50 000), single-character docs, whitespace-padded and
tab-separated text, token counts pinned exactly AT the 13-gram and
10-token-segment boundaries (and one below / one above each), a 30-copy
exact-duplicate block spread across sources, and regex metacharacters.
Every other table is copied from sf0.001. Deterministic (seeded).

Usage: python scripts/build_pathological_corpus.py [dest_dir]
"""

from __future__ import annotations

import os
import random
import shutil
import sys

SRC = "/root/testdata/sf0.001"
DEFAULT_DST = "/tmp/peh_pathological_corpus"


def build(dst: str = DEFAULT_DST) -> str:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    rng = random.Random(99)
    rows = [
        (0, " ".join(f"w{rng.randint(0, 50)}" for _ in range(5000)), "en", "src0", 0),
    ]
    for i in range(1, 6):  # single-character docs
        rows.append((i, chr(96 + i), "en", "src1", 1))
    rows.append((6, "   padded   doc   ", "de", "src2", 18))
    rows.append((7, "\t tab\tseparated \t", "de", "src2", 17))
    for i, n in ((8, 13), (9, 12), (10, 14)):  # 13-gram boundary
        rows.append((i, " ".join(f"t{j}" for j in range(n)), "es", "src3", n))
    for i, n in ((11, 10), (12, 9), (13, 11)):  # segment boundary
        rows.append((i, " ".join(f"s{j}" for j in range(n)), "fr", "src4", n))
    for i in range(20, 50):  # 30-way exact-duplicate block
        rows.append(
            (i, "dup dup dup content block alpha beta gamma delta epsilon",
             "en", f"src{i % 6}", 55)
        )
    rows.append((50, "a.b c*d (e|f) [g] {h} \\ $ ^ + ? end", "zh", "src5", 30))
    con = duckdb.connect()
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
