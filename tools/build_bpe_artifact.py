"""Build the released BPE artifacts (run once; outputs are committed):

1. ``youtube_etl_project_spark/functions/bpe_merges_v1.txt`` — merges
   trained deterministically on the 128 lowest-doc_id sf0.01 documents.
2. ``tests/fixtures/bpe_token_counts_v1.parquet`` — golden
   ``(content_md5, n_tokens_bpe)`` for every distinct document text across
   the sf0.001/sf0.01/sf0.1 fixtures, counted with the frozen merges.
   The DuckDB oracles of text_token_count_bpe / pack_sequences_bpe join
   this table on ``md5(text)``, turning the formerly rows-only BPE
   queries into hash-checked ones at any fixture scale.

Re-run only when the tokenizer version is deliberately bumped; the
training is deterministic, so a re-run over unchanged fixtures is a
no-op diff.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youtube_etl_project_spark.functions import bpe  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
GOLDEN = os.path.join(REPO, "tests", "fixtures", "bpe_token_counts_v1.parquet")


def main() -> None:
    sample = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM read_parquet('/root/testdata/sf0.01/documents.parquet') "
            "ORDER BY doc_id LIMIT 128"
        ).fetchall()
    ]
    merges = bpe.train_bpe(sample, n_merges=200)
    bpe.save_merges(merges, bpe.MERGES_V1)
    print(f"wrote {len(merges)} merges -> {bpe.MERGES_V1}")

    rank = {p: i for i, p in enumerate(merges)}

    def count(text: str) -> int:
        return sum(bpe._encode_word(w.encode("utf-8"), rank) for w in bpe.pretokenize(text))

    seen: dict[str, int] = {}
    for d in SF_DIRS:
        for (text,) in duckdb.sql(
            f"SELECT DISTINCT text FROM read_parquet('{d}/documents.parquet')"
        ).fetchall():
            key = hashlib.md5(text.encode("utf-8")).hexdigest()
            if key not in seen:
                seen[key] = count(text)

    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE g (content_md5 VARCHAR, n_tokens_bpe BIGINT)"
    )
    con.executemany("INSERT INTO g VALUES (?, ?)", list(seen.items()))
    con.execute(f"COPY (SELECT * FROM g ORDER BY content_md5) TO '{GOLDEN}' (FORMAT PARQUET)")
    print(f"wrote {len(seen)} golden counts -> {GOLDEN}")


if __name__ == "__main__":
    main()
