"""Regression tests for short-document edge cases (round-2 ADVICE).

``sequence(1, greatest(size - k, 0))`` crashed on docs with fewer tokens
than the gram width (sequence(1,0) -> [1,0], slice start 0 throws), while
the DuckDB oracles returned zero rows for the same docs. These tests run
the gram-based operators against a fixture of pathologically short docs
(0..5 tokens) and require exact oracle parity.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from kafka_hadoop_consumer_spark.queries import QUERIES
from kafka_hadoop_consumer_spark.queries.dedup import shingles
from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def short_dir(spark, tmp_path_factory):
    """A documents.parquet of short docs, in the fixture schema."""
    d = tmp_path_factory.mktemp("shortdocs")
    texts = [
        "",  # split('') -> [''] (one empty token)
        "one",
        "one two",
        "one two three",
        "one two three four",
        "one two three four five",
        "dup dup dup dup dup dup",
    ]
    rows = [(i, t, "en", "unit", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def short_oracle(short_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{short_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


def test_shingles_short_docs(spark, short_dir):
    from kafka_hadoop_consumer_spark.catalog import load_table

    sh = shingles(load_table(spark, short_dir, "documents")).collect()
    by_doc = {}
    for r in sh:
        by_doc.setdefault(r.doc_id, set()).add(r.sh)
    # docs 0..3 have < 4 tokens -> no shingles; doc 4 has exactly one
    assert all(i not in by_doc for i in (0, 1, 2, 3))
    assert by_doc[4] == {"one two three four"}
    assert by_doc[5] == {"one two three four", "two three four five"}


@pytest.mark.parametrize(
    "name",
    [
        "q_text_ngram",
        "q_text_repetition",
        "q_dedup_ngram_jaccard",
        "q_text_stats",
        # round-3 gram/chunk-based additions
        "q_dedup_substring",
        "q_dedup_span_scrub",
        "q_text_bpe_encode",
    ],
)
def test_short_docs_match_oracle(spark, short_oracle, short_dir, name):
    assert_matches_oracle(spark, short_oracle, name, sf_dir=short_dir)


def test_rows_only_short_docs(spark, short_dir):
    """Hash-dependent gram ops must at least run cleanly on short docs."""
    for name in ("q_dedup_minhash", "q_dedup_simhash", "q_text_fingerprint"):
        QUERIES[name](spark, short_dir).count()
