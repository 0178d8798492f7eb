"""Invariants of the dataset-assembly queries (queries/pipeline.py)
that the oracle hash can't see: the hash proves the numbers agree with
DuckDB, these prove the numbers mean what the pipeline needs."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _q(spark, name):
    from mapreduce_framework_spark.registry import get_query

    return get_query(name).fn(spark, SF_DIR)


def test_split_is_disjoint_and_exhaustive(spark):
    """Every document lands in exactly one split, and the split is a
    pure function of doc_id (re-running yields the identical layout)."""
    from mapreduce_framework_spark.io import table

    res = _q(spark, "split_train_eval").collect()
    n_docs = table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in res) == n_docs
    assert {r.split for r in res} == {"train", "eval"}
    again = _q(spark, "split_train_eval").collect()
    assert sorted(map(tuple, res)) == sorted(map(tuple, again))


def test_split_fraction_near_twelve_sixteenths(spark):
    res = _q(spark, "split_train_eval").collect()
    train = sum(r.n_docs for r in res if r.split == "train")
    total = sum(r.n_docs for r in res)
    # md5 hex digit < 'c' → 12/16 expected; loose bound for small SF.
    assert 0.55 <= train / total <= 0.9


def test_pack_conserves_tokens_and_is_contiguous(spark):
    """Shards partition each source's token stream: per-source shard
    token sums equal the source's total tokens, and shard ids are the
    contiguous range 0..max (no gaps — a gap would mean a lost span)."""
    from mapreduce_framework_spark.io import table

    d = table(spark, SF_DIR, "documents")
    totals = {
        r.source: r.total
        for r in d.groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("total"))
        .collect()
    }
    per_source: dict[str, list] = {}
    for r in _q(spark, "pack_sequences").collect():
        per_source.setdefault(r.source, []).append(r)
    assert set(per_source) == set(totals)
    for source, rows in per_source.items():
        assert sum(r.shard_tokens for r in rows) == totals[source]
        ids = sorted(r.shard_id for r in rows)
        assert ids == list(range(len(ids)))
