"""Reference job-contract parity tests (compat.run_job).

The reference's user surface is mapfunc(path)->dict / reducefunc(path)
->dict over text shards (workerimpl.cc:155-247).  These tests prove:
the contract runs unchanged, matches the declarative fast path, writes
the reference's sink layout (R key:value files), and is closed under
composition (output is valid input — design.md:74).
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from mapreduce_framework_spark import compat
from tests.conftest import SF_DIR


def _corpus(spark, tmpdir: str) -> str:
    from mapreduce_framework_spark.io import table

    path = os.path.join(tmpdir, "corpus")
    table(spark, SF_DIR, "documents").select("text").write.mode("overwrite").text(path)
    return path


def test_job_matches_declarative_wordcount(spark):
    from mapreduce_framework_spark.registry import get_query

    with tempfile.TemporaryDirectory() as tmp:
        got = compat.run_job(
            spark,
            _corpus(spark, tmp),
            compat.make_wordcount_mapfunc(),
            compat.make_wordcount_reducefunc(),
            num_reducers=4,
        )
        fast = get_query("wordcount").fn(spark, SF_DIR)
        got_rows = sorted((r["key"], r["value"]) for r in got.collect())
        fast_rows = sorted((r["word"], r["cnt"]) for r in fast.collect())
        assert got_rows == fast_rows


def test_sink_layout_one_file_per_reducer(spark):
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "out")
        compat.run_job(
            spark,
            _corpus(spark, tmp),
            compat.make_wordcount_mapfunc(),
            compat.make_wordcount_reducefunc(),
            num_reducers=5,
            output_path=out,
        ).collect()
        parts = glob.glob(os.path.join(out, "part-*"))
        assert len(parts) == 5  # out_<r> per reducer, workerimpl.cc:319-333
        with open(parts[0], encoding="utf-8") as f:
            first = f.readline().rstrip("\n")
        key, _, value = first.rpartition(":")
        assert key and int(value) >= 1  # key:value line format


def test_closure_under_composition(spark):
    """Job output feeds a second job unchanged (design.md:74).  Second
    job: tally value-sum per first letter of each word."""

    def second_mapfunc(path):
        counts: dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                key, _, value = line.rpartition(":")
                counts[key[0]] = counts.get(key[0], 0) + int(value)
        return counts

    with tempfile.TemporaryDirectory() as tmp:
        out1 = os.path.join(tmp, "out1")
        first = compat.run_job(
            spark,
            _corpus(spark, tmp),
            compat.make_wordcount_mapfunc(),
            compat.make_wordcount_reducefunc(),
            num_reducers=3,
            output_path=out1,
        )
        second = compat.run_job(
            spark,
            out1,
            second_mapfunc,
            compat.make_wordcount_reducefunc(),
            num_reducers=2,
        )
        expect = {
            r["key"]: r["total"]
            for r in first.groupBy(F.substring("key", 1, 1).alias("key"))
            .agg(F.sum("value").alias("total"))
            .collect()
        }
        got = {r["key"]: r["value"] for r in second.collect()}
        assert got == expect


def test_kv_text_roundtrip_preserves_colon_keys(spark):
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "kv")
        df = spark.createDataFrame(
            [("plain", 1), ("with:colon", 2), ("a:b:c", -3)], schema=compat.KV_SCHEMA
        )
        compat.write_kv_text(df, out)
        back = compat.read_kv_text(spark, out)
        assert sorted(map(tuple, back.collect())) == [
            ("a:b:c", -3),
            ("plain", 1),
            ("with:colon", 2),
        ]


def test_explicit_mapper_count(spark):
    """num_mappers forces the reference's M: the map stage runs exactly
    M tasks (observable as M distinct spool partitions)."""
    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as tmp:
        corpus = _corpus(spark, tmp)

        def counting_mapfunc(path):
            counts = {}
            with open(path, encoding="utf-8") as f:
                for line in f:
                    for w in line.strip().lower().split(" "):
                        if w:
                            counts[w] = counts.get(w, 0) + 1
            return counts

        got = compat.run_job(
            spark,
            corpus,
            counting_mapfunc,
            compat.make_wordcount_reducefunc(),
            num_mappers=7,
            num_reducers=2,
        )
        # Correctness unchanged under forced M
        base = compat.run_job(
            spark, corpus, counting_mapfunc, compat.make_wordcount_reducefunc(),
            num_reducers=2,
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, base.collect()))
