"""Structured Streaming ingestion: same kernel, checkpointed file
source/sink, exactly-once across restarts."""

from __future__ import annotations

import shutil
import tempfile

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from html_parser_spark.plans.pipeline import configure
    s = configure(cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_stream_extract_and_resume(spark):
    from html_parser_spark.sources.pages import pages_df
    from html_parser_spark.streaming import stream_extract

    tmp = tempfile.mkdtemp(prefix="hps_stream_")
    try:
        pages = pages_df(spark, SF_DIR).cache()
        half_a = pages.filter(F.crc32("url") % 2 == 0)
        half_b = pages.filter(F.crc32("url") % 2 == 1)

        # first drop of files → drain with availableNow
        half_a.repartition(4).write.parquet(f"{tmp}/src")
        q = stream_extract(spark, f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt")
        q.awaitTermination(120)
        n1 = spark.read.parquet(f"{tmp}/out").count()
        assert 0 < n1 < 500

        # second drop lands later → restart picks up ONLY the new files
        half_b.repartition(4).write.mode("append").parquet(f"{tmp}/src")
        q = stream_extract(spark, f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt")
        q.awaitTermination(120)
        out = spark.read.parquet(f"{tmp}/out")
        assert out.count() == 500
        assert out.select("url").distinct().count() == 500  # exactly-once

        # extracted text identical to the batch-path goldens
        j = out.join(pages.select("url", F.col("text").alias("golden")),
                     "url")
        assert j.filter(F.col("text") != F.col("golden")).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
