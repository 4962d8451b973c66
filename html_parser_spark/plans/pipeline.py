"""The production extraction pipeline plan.

North-rule shape (BASELINE.json): Iceberg-table-in → explicit
url-hash repartition with salting for skewed giant documents →
vectorized parse/extract → checkpointed Iceberg-table-out with
per-partition lineage + metrics, resumable from the last committed
snapshot, scaling ≥0.8 efficiency from N to 4N executors.

In-sandbox the Iceberg catalog is stood in for by parquet directories
(the plan's dataflow — snapshot-dedup anti-join, atomic append, lineage
columns — is identical; swap ``format("parquet")`` for
``format("iceberg")`` + a catalog on a real cluster).

Why each piece exists at 10^12-document scale:

- ``salted_repartition``: html sizes are Zipf-ish; a pure
  ``repartition(hash(url))`` puts multi-MB giants next to thousands of
  small pages and the straggler partition dominates wall-clock (AQE skew
  handling only rebalances *joins/aggs*, not ``mapInPandas``). We salt
  by size class: giant docs spread across ``salt_buckets`` partitions.
- ``resume_filter``: a left **anti join** of the source against the
  already-committed output keys. On Iceberg this reads only the
  ``url`` column of committed snapshots (column pruning), and Spark
  broadcast-joins it when small or shuffle-joins both sides when not —
  either way the re-run never re-parses committed documents.
- ``run_report``: per-partition counters aggregated JVM-side
  (groupBy/sum — a map-side-combinable agg, one small shuffle).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import extract_pages

BIG_DOC_BYTES = 1 << 20  # 1 MiB: size class boundary for salting


def configure(builder_or_spark=None, cpus: int | None = None,
              shuffle_partitions: int | None = None,
              arrow_batch: int = 64):
    """Build (or tune) a SparkSession for the extraction workload.

    - Arrow batches capped at ``arrow_batch`` docs (cells are MB-scale;
      the 10k default would build multi-GB Arrow buffers).
    - AQE on: runtime coalescing of the post-shuffle partitions.
    - ``files.maxPartitionBytes`` left at default for parquet; on Iceberg
      use the table's split size.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(2 * cpus, 8)
    b = builder_or_spark or SparkSession.builder
    if isinstance(b, SparkSession):
        return b
    return (b.master(f"local[{cpus}]")
            .appName("html-parser-spark")
            # deterministic timestamp semantics for the window oracles
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                    str(arrow_batch))
            # html cells are KB-MB and the per-byte python parse cost is
            # ~100× a columnar scan's, so the default 128 MB splits leave
            # the scan/shuffle-map stage under-parallelized: a 16 MB split
            # still amortizes parquet open cost but keeps every core busy
            .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
            # v2 committer: task-side renames, O(1) driver-side job commit
            # (v1's serial driver rename of hundreds of task files becomes
            # the scaling bottleneck once the parse itself is fast)
            .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
            .config("spark.python.worker.reuse", "true")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
            .getOrCreate())


def salted_repartition(pages: DataFrame, num_partitions: int,
                       big_doc_bytes: int = BIG_DOC_BYTES,
                       giant_fanout: int = 4) -> DataFrame:
    """Skew-aware url-hash repartition (size-class salting).

    For ``mapInPandas`` the unit of work is the *partition*, so the
    straggler risk is a partition whose byte-weight (not row count) is
    dominated by multi-MB giant documents — AQE skew handling only
    rebalances joins/aggs, not arbitrary python stages. The fix is a
    size-class split:

    - normal docs shuffle on ``xxhash64(url, salt)`` into
      ``num_partitions`` (uniform rows, uniform bytes);
    - giant docs (> ``big_doc_bytes``) shuffle into
      ``num_partitions * giant_fanout`` much finer partitions, bounding
      giants-per-partition near one so no task carries several.

    Everything is deterministic in the url (no RNG): a retried task
    re-derives the same placement.
    """
    h = F.xxhash64("url")
    giants = (pages.filter(F.length("html") > big_doc_bytes)
              .repartition(num_partitions * giant_fanout, h))
    normal = (pages.filter(F.length("html") <= big_doc_bytes)
              .repartition(num_partitions, h))
    return normal.unionByName(giants)


def skew_isolate(pages: DataFrame, giant_partitions: int,
                 big_doc_bytes: int = BIG_DOC_BYTES) -> DataFrame:
    """Shuffle only the skew tail (the default plan).

    Normal documents stay on their scan splits — with
    ``files.maxPartitionBytes`` at 16 MB the per-task byte-weight is
    already bounded, and an embarrassingly-parallel parse needs no
    co-location — so <1% of corpus bytes move. Giant documents (the
    straggler risk: several multi-MB docs clumped in one split) get
    their own fine-grained partitions, ~1 doc each, via a deterministic
    url-hash shuffle. At 100 TB this is the difference between
    shuffling 100 TB and shuffling <1 TB.

    Costs one extra scan of the source (two filters); scans are cheap
    relative to the parse, and on Iceberg the giant side could instead
    be planned from file/row-group size metadata without a second pass.
    """
    h = F.xxhash64("url")
    giants = (pages.filter(F.length("html") > big_doc_bytes)
              .repartition(giant_partitions, h))
    normal = pages.filter(F.length("html") <= big_doc_bytes)
    return normal.unionByName(giants)


def resume_filter(pages: DataFrame, output_path: str) -> DataFrame:
    """Drop documents whose url is already committed at output_path
    (checkpoint resume — snapshot-based, not streaming)."""
    spark = pages.sparkSession
    try:
        done = spark.read.parquet(output_path).select("url")
    except Exception:  # first run: nothing committed yet
        return pages
    return pages.join(done, "url", "left_anti")


def incremental_extract(old: DataFrame, new: DataFrame,
                        old_extracted: DataFrame,
                        giant_partitions: int = 64) -> DataFrame:
    """Re-crawl incremental extraction — parse only what changed.

    Given the previous crawl snapshot ``old``, the fresh snapshot
    ``new`` (both ``(url, html)``), and the committed extraction of
    the previous crawl ``old_extracted`` (``(url, text)`` — on a real
    store, the output table ``run_extraction`` wrote), produce the
    full ``(url, text)`` extraction of the NEW snapshot while running
    the parse kernel only over ``changed ∪ new`` urls:

    - ``operators.snapshots.snapshot_diff`` classifies urls by
      16-byte content digests (the diff itself shuffles digests, not
      page bytes; the tiny (url, status) result is materialized once
      via eager localCheckpoint because three consumers branch off
      it);
    - changed/new pages go through the production skew-isolated parse;
    - unchanged urls carry their committed text forward with one
      url equi-join (digest equality guarantees byte-identical html,
      and the extractor is a pure function of the bytes). An
      unchanged url MISSING from ``old_extracted`` — the previous run
      crashed between crawl commit and extraction commit, exactly the
      partial-commit case the resume machinery exists for — is routed
      into the parse set instead of being silently dropped;
    - ``gone`` urls simply drop out.

    At a ~90%-unchanged re-crawl the parse kernel — the actual cost —
    runs over ~10% of bytes. The work-list ⋈ new-snapshot join is an
    equi-join on url: broadcast when the change set is small, and
    shuffle-free at 10^12 docs only if the crawl store is bucketed by
    url (``write_bucketed``) — on an unbucketed store it degrades to
    one corpus-sized exchange of the NEW snapshot, still strictly
    cheaper than the full parse it replaces, but it is that layout,
    not this operator, that keeps page bytes off the wire.
    """
    from ..operators.snapshots import snapshot_diff

    # eager localCheckpoint, not persist(): three consumers branch off
    # the tiny (url, status) diff, so it must materialize once — but a
    # CacheManager-pinned persist() leaks the block until an explicit
    # unpersist nobody downstream can safely issue (the returned plan
    # still references it). RDD-level checkpoint blocks are released
    # by the ContextCleaner when the frame is garbage-collected.
    diff = snapshot_diff(old, new).localCheckpoint(eager=True)
    keep = diff.where(F.col("status") == "unchanged").select("url")
    committed_urls = old_extracted.select("url")
    missing = keep.join(committed_urls, "url", "left_anti")
    work = (diff.where(F.col("status").isin("changed", "new"))
            .select("url")
            .unionByName(missing))
    to_parse = new.select("url", "html").join(work, "url")
    parsed = extract_pages(skew_isolate(to_parse, giant_partitions),
                           with_spans=False).select("url", "text")
    carried = old_extracted.select("url", "text").join(keep, "url")
    return parsed.unionByName(carried)


def run_extraction(spark: SparkSession, pages: DataFrame, output_path: str,
                   num_partitions: int | None = None, resume: bool = True,
                   with_spans: bool = True, plan: str = "isolate") -> dict:
    """End-to-end job: resume-filter → skew-aware partitioning →
    extract → atomic append → run report. Returns the report dict.

    ``plan``: "isolate" (default — shuffle only giant docs),
    "full" (url-hash repartition of everything + giant fanout, for when
    downstream wants url co-location), or "none" (trust scan splits).
    """
    if resume:
        pages = resume_filter(pages, output_path)
    parts = num_partitions or spark.sparkContext.defaultParallelism * 2
    if plan == "full":
        parted = salted_repartition(pages, parts)
    elif plan == "none":
        parted = pages
    else:
        parted = skew_isolate(pages, parts)
    result = extract_pages(parted, with_spans=with_spans)
    # tag rows with this run's id so the report covers exactly what
    # THIS run wrote — on a resumed output path the committed table
    # holds earlier runs too (whole-table totals stay a separate field)
    rid = uuid.uuid4().hex
    result = result.withColumn("run_id", F.lit(rid))
    t0 = time.monotonic()
    result.write.mode("append").parquet(output_path)
    wall = time.monotonic() - t0
    # mergeSchema: a resumed output path may hold files written by a
    # pre-run_id version of this job (no run_id column); plain schema
    # inference could then pick a file without the column and make the
    # filter below fail to resolve. Old rows surface run_id=NULL and
    # are excluded by the equality filter, which is what we want.
    committed = spark.read.option("mergeSchema", "true") \
        .parquet(output_path)
    report = run_report(committed.filter(F.col("run_id") == rid))
    report["run_id"] = rid
    report["wall_s"] = round(wall, 3)
    report["table_docs"] = _table_rows_from_metadata(committed)
    return report


def _table_rows_from_metadata(committed: DataFrame) -> int:
    """Whole-table row count from parquet footer metadata only — no
    data scan. A ``committed.count()`` here would re-read the entire
    output path per run, a hidden full pass over 10^12 committed rows.
    Footers carry exact row counts (sum of row-group num_rows); on an
    Iceberg catalog this becomes the current snapshot's
    ``total-records`` summary property — same O(metadata) cost.

    The file list comes from the READER (``inputFiles()``), never a
    directory walk: Spark's listing excludes ``_temporary``/``_*``
    artifacts a crashed earlier attempt may have left behind (the
    resume path exists precisely because that happens), and it works
    on any filesystem URI. Local files read their footers via
    pyarrow; non-local schemes (hdfs/s3a on a real cluster) fall back
    to a count() — correct everywhere, and on those deployments the
    Iceberg snapshot property replaces this function anyway."""
    import urllib.parse

    import pyarrow.parquet as pq

    total = 0
    for uri in committed.inputFiles():
        if uri.startswith("file:"):
            # inputFiles() returns URIs, so a path containing spaces
            # or other reserved characters arrives percent-encoded —
            # decode before handing it to the filesystem
            path = urllib.parse.unquote(uri[len("file:"):])
            while path.startswith("//"):
                path = path[1:]
        elif "://" not in uri:
            path = uri
        else:
            return committed.count()
        try:
            total += pq.ParquetFile(path).metadata.num_rows
        except (OSError, ValueError):
            # unreadable path (symlinked mount, odd escaping) OR a
            # corrupt/truncated footer — pyarrow raises ArrowInvalid,
            # which subclasses ValueError, not OSError. Fall back to
            # the scan rather than crash the run report.
            return committed.count()
    return total


def run_report(out: DataFrame) -> dict:
    """Aggregate per-partition lineage counters into a run report.
    All JVM-side: one partial-aggregated shuffle over tiny data."""
    per_part = (out.groupBy("part_id")
                .agg(F.count("*").alias("docs"),
                     F.approx_count_distinct("url").alias("approx_urls"),
                     F.sum("html_bytes").alias("bytes"),
                     F.sum("n_errors").alias("errors"),
                     F.sum("n_tokens").alias("tokens"),
                     F.sum("n_elements").alias("elements"),
                     F.sum(F.col("truncated").cast("long")).alias("truncated"))
                .collect())
    total = {
        "docs": sum(r["docs"] for r in per_part),
        "bytes": int(sum(r["bytes"] or 0 for r in per_part)),
        "errors": int(sum(r["errors"] or 0 for r in per_part)),
        "tokens": int(sum(r["tokens"] or 0 for r in per_part)),
        "elements": int(sum(r["elements"] or 0 for r in per_part)),
        "truncated": int(sum(r["truncated"] or 0 for r in per_part)),
        "approx_unique_urls": int(sum(r["approx_urls"] for r in per_part)),
        "partitions": len(per_part),
    }
    total["per_partition"] = {int(r["part_id"]): int(r["docs"])
                              for r in per_part}
    return total


def write_bucketed(df: DataFrame, table_name: str, n_buckets: int = 64,
                   key: str = "url") -> None:
    """Write the extraction output as a url-hash-bucketed (and
    per-bucket sorted) table. Downstream url-keyed work — exact dedup,
    resume anti-joins, text-hash verification joins, recrawl diffs —
    then reads pre-co-located data: Spark's bucketing metadata lets a
    join or aggregation on ``key`` skip its Exchange entirely, which
    at 10^12 rows is the difference between a metadata lookup and
    re-shuffling the whole corpus. (Parquet stand-in for the Iceberg
    table the north rule names; a catalog swap keeps the same call.)

    The repartition-by-key BEFORE the write is load-bearing: a bare
    bucketBy write makes EVERY upstream task write one file per bucket
    it touches (tasks × n_buckets files — the classic bucketed-write
    small-file explosion; ~12,800 files at 200 shuffle partitions ×
    64 buckets). Hash-repartitioning into n_buckets on the bucket key
    first means each task holds exactly one bucket → one file per
    bucket."""
    (df.repartition(n_buckets, F.col(key))
       .write
       .mode("overwrite")
       .bucketBy(n_buckets, key)
       .sortBy(key)
       .saveAsTable(table_name))  # managed: bucket metadata in the catalog
