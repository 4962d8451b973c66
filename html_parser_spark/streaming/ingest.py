"""Streaming extraction: file-source pages → parse/extract → sink.

Same kernel as the batch path (`operators.extract.extract_pages` —
`mapInPandas` is fully supported inside Structured Streaming since the
transformation is stateless per-row), so batch and streaming share one
tested implementation. Use `available_now=True` to drain everything
currently in the source and stop (the batch-like catch-up mode); leave
it False for continuous tailing of a crawl drop directory.

At scale: the file source tracks processed files in the checkpoint, so
a restarted job resumes at the exact file offset; giant-doc skew is
bounded by `maxFilesPerTrigger` (micro-batch sizing) rather than the
batch plan's giant repartition.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.extract import extract_pages
from ..sources.pages import PAGES_SCHEMA


def stream_extract(spark: SparkSession, source_dir: str, output_dir: str,
                   checkpoint_dir: str, available_now: bool = True,
                   max_files_per_trigger: int = 8, with_spans: bool = False):
    """Start the streaming extraction; returns the StreamingQuery."""
    src = (spark.readStream
           .schema(PAGES_SCHEMA)
           .option("maxFilesPerTrigger", str(max_files_per_trigger))
           .parquet(source_dir))
    out = extract_pages(src, with_spans=with_spans)
    writer = (out.writeStream
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
