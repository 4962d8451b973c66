"""Structured Streaming ingestion variant of the extraction pipeline.

The reference is strictly batch (document-at-a-time library calls) and
the north rule's resumability is snapshot-based batch; this module adds
the Spark-native *continuous ingestion* shape for crawl feeds that land
as files: ``readStream`` on the pages table directory → the same
``mapInPandas`` parse/extract kernel → checkpointed ``writeStream``.
Exactly-once comes from Spark's streaming checkpoint (source offsets +
file-sink log) instead of the batch anti-join.
"""

from .ingest import (stream_extract, stream_links,  # noqa: F401
                     stream_recrawl)
