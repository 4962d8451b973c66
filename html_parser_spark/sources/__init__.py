"""Sources: deterministic Common-Crawl-style ``pages`` synthesis and
checkpoint-resumable parquet/Iceberg IO.

The ``pages`` table matches ``BASELINE.json.input_hint`` exactly:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
"""

from .pages import build_page, pages_df, PAGES_SCHEMA  # noqa: F401
