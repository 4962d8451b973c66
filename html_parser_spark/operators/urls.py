"""URL canonicalization + crawl revisit dedup.

A crawl frontier sees the same page under many spellings — tracking
query params, fragments, host-case variants, explicit default ports —
and a pretraining pipeline collapses them *before* any content dedup
(it is free: no parse, no shuffle of page bodies, just a key rewrite).

``canonicalize`` applies the standard normalization rules that are
expressible identically in Spark (Java regex) and DuckDB (RE2), so the
oracle pins every rule:

  1. scheme + host lowercased (path case is significant, host case
     is not — RFC 3986 §6.2.2.1);
  2. explicit default port stripped (``https://h:443`` → ``https://h``,
     ``http://h:80`` → ``http://h``);
  3. query string and fragment stripped (the aggressive variant;
     production pipelines whitelist meaningful params per site — that
     table slots into the same regexp without changing the plan).

``url_dedup`` then groups by the canonical key — one map-side-combined
exchange on a short string; at 10^12 rows this is the cheapest dedup in
the whole pipeline and runs first to shrink everything downstream.

No counterpart in mensbeam/HTML-Parser (per-document parser); this is
pipeline surface above the extraction kernel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SCHEME_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def canonicalize(url: Column) -> Column:
    """Canonical form of a URL column (rules 1-3 above). Rows that do
    not look like absolute http(s) URLs pass through with only
    query/fragment stripping (scheme_host extracts as '')."""
    sh = F.lower(F.regexp_extract(url, SCHEME_HOST_RE, 0))
    rest = url.substr(F.length(sh) + F.lit(1), F.length(url))
    rest = F.regexp_replace(rest, "[?#].*$", "")
    sh = F.regexp_replace(sh, "^(https://[^/?#:]*):443$", "$1")
    sh = F.regexp_replace(sh, "^(http://[^/?#:]*):80$", "$1")
    return F.concat(sh, rest)


def url_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Collapse URL spellings: one row per canonical URL with
    (url, n_variants, n_distinct_raw, first_raw). ``first_raw`` (the
    lexicographic min of the raw spellings) is the deterministic
    representative; callers keeping payloads use ``min_by`` on their
    fetch-priority column instead — same single-exchange plan."""
    canon = canonicalize(F.col(url_col))
    return (df.groupBy(canon.alias("url"))
            .agg(F.count("*").cast("long").alias("n_variants"),
                 F.countDistinct(url_col).cast("long")
                 .alias("n_distinct_raw"),
                 F.min(url_col).alias("first_raw")))
