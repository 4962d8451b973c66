"""Single-core engine throughput probe + cProfile breakdown.

Builds the 400-doc adversarial profile sample (every doc_id 0..399
through sources.pages.build_page — the same html the corpus bench
parses), then measures parse+extract wall on ONE core, interleaved
A/B-able, and optionally prints the cProfile top sites.

Usage: python tools/profile_engine.py [n_docs] [reps] [--profile]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402


def sample(n_docs: int):
    from html_parser_spark.sources.pages import build_page
    rows = duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM "
        f"'/root/testdata/sf0.1/documents.parquet' ORDER BY doc_id "
        f"LIMIT {n_docs}").fetchall()
    pages = [build_page(d, t, lg, s)[2] for d, t, lg, s in rows]
    return pages


def one_pass(pages) -> float:
    from html_parser_spark.engine import parse
    from html_parser_spark.engine.extractor import extract_body_text
    t0 = time.perf_counter()
    for raw in pages:
        o = parse(raw)
        extract_body_text(o.document)
    return time.perf_counter() - t0


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 400
    reps = int(args[1]) if len(args) > 1 else 3
    pages = sample(n_docs)
    mb = sum(len(p) for p in pages) / 1e6
    one_pass(pages[:40])  # warm imports/regex caches
    walls = [one_pass(pages) for _ in range(reps)]
    best = min(walls)
    mid = sorted(walls)[len(walls) // 2]
    print(f"docs={n_docs} mb={mb:.2f} best={best:.3f}s "
          f"({mb/best:.2f} MB/s) mid={mid:.3f}s ({mb/mid:.2f} MB/s) "
          f"walls={[round(w,3) for w in walls]}")
    if "--profile" in sys.argv:
        import cProfile
        import pstats
        pr = cProfile.Profile()
        pr.enable()
        one_pass(pages)
        pr.disable()
        pstats.Stats(pr).sort_stats("tottime").print_stats(22)


if __name__ == "__main__":
    main()
