"""Benchmark harness: headline extraction throughput + representative
operator timings.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env knobs:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_COPIES        corpus scale-up: distinct-url copies per doc (default 4)

Methodology: the pages corpus is synthesized deterministically from
documents.parquet and **staged to parquet first**, so the measured
extraction pass is scan → skew-aware repartition → mapInPandas parse →
parquet write, exactly the production job shape (synthesis excluded).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from html_parser_spark.operators.extract import extract_pages  # noqa: E402
from html_parser_spark.plans.pipeline import configure, skew_isolate  # noqa: E402
from html_parser_spark.sources.pages import pages_df  # noqa: E402


def _noop(df) -> None:
    """Force full computation without collecting to the driver."""
    df.write.mode("overwrite").format("noop").save()


def time_query(fn, *args, reps: int = 1) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        _noop(fn(*args))
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    copies = int(os.environ.get("BENCH_COPIES", "4"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) \
        if "sf" in sf_dir else -1.0

    spark = configure(cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="hps_bench_")
    queries: dict[str, float] = {}
    try:
        # ---- stage the corpus (excluded from the measured pass)
        staged = f"{tmp}/pages"
        pages_df(spark, sf_dir, copies=copies).repartition(cpus * 2) \
            .write.parquet(staged)
        pages = spark.read.parquet(staged)
        stats = pages.agg(
            F.count("*").alias("docs"),
            F.sum(F.length("html")).alias("bytes")).collect()[0]
        n_docs, n_bytes = stats["docs"], int(stats["bytes"])

        # ---- warmup: spawn/warm the Python workers on a 5% slice so the
        # headline measures steady-state throughput (a long-running
        # cluster's workers are warm), then the timed full job
        warm = pages.filter(F.crc32(F.col("url")) % 20 == 0)
        _noop(extract_pages(skew_isolate(warm, cpus * 2),
                            with_spans=False))

        # ---- headline: full extraction job (scan→repartition→parse→write),
        # best of 3 (this box shows up to 4× run-to-run noise from
        # co-tenant CPU steal — observed same-code spread 5.6s..36s;
        # min is the job's actual capability)
        walls = []
        for i in range(3):
            t0 = time.monotonic()
            extract_pages(skew_isolate(pages, cpus * 2), with_spans=False) \
                .write.mode("overwrite").parquet(f"{tmp}/out")
            walls.append(time.monotonic() - t0)
        wall = min(walls)
        queries["extract_full_job"] = round(wall, 3)

        # ---- representative operator timings at the raw sf tables
        import __spark_entry__ as e
        qmap = e.queries()
        # best-of-2 for cheap operators (co-tenant steal causes up to 4×
        # swings on this host); single run for the heavy ones
        for name, reps in (("dedup_exact", 2), ("dedup_minhash_lsh", 2),
                           ("dedup_simhash", 2), ("similarity_topk", 2),
                           ("similarity_ann_lsh", 2), ("text_stats", 2),
                           ("lang_id", 2), ("fingerprint", 2),
                           ("repetition_stats", 2), ("domain_quota", 2),
                           ("quality_rarity", 2), ("sample_stratified", 2),
                           ("url_dedup", 2), ("dedup_clusters", 1),
                           ("dedup_clusters_star", 1)):
            queries[name] = time_query(qmap[name], spark, sf_dir, reps=reps)
        # multimodal: stage the synthetic media table first (same
        # methodology as pages — synthesis excluded from the timing),
        # then time the real PNG/GIF/WAV decode pass over parquet
        from html_parser_spark.operators import multimodal
        media_staged = f"{tmp}/media"
        multimodal.media_df_from_docs(spark, sf_dir) \
            .write.parquet(media_staged)
        media = spark.read.parquet(media_staged)
        queries["multimodal_decode"] = time_query(
            lambda *_: multimodal.decode_media(media), None, reps=2)
        # jaccard is O(pairs) on a tiny shared vocabulary — bench a slice
        docs1k = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                  .filter(F.col("doc_id") < 1000))
        from html_parser_spark.operators.dedup import jaccard_pairs
        queries["dedup_jaccard_1k"] = time_query(
            lambda *_: jaccard_pairs(docs1k), None, reps=2)
        # the production plan caps boilerplate-shingle fan-out; timing
        # both shows what the skew control buys
        queries["dedup_jaccard_1k_capped"] = time_query(
            lambda *_: jaccard_pairs(docs1k, max_doc_freq=20), None,
            reps=2)
        # line-level dedup timed on the extraction output already staged
        # by the headline job (parse cost excluded — this measures the
        # boilerplate-line removal stage alone on real extracted text)
        from html_parser_spark.operators.lines import line_dedup
        extracted = spark.read.parquet(f"{tmp}/out").select("url", "text")
        queries["dedup_lines_stage"] = time_query(
            lambda *_: line_dedup(extracted), None, reps=2)
        # round-3 third-pass operators: link harvesting over the staged
        # pages (kernel-dominated), and the raw-table curation ops
        from html_parser_spark.operators.links import (extract_links,
                                                       host_graph)
        # same skew plan as the headline job — without it the partition
        # holding the rep-8000 giants serializes the whole pass; the
        # timed run IS the staging write (one kernel pass, not two)
        links_df = extract_links(skew_isolate(pages, cpus * 2))
        links_staged = f"{tmp}/links"
        # best-of-2 like the other heavy ops (single samples on this
        # box read up to 10x under co-tenant steal — the isolated A/B
        # in BENCH.md pins the real cost); second pass is the staging
        # write the host-graph stage reads
        t_a = time_query(lambda *_: links_df, None, reps=1)
        t0 = time.monotonic()
        links_df.write.parquet(links_staged)
        queries["extract_links"] = round(min(t_a, time.monotonic() - t0), 3)
        links_t = spark.read.parquet(links_staged)
        queries["link_hostgraph_stage"] = time_query(
            lambda *_: host_graph(links_t), None, reps=2)
        for name, reps in (("dedup_substrings", 1), ("chunk_docs", 2),
                           ("quality_classifier", 2),
                           ("collocations", 2),
                           ("normalize_text", 2),
                           ("dedup_representatives", 1),
                           ("snapshot_diff", 2),
                           ("tfidf_keywords", 2),
                           ("incremental_recrawl", 1)):
            queries[name] = time_query(qmap[name], spark, sf_dir,
                                       reps=reps)
        # image_ahash over the already-staged media table (synthesis
        # excluded from the timing — same methodology as
        # multimodal_decode above)
        queries["image_ahash"] = time_query(
            lambda *_: multimodal.image_ahash(media), None, reps=2)
        queries["image_neardup_stage"] = time_query(
            lambda *_: (multimodal.image_ahash(media)
                        .groupBy("ahash", "width", "height")
                        .agg(F.count("*").alias("n"))), None, reps=2)
        # round-5 operators: LM-surprisal scoring, set-containment and
        # winnowed-fingerprint pair generation on the raw tables
        for name, reps in (("quality_surprisal", 2),
                           ("dedup_containment", 1),
                           ("plagiarism_pairs", 1)):
            queries[name] = time_query(qmap[name], spark, sf_dir,
                                       reps=reps)
        # table extraction is a parse-kernel pass — run it over the
        # staged corpus under the production skew plan, like links
        from html_parser_spark.operators.extract import extract_html_tables
        queries["extract_tables"] = time_query(
            lambda *_: extract_html_tables(skew_isolate(pages, cpus * 2)),
            None, reps=1)
        # robots verdict stage alone, over the already-staged links
        # (link harvest cost excluded — measured above)
        from html_parser_spark.operators.links import frontier
        from html_parser_spark.operators.robots import robots_filter
        rules = spark.createDataFrame(list(e._ROBOTS_RULES),
                                      ["host", "rule", "prefix"])
        queries["frontier_robots_stage"] = time_query(
            lambda *_: robots_filter(frontier(links_t, pages), rules,
                                     broadcast_rules=True), None, reps=2)
        # full WARC ingest round-trip (pack → record-walk → parse) at
        # the raw sf scale — the container-format ingest path
        queries["warc_ingest"] = time_query(
            qmap["warc_ingest"], spark, sf_dir, reps=1)
        # politeness scheduling composed with the robots verdict
        queries["crawl_schedule"] = time_query(
            qmap["crawl_schedule"], spark, sf_dir, reps=2)
        # CCNet composition: parse + LM-surprisal + band filter
        queries["curation_lm_pipeline"] = time_query(
            qmap["curation_lm_pipeline"], spark, sf_dir, reps=1)

        out = {
            "metric": "extract_wall_sec",
            "value": round(wall, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "docs": n_docs,
            "html_mb": round(n_bytes / 1e6, 1),
            "docs_per_sec": round(n_docs / wall, 1),
            "mb_per_sec": round(n_bytes / 1e6 / wall, 2),
            "cpus": cpus,
            "copies": copies,
            "extract_runs": [round(w, 3) for w in walls],
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
