"""The shipped --py-files artifact must match the source tree.

A stale dist/hps.zip was a review finding twice (round 3 and round 4):
the zip is rebuilt by tools/package.sh but nothing forced it to track
source edits. This test does — it fails the suite the moment any
packaged module drifts from the working tree, making "rebuild the zip"
a pre-commit requirement instead of a memory exercise.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "hps.zip")
PKG = "html_parser_spark"


def _source_files():
    out = {}
    root = os.path.join(REPO, PKG)
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for f in filenames:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                out[os.path.relpath(full, REPO)] = full
    return out


def test_pyfiles_zip_matches_source_tree():
    src = _source_files()
    with zipfile.ZipFile(ZIP) as z:
        names = {n for n in z.namelist() if n.endswith(".py")}
        missing = sorted(set(src) - names)
        extra = sorted(names - set(src))
        assert not missing, (
            f"modules missing from dist/hps.zip: {missing} — "
            "run tools/package.sh")
        assert not extra, (
            f"stale modules in dist/hps.zip: {extra} — "
            "run tools/package.sh")
        stale = [n for n in sorted(src)
                 if z.read(n) != open(src[n], "rb").read()]
        assert not stale, (
            f"dist/hps.zip content differs from source for {stale} — "
            "run tools/package.sh")


def test_extract_job_warc_input_smoke(tmp_path):
    """The spark-submit job binary accepts --warc-input: WARC blobs →
    record walk → extraction, run as a subprocess the way a cluster
    invokes it (PYTHONPATH standing in for --py-files)."""
    import json
    import subprocess
    import sys

    import pytest

    pytest.importorskip("pyspark")
    from html_parser_spark.plans.pipeline import configure
    from html_parser_spark.sources.pages import pages_df
    from html_parser_spark.sources.warc import pages_to_warc

    from pyspark.sql import SparkSession

    # reuse a live session if another module's fixture holds one —
    # configure()'s getOrCreate would return that same session and
    # stopping it here would break the rest of the suite. Check the
    # process-global default too: getActiveSession() is thread-local,
    # so a session created in another thread would read as None while
    # getOrCreate still attaches to it.
    existing = (SparkSession.getActiveSession()
                or getattr(SparkSession, "_instantiatedSession", None))
    s = existing or configure(cpus=2)
    s.sparkContext.setLogLevel("ERROR")
    try:
        pages_to_warc(pages_df(s, "/root/testdata/sf0.001").limit(60)
                      .select("url", "warc_ts", "html"), n_files=2) \
            .write.parquet(str(tmp_path / "warc"))
    finally:
        if existing is None:
            s.stop()
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "extract_job.py"),
         "--warc-input", str(tmp_path / "warc"),
         "--output", str(tmp_path / "out")],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert report["docs"] == 60
