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
