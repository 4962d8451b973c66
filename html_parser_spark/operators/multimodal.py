"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched kernels.

The Spark-side plumbing is real and tested — schemas, partitioning,
``mapInPandas`` batch shape, error isolation. The *codec* step is
stubbed (no image/audio libraries in this container): ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder parses the synthetic header our generator
writes. Swapping in Pillow/ffmpeg later only replaces ``_decode_one``.

At 100 TB the shape matters more than the codec:

- payloads live in their own column so Parquet/Iceberg column pruning
  keeps metadata-only queries from reading bytes;
- batches are capped by ``arrow.maxRecordsPerBatch`` (media cells are
  MBs — same sizing rule as html extraction);
- per-item failures mark the row (``ok=false``) instead of failing the
  task.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "declared_w int, declared_h int")

_MAGIC = b"FAKEIMG1"


def make_fake_payload(media_id: int, kind: str = "image") -> bytes:
    """Deterministic synthetic media payload: an 8-byte magic, a packed
    (w, h, n_frames) header, then md5-stream filler bytes."""
    w = 64 + (media_id * 37) % 1985
    h = 64 + (media_id * 91) % 1017
    frames = 1 if kind == "image" else 1 + media_id % 120
    body_len = (w * h) % 4096 + 128
    seed = hashlib.md5(f"{kind}:{media_id}".encode()).digest()
    body = (seed * (body_len // 16 + 1))[:body_len]
    return _MAGIC + struct.pack("<III", w, h, frames) + body


def _decode_one(payload: bytes, fake: bool) -> tuple[int, int, int]:
    if not fake:
        raise NotImplementedError(
            "real image/audio decoding requires Pillow/ffmpeg (not in "
            "this container); pass fake=True for the deterministic stub")
    if payload[:8] != _MAGIC:
        raise ValueError("bad magic")
    w, h, frames = struct.unpack("<III", payload[8:20])
    return w, h, frames


def decode_media(media_df, fake: bool = True):
    """(media_id, kind, payload, ...) -> decoded metadata + a feature
    digest per item. Returns
    (media_id, kind, width, height, n_frames, payload_bytes, feat, ok)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    w, h, frames = _decode_one(raw, fake)
                    feat = hashlib.md5(raw).hexdigest()
                    rows.append((int(mid), kind, w, h, frames,
                                 len(raw), feat, True))
                except Exception:
                    rows.append((int(mid), kind, 0, 0, 0, len(raw),
                                 "", False))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "width", "height", "n_frames",
                "payload_bytes", "feat", "ok"])

    return media_df.select("media_id", "kind", "payload").mapInPandas(
        run, schema=("media_id long, kind string, width int, height int, "
                     "n_frames int, payload_bytes long, feat string, "
                     "ok boolean"))


def frame_sample(media_df, every_n: int = 30, fake: bool = True):
    """Video frame sampling plumbing: one output row per sampled frame
    index (decode stubbed; indices real). Demonstrates the 1→N fan-out
    shape (mapInPandas emitting more rows than it consumes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_feat": []}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if kind != "video":
                    continue
                raw = bytes(payload) if payload is not None else b""
                try:
                    _, _, frames = _decode_one(raw, fake)
                except Exception:
                    continue
                for idx in range(0, frames, every_n):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(idx)
                    out["frame_feat"].append(
                        hashlib.md5(raw + idx.to_bytes(4, "little"))
                        .hexdigest())
            yield pd.DataFrame(out)

    return media_df.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, frame_idx int, frame_feat string")


def media_df_from_docs(spark, sf_dir: str):
    """Deterministic synthetic media table keyed off documents: every
    doc gets one image; every 3rd doc a video."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                p = make_fake_payload(did, "image")
                w, h, _ = struct.unpack("<III", p[8:20])
                rows.append((did * 2, "image", p, w, h))
                if did % 3 == 0:
                    pv = make_fake_payload(did, "video")
                    w, h, _ = struct.unpack("<III", pv[8:20])
                    rows.append((did * 2 + 1, "video", pv, w, h))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload",
                                              "declared_w", "declared_h"])

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(gen, schema=MEDIA_SCHEMA)
