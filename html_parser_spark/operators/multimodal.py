"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched kernels.

The codecs are REAL, stdlib-only format implementations:

- **image → PNG**: full valid files (signature, IHDR/IDAT/IEND chunks
  with correct CRC32s, zlib level-0 stored-block IDAT). The decoder
  walks chunks, CRC-checks IHDR and reads the true dimensions.
- **video → animated GIF**: GIF89a with a global color table, one
  graphic-control-extension + image-descriptor + genuine LZW stream
  per frame (minimal reset-per-literal LZW — decoder-valid). The
  decoder parses the logical screen descriptor and counts image
  descriptors by walking the sub-block structure.
- **audio → WAV**: RIFF/WAVE with fmt and data chunks, 8-bit mono
  PCM. The decoder walks RIFF chunks and derives sample count from
  the data size and the fmt block. (Writer round-trips through the
  stdlib ``wave`` module in tests — an independent format check.)

- **JPEG**: structurally valid baseline JFIF files (SOI/APP0/DQT/
  SOF0/DHT/SOS/entropy/EOI). The decoder walks the marker-segment
  stream and reads real dimensions from the SOF frame header; full
  pixel decode (Huffman+IDCT) stays honestly gated behind
  ``decode_jpeg_pixels``'s ``NotImplementedError`` (needs Pillow).

Because the level-0 zlib stream, the fixed-frame LZW stream and the
PCM layout have deterministic sizes, every decoded field *and* the
payload byte count are closed-form SQL over ``media_id`` — the DuckDB
oracle checks real decodes end-to-end.

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
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "declared_w int, declared_h int")

GIF_FRAME_W, GIF_FRAME_H = 16, 12
WAV_RATE = 8000


# ------------------------------------------------------------ params
# Every decoded field is a pure function of media_id — mirrored by the
# multimodal oracle SQL in __spark_entry__.py (keep in lockstep!).

def image_dims(media_id: int) -> tuple[int, int]:
    return 16 + (media_id * 37) % 97, 16 + (media_id * 91) % 61


def video_params(media_id: int) -> tuple[int, int, int]:
    return (64 + (media_id * 37) % 449, 64 + (media_id * 91) % 257,
            1 + media_id % 120)


def audio_samples(media_id: int) -> int:
    return 500 + (media_id * 53) % 8000


def jpeg_dims(media_id: int) -> tuple[int, int]:
    return 32 + (media_id * 29) % 193, 32 + (media_id * 67) % 129


def jpeg_entropy_bytes(media_id: int) -> int:
    return 200 + (media_id * 41) % 4000


def _fill(seed: str, n: int) -> bytes:
    d = hashlib.md5(seed.encode()).digest()
    return (d * (n // 16 + 1))[:n]


# ------------------------------------------------------------ writers

def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def make_png(media_id: int) -> bytes:
    """Valid 8-bit grayscale PNG; IDAT is zlib level-0 (stored blocks)
    so the file size is closed-form: len = h*(w+1) + 68 for raw
    scanline bytes < 64 KiB (2-byte zlib hdr + 5-byte stored-block hdr
    + raw + 4-byte adler, plus 8 sig + 25 IHDR + 12 IDAT + 12 IEND)."""
    w, h = image_dims(media_id)
    px = _fill(f"png:{media_id}", w * h)
    raw = b"".join(b"\x00" + px[r * w:(r + 1) * w] for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 0))
            + _png_chunk(b"IEND", b""))


_LZW_BASE_CACHE: dict[int, tuple[int, int]] = {}


def _gif_lzw(pixels: bytes) -> bytes:
    """Minimal genuine LZW for a 4-color palette (min code size 2,
    3-bit codes): CLEAR before every literal so the dictionary never
    grows and the code width stays fixed — decoder-valid, and the
    output size is exactly ceil(3*(2*n+1)/8) bytes.

    Packed as one big integer: the CLEAR/EOI scaffold for a given
    pixel count is a cached constant; 0/1 pixel codes OR into it at
    bit 6i+3. ~10x faster than the per-code bit loop (this runs per
    frame in the corpus synthesizer)."""
    n = len(pixels)
    cached = _LZW_BASE_CACHE.get(n)
    if cached is None:
        clear, eoi = 4, 5
        base = clear  # codes: CLEAR, [p_i, CLEAR]*, last CLEAR -> EOI
        for i in range(1, n):
            base |= clear << (3 * 2 * i)
        base |= eoi << (3 * 2 * n)
        nbytes = (3 * (2 * n + 1) + 7) // 8
        cached = _LZW_BASE_CACHE[n] = (base, nbytes)
    base, nbytes = cached
    acc = 0
    for i, p in enumerate(pixels):
        if p & 1:
            acc |= 1 << (6 * i + 3)
        elif p & 2:
            acc |= 2 << (6 * i + 3)
    return (base | acc).to_bytes(nbytes, "little")


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def make_gif(media_id: int) -> bytes:
    """Valid animated GIF89a: logical screen = the video's display
    dims, each frame a 16x12 image descriptor with a real LZW stream.
    Size is closed-form: 20 + 166*frames (19 header+GCT, 1 trailer,
    per frame 8 GCE + 10 descriptor + 1 min-code + 147 sub-blocked
    LZW for 192 pixels)."""
    w, h, frames = video_params(media_id)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80, 0, 0)  # GCT, 2 colors
    out += bytes([0, 0, 0, 255, 255, 255])
    npix = GIF_FRAME_W * GIF_FRAME_H
    for f in range(frames):
        out += bytes([0x21, 0xF9, 0x04, 0x00, 0x04, 0x00, 0x00, 0x00])
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0,
                                     GIF_FRAME_W, GIF_FRAME_H, 0)
        px = bytes(b & 1 for b in _fill(f"gif:{media_id}:{f}", npix))
        out += b"\x02" + _sub_blocks(_gif_lzw(px))
    out += b"\x3B"
    return bytes(out)


def make_wav(media_id: int) -> bytes:
    """Valid RIFF/WAVE, 8-bit mono PCM at 8 kHz. Size = 44 + n."""
    n = audio_samples(media_id)
    data = _fill(f"wav:{media_id}", n)
    return (b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE,
                                    WAV_RATE, 1, 8)
            + b"data" + struct.pack("<I", n) + data)


def make_jpeg(media_id: int) -> bytes:
    """Structurally valid baseline JFIF: SOI, APP0, DQT, SOF0 (real
    dims), two DHTs, SOS, entropy bytes (0xFF-masked so no marker can
    appear inside the scan), EOI. Size is closed-form: 158 fixed
    scaffold + ``jpeg_entropy_bytes`` — mirrored by the decode
    oracle."""
    w, h = jpeg_dims(media_id)
    n = jpeg_entropy_bytes(media_id)
    entropy = bytes(0x7E if byte == 0xFF else byte
                    for byte in _fill(f"jpg:{media_id}", n))
    counts_one = bytes([0, 1] + [0] * 14)  # one 2-bit code
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
            + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
            + bytes([16]) * 64
            + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
            + b"\xff\xc4" + struct.pack(">H", 20) + b"\x00"
            + counts_one + b"\x00"
            + b"\xff\xc4" + struct.pack(">H", 20) + b"\x10"
            + counts_one + b"\x00"
            + b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00])
            + bytes([0, 63, 0])
            + entropy
            + b"\xff\xd9")


# ------------------------------------------------------------ decoders

def _png_chunks(b: bytes):
    """Shared chunk walk for both PNG decoders: validates the
    signature, yields (tag, data, crc) until the stream ends. One
    parsing recipe — a bounds/robustness fix lands once."""
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("bad PNG signature")
    pos = 8
    while pos + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[pos:pos + 4])
        tag = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + clen]
        crc_bytes = b[pos + 8 + clen:pos + 12 + clen]
        crc = struct.unpack(">I", crc_bytes)[0] if len(crc_bytes) == 4 \
            else None
        yield tag, data, crc
        pos += 12 + clen


def decode_png(b: bytes) -> tuple[int, int, int]:
    for tag, data, crc in _png_chunks(b):
        if tag == b"IHDR":
            if len(data) != 13 or zlib.crc32(tag + data) != crc:
                raise ValueError("corrupt IHDR")
            w, h = struct.unpack(">II", data[:8])
            return w, h, 1
    raise ValueError("no IHDR")


def decode_png_pixels(b: bytes) -> tuple[int, int, bytes]:
    """Full pixel decode for 8-bit grayscale non-interlaced PNGs:
    IDAT concatenation, zlib inflate, and per-scanline unfiltering
    (all five spec filter types — None/Sub/Up/Average/Paeth — at
    bpp=1). Returns (width, height, h*w pixel bytes, row-major).
    Color types other than grayscale raise — honest scope gate, the
    pipeline's synthetic corpus and the aHash operator only need
    luma."""
    w, h, idat = None, None, []
    for tag, data, _crc in _png_chunks(b):
        if tag == b"IHDR":
            w, hh = struct.unpack(">II", data[:8])
            h = hh
            depth, color, interlace = data[8], data[9], data[12]
            if depth != 8 or color != 0:
                raise ValueError("only 8-bit grayscale supported")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (w + 1):
        raise ValueError("bad scanline length")
    out = bytearray(h * w)
    prev = bytes(w)
    for r in range(h):
        ft = raw[r * (w + 1)]
        line = bytearray(raw[r * (w + 1) + 1:(r + 1) * (w + 1)])
        if ft == 1:    # Sub: left neighbor
            for c in range(1, w):
                line[c] = (line[c] + line[c - 1]) & 0xFF
        elif ft == 2:  # Up
            for c in range(w):
                line[c] = (line[c] + prev[c]) & 0xFF
        elif ft == 3:  # Average
            for c in range(w):
                left = line[c - 1] if c else 0
                line[c] = (line[c] + (left + prev[c]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for c in range(w):
                a = line[c - 1] if c else 0
                up = prev[c]
                ul = prev[c - 1] if c else 0
                p = a + up - ul
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - ul)
                pred = a if pa <= pb and pa <= pc else \
                    (up if pb <= pc else ul)
                line[c] = (line[c] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter type {ft}")
        out[r * w:(r + 1) * w] = line
        prev = line
    return w, h, bytes(out)


def ahash64(px: bytes, w: int, h: int) -> int:
    """Integer-exact 8×8 average hash (perceptual near-dup signature):
    block (i,j) covers rows [i·h//8, (i+1)·h//8) × cols [j·w//8,
    (j+1)·w//8); bit(i,j) = 1 iff block mean ≥ global mean, compared
    cross-multiplied (block_sum·n_total ≥ total_sum·n_block) so no
    float ever rounds — the hash is bit-identical everywhere. MSB
    first (bit (0,0) at position 63); returned as a SIGNED 64-bit int
    so it round-trips through Spark's long."""
    total = sum(px)
    n = w * h
    bits = 0
    for i in range(8):
        r0, r1 = i * h // 8, (i + 1) * h // 8
        for j in range(8):
            c0, c1 = j * w // 8, (j + 1) * w // 8
            s = 0
            for r in range(r0, r1):
                s += sum(px[r * w + c0:r * w + c1])
            nb = (r1 - r0) * (c1 - c0)
            bits <<= 1
            # empty blocks (w or h < 8) contribute a 0 bit — 0 ≥ 0
            # would spuriously set it, diverging from the oracle's
            # no-pixels-no-block scheme and polluting Hamming dedup
            if nb and s * n >= total * nb:
                bits |= 1
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_ahash(media_df):
    """(media_id, width, height, ahash) for every decodable image row:
    real PNG pixel decode + the integer-exact 8×8 average hash — the
    perceptual near-dup signature (identical bytes ⇒ identical hash;
    re-encodes/resizes of the same picture land nearby in Hamming
    space). Narrow map over the payload column, zero shuffle; rows
    that fail to decode are dropped (the ok/failure audit lives in
    ``decode_media``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, px = decode_png_pixels(bytes(payload))
                    rows.append((int(mid), w, h, ahash64(px, w, h)))
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=["media_id", "width",
                                              "height", "ahash"])

    return (media_df.where(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(run, schema=("media_id long, width int, "
                                      "height int, ahash long")))


def decode_gif(b: bytes) -> tuple[int, int, int]:
    if b[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("bad GIF signature")
    w, h, flags, _, _ = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 7))
    frames = 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while b[pos]:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            frames += 1
            lflags = b[pos + 8]
            pos += 9
            if lflags & 0x80:
                pos += 3 * (2 << (lflags & 7))
            pos += 1  # LZW min code size
            while b[pos]:
                pos += 1 + b[pos]
            pos += 1
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("no frames")
    return w, h, frames


def decode_wav(b: bytes) -> tuple[int, int, int]:
    """Returns (sample_rate, n_channels, n_samples)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("bad RIFF/WAVE header")
    pos = 12
    rate = channels = bits = None
    n_samples = None
    while pos + 8 <= len(b):
        tag = b[pos:pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
        if tag == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", b[pos + 8:pos + 24])
        elif tag == b"data":
            if channels is None:
                raise ValueError("data before fmt")
            n_samples = clen * 8 // (bits * channels)
        pos += 8 + clen + (clen & 1)
    if rate is None or n_samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, n_samples


def decode_jpeg(b: bytes) -> tuple[int, int, int]:
    """Dims-only JPEG header parse: walk the marker-segment stream to
    the first SOFn frame header and read its (width, height) — the
    public JPEG/JFIF segment layout, no entropy decode. Returns
    (width, height, 1). Full pixel decode stays gated behind
    ``decode_jpeg_pixels`` (needs a Huffman+IDCT stack)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG SOI")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("desynchronized JPEG marker stream")
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            pos += 2  # standalone markers carry no length field
            continue
        (seglen,) = struct.unpack(">H", b[pos + 2:pos + 4])
        if seglen < 2:
            raise ValueError("corrupt JPEG segment length")
        # SOF0-3, 5-7, 9-11, 13-15 all share the frame-header layout
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 10 > len(b):
                raise ValueError("truncated SOF frame header")
            h, w = struct.unpack(">HH", b[pos + 5:pos + 9])
            ncomp = b[pos + 9]
            if not (w and h and ncomp):
                raise ValueError("corrupt SOF dimensions")
            return w, h, 1
        if marker == 0xDA:
            raise ValueError("SOS before any SOF frame header")
        pos += 2 + seglen
    raise ValueError("no SOF marker")


def decode_jpeg_pixels(b: bytes):
    """Honest scope gate: full JPEG pixel decode needs a Huffman+IDCT
    implementation (Pillow — not in this container). Header dims are
    available via ``decode_jpeg``."""
    raise NotImplementedError(
        "JPEG pixel decoding requires Pillow (not in this container); "
        "use decode_jpeg for header dimensions")


def _decode_one(payload: bytes) -> tuple[int, int, int]:
    """Dispatch on magic bytes → (width, height, n_frames) for visual
    media, (sample_rate, n_channels, n_samples) for audio."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if payload[:3] == b"GIF":
        return decode_gif(payload)
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    raise ValueError("unsupported media format")


def decode_media(media_df):
    """(media_id, kind, payload, ...) -> decoded metadata + a feature
    digest per item. Returns
    (media_id, kind, width, height, n_frames, payload_bytes, feat, ok).
    For audio, (width, height, n_frames) carry
    (sample_rate, n_channels, n_samples)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    w, h, frames = _decode_one(raw)
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


def frame_sample(media_df, every_n: int = 30):
    """Video frame sampling: decode the GIF frame count, emit one row
    per sampled frame index. Demonstrates the 1→N fan-out shape
    (mapInPandas emitting more rows than it consumes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_feat": []}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                if kind != "video":
                    continue
                raw = bytes(payload) if payload is not None else b""
                try:
                    _, _, frames = _decode_one(raw)
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
    doc gets one PNG image (media_id = doc_id*4); every 3rd doc an
    animated-GIF video (doc_id*4 + 1); every 5th doc a WAV audio clip
    (doc_id*4 + 2); every 7th doc a baseline JPEG (doc_id*4 + 3)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                mid = did * 4
                w, h = image_dims(mid)
                rows.append((mid, "image", make_png(mid), w, h))
                if did % 3 == 0:
                    mid = did * 4 + 1
                    w, h, _ = video_params(mid)
                    rows.append((mid, "video", make_gif(mid), w, h))
                if did % 5 == 0:
                    mid = did * 4 + 2
                    rows.append((mid, "audio", make_wav(mid), 0, 0))
                if did % 7 == 0:
                    mid = did * 4 + 3
                    w, h = jpeg_dims(mid)
                    rows.append((mid, "jpeg", make_jpeg(mid), w, h))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload",
                                              "declared_w", "declared_h"])

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.mapInPandas(gen, schema=MEDIA_SCHEMA)
