"""Multimodal columns — images/audio/video as opaque ``binary`` columns
with typed metadata (SURVEY.md §2.10; no reference counterpart).

The Spark-side plumbing is real and tested: schemas, Arrow-batched
``mapInPandas`` signatures, partitioning-safe batch shapes. Two decode
tiers:

- **Real, pure-stdlib decode** for stdlib-parseable containers —
  binary PPM (P6) / 24-bit BMP / zlib-DEFLATE PNG / LZW GIF images
  and PCM WAV / big-endian AIFF audio — in :func:`decode_media`:
  actual byte-level header parsing + pixel/sample statistics, no
  external codec library needed, oracle-checked end-to-end (the
  ``media_decode`` driver query replays the decoded features in
  DuckDB from the same deterministic byte spec).
- Rich-codec work (JPEG decode, resample, frame extraction) is STUBBED
  — those libraries are not in this container — behind ``try: import
  PIL`` with a clearly-marked deterministic fallback, so the pipeline
  shape is exercised end-to-end while the decode kernel is swappable.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
import zlib
from array import array
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-table schema: one opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _decode_real(payload: bytes, kind: str) -> list[float]:
    """Real decode path — requires codec libraries absent from this
    container. Reaching this without them is a deliberate, loud error
    rather than silently wrong features."""
    raise NotImplementedError(
        "codec libraries (PIL/torchaudio/av) not available in this "
        "environment; install them or use the deterministic stub"
    )


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake featurizer: FEATURE_DIM floats derived from
    the payload digest. Keeps every downstream stage (schema, batching,
    similarity search over media features) fully testable."""
    digest = hashlib.sha256(payload or b"").digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


try:  # pragma: no cover - container has no codec libs
    import PIL  # noqa: F401

    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False


def extract_media_features(
    media: DataFrame, use_stub: bool | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over the opaque payload column.

    ``mapInPandas`` streams record batches through Python — the decode
    kernel sees a ``pd.DataFrame`` per Arrow batch, never a per-row
    Python call, and the output schema is fixed (FEATURES_SCHEMA) so
    Catalyst plans around it like any other relation. Partitioning of
    the input is preserved; at scale, payload bytes never shuffle —
    extraction runs where the scan runs."""
    stub = (not _HAVE_CODECS) if use_stub is None else use_stub
    decode = _decode_stub if stub else _decode_real

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "content_sha": [
                        hashlib.sha256(p or b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "features": [
                        decode(p, k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Test fixture adapter: wraps the documents table as a media table
    (utf-8 text bytes as the opaque payload) so the multimodal pipeline
    is exercisable against driver data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_media(
    media: DataFrame, width: int, height: int, use_stub: bool | None = None
) -> DataFrame:
    """Resize plumbing (MEDIA_SCHEMA → MEDIA_SCHEMA): Arrow-batched,
    payload-in/payload-out, metadata updated to the target dims. The
    pixel kernel is stubbed (deterministic digest-derived bytes) when
    codec libs are absent — the batching, schema, and partitioning
    behavior are the real thing; swap ``_decode_real``-style kernels in
    production. Payloads never shuffle: resize runs where the scan runs.
    """
    stub = (not _HAVE_CODECS) if use_stub is None else use_stub
    if not stub:
        _decode_real(b"", "image")  # loud, deliberate: no codecs here

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"resize:{width}x{height}:".encode()
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                hashlib.sha256(tag + (p or b"")).digest() for p in pdf["payload"]
            ]
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, use_stub: bool | None = None
) -> DataFrame:
    """Frame sampling (MEDIA_SCHEMA → FRAMES_SCHEMA): one row per
    sampled frame at ``every_ms`` intervals — the one-to-many
    ``mapInPandas`` shape (a Python UDTF without the UDTF registration
    overhead). Frame count = duration_ms // every_ms + 1, or a single
    frame when duration is unknown. Stub kernel emits digest-derived
    frame bytes; the fan-out, schema, and batch shapes are real.

    Scale: output rows stay in the input partition (no shuffle); the
    expansion factor is bounded by duration/every_ms — pick the rate so
    frames-per-task fits memory, exactly as with any explode.
    """
    stub = (not _HAVE_CODECS) if use_stub is None else use_stub
    if not stub:
        _decode_real(b"", "video")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, payloads = [], [], [], []
            for mid, p, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = 1 if pd.isna(dur) else int(dur) // every_ms + 1
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    payloads.append(
                        hashlib.sha256(
                            b"frame:%d:" % i + (p or b"")
                        ).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "ts_ms": tss,
                    "payload": payloads,
                }
            )

    return media.mapInPandas(gen, schema=FRAMES_SCHEMA)


# --------------------------------------------------------------------------
# Real pure-stdlib decode: PPM (P6) images, PCM WAV audio
# --------------------------------------------------------------------------

#: Output of :func:`decode_media` — one row per media item; image
#: fields are NULL for audio rows and vice versa. Sums are exact
#: integers (oracle-replayable without float-order concerns); the only
#: float is ``rms`` (sqrt of exact-int sum-of-squares / n, a
#: correctly-rounded IEEE op identical across engines).
DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        # ppm|bmp|png|gif|qoi | wav|aiff|ulaw|alaw
        StructField("fmt", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_pixels", LongType(), True),
        StructField("sum_r", LongType(), True),
        StructField("sum_g", LongType(), True),
        StructField("sum_b", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("peak", IntegerType(), True),
        StructField("rms", DoubleType(), True),
    ]
)


def _ppm_bytes(d: int) -> tuple[bytes, int, int]:
    """Deterministic binary-PPM payload for media id ``d``: w=4+d%5,
    h=3+d%7, interleaved-RGB byte j = (d*7 + j*11) % 256. Closed-form
    so the DuckDB oracle can replay the decoded statistics without
    parsing bytes."""
    w, h = 4 + d % 5, 3 + d % 7
    body = bytes((d * 7 + j * 11) % 256 for j in range(3 * w * h))
    return b"P6\n%d %d\n255\n" % (w, h) + body, w, h


def _bmp_bytes(d: int) -> tuple[bytes, int, int]:
    """Deterministic 24-bit uncompressed BMP for media id ``d``,
    encoding the SAME logical image as :func:`_ppm_bytes` (top-down
    row-major interleaved-RGB byte j = (d*7 + j*11) % 256): the pixels
    are re-packed the way the BMP container demands — bottom-up row
    order, BGR channel order, rows padded to 4 bytes
    (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB). Sharing the logical
    image means a decoder that mishandles ANY of those three container
    quirks produces different channel sums than the PPM closed form —
    exactly what the oracle checks."""
    w, h = 4 + d % 5, 3 + d % 7
    rgb = bytes((d * 7 + j * 11) % 256 for j in range(3 * w * h))
    row_size = (3 * w + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            r, g, b = rgb[3 * (y * w + x) : 3 * (y * w + x) + 3]
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - 3 * w)
        body += row
    pixel_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + dib + bytes(body), w, h


def _decode_bmp(payload: bytes) -> dict:
    """Parse an uncompressed 24-bit BMP (BITMAPINFOHEADER or larger):
    validate magic/bpp/BI_RGB, honor the declared pixel-array offset,
    strip the 4-byte row padding, un-flip bottom-up row order (negative
    DIB height = top-down, also handled), and de-interleave BGR.
    Returns the same stat dict as :func:`_decode_ppm` (fmt='bmp')."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP (missing BM magic)")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported "
            f"(bpp={bpp}, compression={compression})"
        )
    bottom_up = h_signed > 0
    h = abs(h_signed)
    row_size = (3 * w + 3) & ~3
    need = pixel_off + row_size * h
    if len(payload) < need:
        raise ValueError(
            f"truncated BMP body: want {need} bytes, got {len(payload)}"
        )
    sum_r = sum_g = sum_b = 0
    for y in range(h):
        src_y = (h - 1 - y) if bottom_up else y
        off = pixel_off + src_y * row_size
        row = payload[off : off + 3 * w]
        sum_b += sum(row[0::3])
        sum_g += sum(row[1::3])
        sum_r += sum(row[2::3])
    return {
        "fmt": "bmp",
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
    }


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (left, up, up-left) — RFC 2083 §6.6: pick
    the neighbor closest to ``a + b - c``, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    """One PNG chunk: big-endian length, 4-byte tag, payload, CRC32
    over tag+payload (the container's integrity quirk — a decoder that
    skips CRC validation accepts corrupted pixel data silently)."""
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png_bytes(d: int) -> tuple[bytes, int, int]:
    """Deterministic 8-bit RGB PNG for media id ``d``, encoding the
    SAME logical image as :func:`_ppm_bytes` (top-down row-major
    interleaved-RGB byte j = (d*7 + j*11) % 256), re-packed the way the
    PNG container demands: per-scanline filter transform (row y uses
    filter y % 5, so every generated image exercises ALL FIVE filter
    types — None/Sub/Up/Average/Paeth), zlib/DEFLATE compression of the
    filtered stream, and the IDAT split across two chunks (decoders
    must concatenate IDAT payloads before inflating — a classic
    single-chunk-only decoder bug). Sharing the logical image with the
    PPM closed form means a bug in ANY of defiltering, inflation, or
    chunk reassembly flips a channel sum the oracle checks."""
    w, h = 4 + d % 5, 3 + d % 7
    rgb = bytes((d * 7 + j * 11) % 256 for j in range(3 * w * h))
    stride = 3 * w
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = rgb[y * stride : (y + 1) * stride]
        ft = y % 5
        raw.append(ft)
        if ft == 0:  # None
            raw += row
        elif ft == 1:  # Sub (left neighbor, bpp=3)
            raw += bytes(
                (row[i] - (row[i - 3] if i >= 3 else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - 3] if i >= 3 else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - 3] if i >= 3 else 0,
                        prev[i],
                        prev[i - 3] if i >= 3 else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = row
    comp = zlib.compress(bytes(raw), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    mid = max(1, len(comp) // 2)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", comp[:mid])
        + _png_chunk(b"IDAT", comp[mid:])
        + _png_chunk(b"IEND", b"")
    ), w, h


def _decode_png(payload: bytes) -> dict:
    """Parse an 8-bit RGB non-interlaced PNG with the stdlib only:
    validate the signature, walk the chunk list verifying each CRC32,
    parse IHDR (bit depth 8 / color type 2 truecolor / no interlace —
    anything else raises loudly), concatenate ALL IDAT payloads,
    ``zlib.decompress``, then invert the five scanline filters
    (None/Sub/Up/Average/Paeth, RFC 2083 §6) to reconstruct the
    interleaved RGB bytes. Returns the same stat dict as
    :func:`_decode_ppm` (fmt='png')."""
    sig = b"\x89PNG\r\n\x1a\n"
    if not payload.startswith(sig):
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = len(sig), None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {tag!r}")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT chunk")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"only 8-bit RGB non-interlaced PNG supported (depth={depth}, "
            f"color_type={ctype}, interlace={interlace})"
        )
    raw = zlib.decompress(bytes(idat))
    stride = 3 * w
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"bad PNG pixel stream: want {h * (1 + stride)} bytes "
            f"after inflate, got {len(raw)}"
        )
    sum_r = sum_g = sum_b = 0
    prev = bytearray(stride)
    for y in range(h):
        off = y * (1 + stride)
        ft = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ft == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                c = prev[i - 3] if i >= 3 else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        sum_r += sum(line[0::3])
        sum_g += sum(line[1::3])
        sum_b += sum(line[2::3])
        prev = line
    return {
        "fmt": "png",
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
    }


# GIF interlace passes (GIF89a spec §Appendix E): (first row, step).
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlaced_rows(h: int) -> list[int]:
    """Source-order row indices of a 4-pass interlaced GIF image of
    height ``h`` — the order rows appear in the LZW stream."""
    return [y for start, step in _GIF_PASSES for y in range(start, h, step)]


def _lzw_encode(indices: list[int], mcs: int, clear_cap: int = 4095) -> bytes:
    """GIF-variant LZW compress a palette-index stream: variable code
    width starting at ``mcs``+1 bits, codes packed LSB-first, CLEAR
    emitted up-front and again whenever the next free code reaches
    ``clear_cap`` (the 12-bit spec cap by default; smaller values force
    mid-stream resets for tests). Width growth follows the GIF
    convention (the giflib reference pair): after EMITTING a data code
    — before any insert — width grows when the next free code has
    reached ``1 << width``. That is one code LATER than table-size
    reasoning suggests; the decoder's read-counter rule lands on the
    same boundary, which is what makes third-party GIFs decodable."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0
    width = mcs + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def grow() -> None:
        nonlocal width
        if next_code >= (1 << width) and width < 12:
            width += 1

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    seq = b""
    for k in indices:
        cand = seq + bytes([k])
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        grow()
        if next_code >= clear_cap:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        else:
            table[cand] = next_code
            next_code += 1
        seq = bytes([k])
    if seq:
        emit(table[seq])
        grow()
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int) -> list[int]:
    """GIF-variant LZW decompress: LSB-first variable-width codes,
    CLEAR/EOI handling, the KwKwK deferred-code case (code == next
    free slot). Width growth counts codes READ since the last reset
    (the giflib convention) — the counter runs one ahead of the table
    because the first post-CLEAR code appends nothing, which is
    exactly what keeps it aligned with the encoder's emit-then-grow
    boundary."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad GIF LZW min code size {mcs}")
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    running = eoi + 1
    out: list[int] = []
    prev = b""
    acc = nbits = pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == eoi:
            return out
        if code == clear:
            width = mcs + 1
            running = eoi + 1
            del table[eoi + 1 :]
            prev = b""
            continue
        running += 1
        if running > (1 << width) and width < 12:
            width += 1
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"corrupt GIF LZW stream: code {code}")
        out.extend(entry)
        if prev and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry


def _gif_encode(
    w: int, h: int, rgb: bytes, interlace: bool = False, block_size: int = 255
) -> bytes:
    """Assemble a GIF89a from interleaved-RGB pixel bytes: global color
    table in first-occurrence raster order, a comment extension (the
    skip path every decoder needs), one image descriptor, and the LZW
    index stream split into ``block_size``-byte sub-blocks. With
    ``interlace`` the rows are written in 4-pass order and the
    descriptor flag is set."""
    palette: dict[bytes, int] = {}
    idx = []
    for p in range(w * h):
        c = rgb[3 * p : 3 * p + 3]
        if c not in palette:
            palette[c] = len(palette)
        idx.append(palette[c])
    if len(palette) > 256:
        raise ValueError(f"GIF palette overflow: {len(palette)} colors")
    gct_n = 0  # GCT size field: table holds 2**(gct_n+1) entries
    while (2 << gct_n) < len(palette):
        gct_n += 1
    entries = 2 << gct_n
    mcs = max(2, gct_n + 1)
    gct = b"".join(palette) + b"\x00" * (3 * (entries - len(palette)))
    if interlace:
        rows = _gif_interlaced_rows(h)
        idx = [idx[y * w + x] for y in rows for x in range(w)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | gct_n, 0, 0)
    out += gct
    out += b"\x21\xfe\x08graft-v1\x00"  # comment extension
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(mcs)
    data = _lzw_encode(idx, mcs)
    for i in range(0, len(data), block_size):
        chunk = data[i : i + block_size]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def _gif_bytes(d: int) -> tuple[bytes, int, int]:
    """Deterministic GIF payload for media id ``d`` — the SAME logical
    image as :func:`_ppm_bytes` (w=4+d%5, h=3+d%7, interleaved-RGB
    byte j=(d*7+j*11)%256), re-expressed the way the GIF container
    demands: indexed color through a palette built in first-occurrence
    raster order, LZW-compressed index stream, 32-byte sub-blocks (so
    reassembly is always multi-block), and 4-pass interlacing on every
    other image (``(d//2) % 2 == 1``). A decoder that mishandles the
    palette indirection, the LZW protocol, sub-block splits, or the
    interlace row order produces different channel sums than the PPM
    closed form — exactly what the oracle checks."""
    w, h = 4 + d % 5, 3 + d % 7
    rgb = bytes((d * 7 + j * 11) % 256 for j in range(3 * w * h))
    return (
        _gif_encode(w, h, rgb, interlace=(d // 2) % 2 == 1, block_size=32),
        w,
        h,
    )


def _decode_gif(payload: bytes) -> dict:
    """Parse a GIF87a/89a: logical screen descriptor + global color
    table, skip extension blocks, then the first image descriptor —
    local color table override, 4-pass de-interlacing, sub-block
    reassembly, and GIF-variant LZW decompression (variable code
    width, CLEAR/EOI, KwKwK). Pixel sums are taken through the active
    palette. Returns the same stat dict as :func:`_decode_ppm`
    (fmt='gif'). Only the first frame of an animation is read."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = payload[pos : pos + n]
        pos += n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 3 * (2 << (iflags & 0x07))
            pal = payload[pos : pos + n]
            pos += n
        if pal is None:
            raise ValueError("GIF image has no color table")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            size = payload[pos]
            data += payload[pos + 1 : pos + 1 + size]
            pos += 1 + size
        idx = _lzw_decode(bytes(data), mcs)
        if len(idx) != w * h:
            raise ValueError(
                f"GIF pixel count mismatch: want {w * h}, got {len(idx)}"
            )
        if iflags & 0x40:  # de-interlace: stream rows -> raster rows
            order = _gif_interlaced_rows(h)
            raster = [None] * (w * h)
            for src_y, y in enumerate(order):
                raster[y * w : (y + 1) * w] = idx[src_y * w : (src_y + 1) * w]
            idx = raster
        n_pal = len(pal) // 3
        sum_r = sum_g = sum_b = 0
        for i in idx:
            if i >= n_pal:
                raise ValueError(f"GIF index {i} outside {n_pal}-color table")
            sum_r += pal[3 * i]
            sum_g += pal[3 * i + 1]
            sum_b += pal[3 * i + 2]
        return {
            "fmt": "gif",
            "width": w,
            "height": h,
            "n_pixels": w * h,
            "sum_r": sum_r,
            "sum_g": sum_g,
            "sum_b": sum_b,
        }
    raise ValueError("truncated GIF: no image descriptor")


# ---------------------------------------------------------------------------
# QOI — the "Quite OK Image" format (qoiformat.org, 2022 spec): a
# single-pass byte-oriented codec with six ops (RUN/INDEX/DIFF/LUMA/
# RGB/RGBA) over a 64-slot running color index. Fifth real image
# container; first with delta/run compression ops rather than a
# general-purpose compressor (PNG/zlib) or dictionary coder (GIF/LZW).
# ---------------------------------------------------------------------------

_QOI_OP_INDEX = 0x00
_QOI_OP_DIFF = 0x40
_QOI_OP_LUMA = 0x80
_QOI_OP_RUN = 0xC0
_QOI_OP_RGB = 0xFE
_QOI_OP_RGBA = 0xFF
_QOI_END = b"\x00" * 7 + b"\x01"


def _qoi_hash(r: int, g: int, b: int, a: int) -> int:
    """The spec's index position: (r·3 + g·5 + b·7 + a·11) % 64."""
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def _qoi_encode(rgb: bytes, w: int, h: int) -> bytes:
    """Reference-priority QOI encoder for 3-channel pixels (RUN →
    INDEX → DIFF → LUMA → RGB, exactly qoi.c's op choice): previous
    pixel starts at (0,0,0,255), the 64-slot index starts zeroed,
    DIFF/LUMA deltas use wraparound (mod-256) arithmetic, runs are
    capped at 62 (tags 63/64 are the RGB/RGBA bytes). During a run
    the index is not touched (the run pixel was indexed when first
    seen) — matching the reference encoder so third-party decoders
    replay bit-identically."""
    out = bytearray(b"qoif" + struct.pack(">IIBB", w, h, 3, 0))
    index: list[tuple[int, int, int, int]] = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for i in range(w * h):
        cur = (rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2], 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(_QOI_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_QOI_OP_RUN | (run - 1))
            run = 0
        hidx = _qoi_hash(*cur)
        if index[hidx] == cur:
            out.append(_QOI_OP_INDEX | hidx)
        else:
            index[hidx] = cur
            dr = (cur[0] - prev[0] + 128) % 256 - 128
            dg = (cur[1] - prev[1] + 128) % 256 - 128
            db = (cur[2] - prev[2] + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(
                    _QOI_OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                )
            elif (
                -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7
            ):
                out.append(_QOI_OP_LUMA | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((_QOI_OP_RGB, cur[0], cur[1], cur[2]))
        prev = cur
    if run:
        out.append(_QOI_OP_RUN | (run - 1))
    out += _QOI_END
    return bytes(out)


def _qoi_bytes(d: int) -> tuple[bytes, int, int]:
    """Deterministic QOI payload for media id ``d`` (w=4+d%5, h=3+d%7
    like every image fixture). Unlike the shared PPM pixels — whose
    +33-per-channel stride can only produce RGB/INDEX ops — this
    fixture's pixel walk is designed so the ENCODED stream cycles
    through all four delta ops (any image here is ≥12 px, covering ≥2
    full cycles): the step from pixel i-1 to i is, by i % 4,
    (0,0,0) → OP_RUN, (1,1,1) → OP_DIFF, (4,8,4) → OP_LUMA,
    (50,60,70) → OP_RGB (dg=60 exceeds LUMA's range), with mod-256
    wraparound exercised as the cumulative sums pass 255. Closed form
    per channel (counting the steps of each phase among 1..i):
    r_i = (d·7 + (i+2)//4 + 4·((i+1)//4) + 50·(i//4)) % 256, g/b with
    bases d·11 / d·13 and step weights (1,8,60) / (1,4,70) — replayed
    verbatim by the DuckDB oracle, so a bug in ANY op's decode (or in
    the index/run bookkeeping that a mis-encode would corrupt) flips
    a channel sum. OP_INDEX and OP_RGBA are pinned by hand fixtures
    in tests (they need exact revisits / an alpha channel)."""
    w, h = 4 + d % 5, 3 + d % 7
    rgb = bytearray()
    for i in range(w * h):
        c2, c3, c0 = (i + 2) // 4, (i + 1) // 4, i // 4
        rgb.append((d * 7 + c2 + 4 * c3 + 50 * c0) % 256)
        rgb.append((d * 11 + c2 + 8 * c3 + 60 * c0) % 256)
        rgb.append((d * 13 + c2 + 4 * c3 + 70 * c0) % 256)
    return _qoi_encode(bytes(rgb), w, h), w, h


def _decode_qoi(payload: bytes) -> dict:
    """Parse a QOI image (any channels/colorspace header; alpha is
    tracked for index hashing but only RGB contributes to the sums):
    validate magic + end marker, then replay the op stream — 64-slot
    index updated after EVERY decoded pixel value (qoi.c decode
    order), DIFF/LUMA wraparound arithmetic, run-length expansion —
    with truncation and pixel-count overrun checked loudly."""
    if payload[:4] != b"qoif":
        raise ValueError("not a QOI image (missing qoif magic)")
    if len(payload) < 14 + len(_QOI_END):
        raise ValueError("truncated QOI: shorter than header + end marker")
    w, h, channels, colorspace = struct.unpack(">IIBB", payload[4:14])
    if channels not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {channels}")
    if colorspace not in (0, 1):
        raise ValueError(f"QOI colorspace must be 0 or 1, got {colorspace}")
    if payload[-8:] != _QOI_END:
        raise ValueError("missing QOI end marker")
    data = payload[14:-8]
    index: list[tuple[int, int, int, int]] = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    n = w * h
    got = 0
    sum_r = sum_g = sum_b = 0
    i = 0
    while got < n:
        if i >= len(data):
            raise ValueError(
                f"truncated QOI stream: {got} of {n} pixels decoded"
            )
        byte = data[i]
        i += 1
        run = 1
        if byte == _QOI_OP_RGB:
            if i + 3 > len(data):
                raise ValueError("truncated QOI_OP_RGB")
            r, g, b = data[i], data[i + 1], data[i + 2]
            i += 3
        elif byte == _QOI_OP_RGBA:
            if i + 4 > len(data):
                raise ValueError("truncated QOI_OP_RGBA")
            r, g, b, a = data[i], data[i + 1], data[i + 2], data[i + 3]
            i += 4
        else:
            tag = byte & 0xC0
            if tag == _QOI_OP_INDEX:
                r, g, b, a = index[byte & 0x3F]
            elif tag == _QOI_OP_DIFF:
                r = (r + ((byte >> 4) & 0x3) - 2) % 256
                g = (g + ((byte >> 2) & 0x3) - 2) % 256
                b = (b + (byte & 0x3) - 2) % 256
            elif tag == _QOI_OP_LUMA:
                if i >= len(data):
                    raise ValueError("truncated QOI_OP_LUMA")
                dg = (byte & 0x3F) - 32
                second = data[i]
                i += 1
                r = (r + dg + ((second >> 4) & 0xF) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (second & 0xF) - 8) % 256
            else:  # _QOI_OP_RUN
                run = (byte & 0x3F) + 1
        # Index update on EVERY chunk, OP_RUN and OP_INDEX included —
        # deliberately kept after round-11 ADVICE suggested skipping it
        # on runs "to match qoi.c": qoi.c's decoder puts
        # `index[QOI_COLOR_HASH(px)] = px` AFTER the whole op-branch
        # chain, inside the chunk-consuming block, so it too writes on
        # OP_RUN/OP_INDEX chunks (the spec: "each pixel seen ... is put
        # into this array"). The only state divergence is vs qoi.c's
        # ENCODER (which skips run pixels), and it is unobservable:
        # OP_INDEX j can only reference a value hashing to j, so the
        # one slot an encoder-side skip leaves different — slot
        # hash(0,0,0,255)=53 after a leading run — can never be cited
        # by such an encoder without first writing it explicitly.
        # Pinned by test_qoi_leading_run_then_op_index.
        index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
        if got + run > n:
            raise ValueError(
                f"QOI run overruns the image: {got}+{run} > {n} pixels"
            )
        sum_r += r * run
        sum_g += g * run
        sum_b += b * run
        got += run
    if i != len(data):
        raise ValueError(
            f"{len(data) - i} trailing bytes between QOI pixel stream "
            "and end marker"
        )
    return {
        "fmt": "qoi",
        "width": w,
        "height": h,
        "n_pixels": n,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
    }


def _pack_f80(x: float) -> bytes:
    """Pack a positive number as the 80-bit IEEE 754 extended float
    the AIFF COMM chunk demands (1 sign + 15 exponent + 64 mantissa
    with an EXPLICIT leading-1 bit — the container quirk x86 callers
    forget). Sample rates are small positive integers here, so the
    normalize loop is exact."""
    if x <= 0:
        raise ValueError("AIFF sample rate must be positive")
    exp = 16383 + 63
    m = int(x)
    if m != x:
        raise ValueError("only integral sample rates supported")
    while m < 1 << 63:
        m <<= 1
        exp -= 1
    while m >= 1 << 64:
        m >>= 1
        exp += 1
    return struct.pack(">HQ", exp, m)


def _unpack_f80(b: bytes) -> float:
    """Inverse of :func:`_pack_f80` (sign bit honored, denormals not
    needed for sample rates)."""
    exp, m = struct.unpack(">HQ", b)
    sign = -1.0 if exp & 0x8000 else 1.0
    exp &= 0x7FFF
    return sign * m * 2.0 ** (exp - 16383 - 63)


def _aiff_bytes(d: int) -> tuple[bytes, int]:
    """Deterministic mono 16-bit 8 kHz AIFF for media id ``d``:
    the SAME logical samples as :func:`_wav_bytes`
    (n=160+d%100, sample i = ((d*13 + i*17) % 2003) - 1001), re-packed
    the way the AIFF container demands — big-endian everything
    (RIFF/WAV is little-endian), an 80-bit extended-float sample rate
    in COMM, and an 8-byte offset/blocksize preamble in SSND. Sharing
    the logical samples means a decoder that mishandles ANY of those
    quirks (endianness above all: byte-swapped int16 garbles peak/rms,
    not just order) produces different statistics than the WAV closed
    form — exactly what the oracle checks. Hand-packed because the
    stdlib ``aifc`` module was removed in Python 3.13 (PEP 594)."""
    n = 160 + d % 100
    samples = array("h", (((d * 13 + i * 17) % 2003) - 1001 for i in range(n)))
    if struct.pack("=H", 1) == struct.pack("<H", 1):  # little-endian host
        samples.byteswap()
    frames = samples.tobytes()
    comm = struct.pack(">hLh", 1, n, 16) + _pack_f80(8000.0)
    ssnd_body = struct.pack(">LL", 0, 0) + frames
    chunks = (
        b"COMM" + struct.pack(">L", len(comm)) + comm
        + b"SSND" + struct.pack(">L", len(ssnd_body)) + ssnd_body
    )
    # IFF chunks are word-aligned; 16-bit frames keep sizes even, so no
    # pad bytes arise here, but the decoder still handles them.
    form = b"AIFF" + chunks
    return b"FORM" + struct.pack(">L", len(form)) + form, n


def _decode_aiff(payload: bytes) -> dict:
    """Parse an AIFF (FORM/AIFF IFF container): walk the chunk list
    honoring word alignment, read COMM (channels / frame count /
    bits-per-sample / 80-bit extended sample rate) and SSND (offset +
    blocksize preamble, then big-endian PCM frames). Returns the same
    stat dict as :func:`_decode_wav` (fmt='aiff')."""
    if len(payload) < 12 or payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
        raise ValueError("not an AIFF (missing FORM/AIFF magic)")
    channels = n_frames = bits = None
    rate = None
    frames = None
    i = 12
    end = min(len(payload), 8 + struct.unpack(">L", payload[4:8])[0])
    while i + 8 <= end:
        cid = payload[i : i + 4]
        size = struct.unpack(">L", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"COMM":
            if len(body) < 18:
                raise ValueError("truncated COMM chunk")
            channels, n_frames, bits = struct.unpack(">hLh", body[:8])
            rate = _unpack_f80(body[8:18])
        elif cid == b"SSND":
            if len(body) < 8:
                raise ValueError("truncated SSND chunk")
            offset, _block = struct.unpack(">LL", body[:8])
            frames = body[8 + offset :]
        i += 8 + size + (size & 1)  # IFF word alignment pad
    if channels is None or frames is None:
        raise ValueError("AIFF missing COMM or SSND chunk")
    if bits != 16:
        raise ValueError("only 16-bit PCM AIFF supported")
    rate_i = int(rate)
    samples = array("h")
    samples.frombytes(frames[: 2 * n_frames * channels])
    if struct.pack("=H", 1) == struct.pack("<H", 1):  # little-endian host
        samples.byteswap()
    total = len(samples)
    ssq = 0
    peak = 0
    for s in samples:
        ssq += s * s
        a = -s if s < 0 else s
        if a > peak:
            peak = a
    return {
        "fmt": "aiff",
        "n_samples": total,
        "sample_rate": rate_i,
        "duration_ms": n_frames * 1000 // rate_i,
        "peak": peak,
        "rms": math.sqrt(ssq / total) if total else None,
    }


# G.711 µ-law companding (the Sun/ITU reference arithmetic, as in the
# public-domain g711.c that CPython's audioop wraps): 16→14-bit shift,
# clip 8159, bias 33 on the 14-bit side / 132 on the expanded side,
# 3-bit segment + 4-bit mantissa, ones-complement code byte.
_ULAW_CLIP14 = 8159
_ULAW_BIAS14 = 0x84 >> 2  # 33
_ULAW_BIAS16 = 0x84  # 132


def _ulaw_compress(s: int) -> int:
    """16-bit linear sample → 8-bit µ-law code (bit-exact with the
    ITU reference; law-tested against ``audioop.lin2ulaw`` over the
    full 16-bit range where that module still exists)."""
    s >>= 2  # arithmetic shift to the 14-bit domain
    mask = 0x7F if s < 0 else 0xFF
    if s < 0:
        s = -s
    if s > _ULAW_CLIP14:
        s = _ULAW_CLIP14
    s += _ULAW_BIAS14
    seg = max(s.bit_length() - 6, 0)
    if seg >= 8:
        return 0x7F ^ mask
    return ((seg << 4) | ((s >> (seg + 1)) & 0x0F)) ^ mask


def _ulaw_expand(code: int) -> int:
    """8-bit µ-law code → 16-bit linear sample (bit-exact with
    ``audioop.ulaw2lin`` width 2 for all 256 codes)."""
    code = ~code & 0xFF
    t = ((((code & 0x0F) << 3) + _ULAW_BIAS16) << ((code >> 4) & 0x07))
    t -= _ULAW_BIAS16
    return -t if code & 0x80 else t


def _alaw_compress(s: int) -> int:
    """16-bit linear sample → 8-bit A-law code (ITU G.711's other
    leg, the Sun g711.c arithmetic audioop.lin2alaw implements:
    13-bit domain via >>3, ones-complement fold to a = -s-1 for
    negatives, segment ends (0x20<<i)-1 so seg = max(bitlen(a)-5, 0),
    mantissa shift floored at 1, and the alternating 0x55 mask with
    the sign bit SET for positives — the inverse convention of µ-law).
    Law-tested bit-exact against audioop.lin2alaw over the full
    16-bit domain where that module still exists (<3.13)."""
    s >>= 3  # arithmetic shift to the 13-bit domain
    if s >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        s = -s - 1
    seg = max(s.bit_length() - 5, 0)
    if seg >= 8:
        return 0x7F ^ mask
    aval = (seg << 4) | ((s >> (1 if seg < 2 else seg)) & 0x0F)
    return aval ^ mask


def _alaw_expand(code: int) -> int:
    """8-bit A-law code → 16-bit linear sample (bit-exact with
    ``audioop.alaw2lin`` width 2 for all 256 codes)."""
    code ^= 0x55
    t = (code & 0x0F) << 4
    seg = (code & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if code & 0x80 else -t


def _wav_alaw_bytes(d: int) -> tuple[bytes, int]:
    """Deterministic mono 8 kHz A-law WAV for media id ``d``: the SAME
    logical samples as :func:`_wav_bytes`, companded through
    :func:`_alaw_compress` into 8-bit codes in a RIFF container with
    audio format 6 (WAVE_FORMAT_ALAW), the same 18-byte fmt +
    ``fact`` chunk layout as the µ-law fixture."""
    n = 160 + d % 100
    codes = bytes(
        _alaw_compress(((d * 13 + i * 17) % 2003) - 1001) for i in range(n)
    )
    fmt = struct.pack("<HHIIHHH", 6, 1, 8000, 8000, 1, 8, 0)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", n) + codes
        + (b"\x00" if n % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body, n


def _wav_ulaw_bytes(d: int) -> tuple[bytes, int]:
    """Deterministic mono 8 kHz µ-law WAV for media id ``d``: the SAME
    logical samples as :func:`_wav_bytes` (n=160+d%100, sample i =
    ((d*13+i*17)%2003)-1001), companded through :func:`_ulaw_compress`
    into 8-bit codes and wrapped in a RIFF container with audio format
    7, an 18-byte fmt chunk (cbSize=0), and a ``fact`` chunk before
    ``data`` — the non-PCM WAV layout the stdlib ``wave`` module
    refuses, so the decoder's own chunk walk and codec are what's
    under test."""
    n = 160 + d % 100
    codes = bytes(
        _ulaw_compress(((d * 13 + i * 17) % 2003) - 1001) for i in range(n)
    )
    fmt = struct.pack("<HHIIHHH", 7, 1, 8000, 8000, 1, 8, 0)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", n) + codes
        + (b"\x00" if n % 2 else b"")  # RIFF chunks are word-aligned
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body, n


def _wav_bytes(d: int) -> tuple[bytes, int]:
    """Deterministic mono 16-bit 8 kHz WAV for media id ``d``:
    n=160+d%100 samples, sample i = ((d*13 + i*17) % 2003) - 1001.
    Written through the stdlib ``wave`` module — a genuine RIFF/PCM
    container, not a fake."""
    n = 160 + d % 100
    samples = array(
        "h", (((d * 13 + i * 17) % 2003) - 1001 for i in range(n))
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(samples.tobytes())
    return buf.getvalue(), n


def synthetic_media(
    docs: DataFrame,
    id_col: str = "doc_id",
    image_fmt: str = "ppm",
    audio_fmt: str = "wav",
) -> DataFrame:
    """Deterministic media fixture over any id column: even ids become
    real binary images — PPM by default, 24-bit BMP with
    ``image_fmt="bmp"``, zlib-compressed PNG with ``image_fmt="png"``,
    LZW-compressed GIF with ``image_fmt="gif"``
    (same logical pixels, different containers), QOI with
    ``image_fmt="qoi"`` (its own op-cycling pixel walk, see
    :func:`_qoi_bytes`) — odd ids real PCM
    audio clips — WAV by default, big-endian AIFF
    with ``audio_fmt="aiff"`` (same logical samples, different
    container), G.711 µ-law-companded WAV with ``audio_fmt="ulaw"``
    (same logical samples through a genuine lossy codec; see
    :func:`_ppm_bytes` / :func:`_bmp_bytes` / :func:`_png_bytes` /
    :func:`_gif_bytes` / :func:`_wav_bytes` / :func:`_aiff_bytes` /
    :func:`_wav_ulaw_bytes` for the byte specs).
    Built in ``mapInPandas`` so payload construction is distributed
    and never shuffles; same ids ⇒ same bytes on any cluster layout."""
    img_specs = {
        "ppm": (_ppm_bytes, "image/x-portable-pixmap"),
        "bmp": (_bmp_bytes, "image/bmp"),
        "png": (_png_bytes, "image/png"),
        "gif": (_gif_bytes, "image/gif"),
        "qoi": (_qoi_bytes, "image/qoi"),
    }
    if image_fmt not in img_specs:
        raise ValueError(f"unsupported image_fmt {image_fmt!r}")
    aud_specs = {
        "wav": (_wav_bytes, "audio/wav"),
        "aiff": (_aiff_bytes, "audio/aiff"),
        "ulaw": (_wav_ulaw_bytes, "audio/basic"),
        "alaw": (_wav_alaw_bytes, "audio/basic"),
    }
    if audio_fmt not in aud_specs:
        raise ValueError(f"unsupported audio_fmt {audio_fmt!r}")
    img_bytes, img_mime = img_specs[image_fmt]
    aud_bytes, aud_mime = aud_specs[audio_fmt]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in MEDIA_SCHEMA.names}
            for d in pdf[id_col]:
                d = int(d)
                if d % 2 == 0:
                    payload, w, h = img_bytes(d)
                    rows["media_id"].append(d)
                    rows["kind"].append("image")
                    rows["payload"].append(payload)
                    rows["mime"].append(img_mime)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["duration_ms"].append(None)
                else:
                    payload, n = aud_bytes(d)
                    rows["media_id"].append(d)
                    rows["kind"].append("audio")
                    rows["payload"].append(payload)
                    rows["mime"].append(aud_mime)
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["duration_ms"].append(n * 1000 // 8000)
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_ppm(payload: bytes) -> dict:
    """Parse a binary PPM (P6): header tokens (whitespace- and
    ``#``-comment-tolerant, per the netpbm spec) then interleaved RGB
    bytes. Returns width/height and exact per-channel pixel sums."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (missing P6 magic)")
    # Tokenize the header: magic, width, height, maxval. Comments run
    # '#' to end-of-line; a single whitespace byte ends the header.
    tokens, i, tok = [], 2, b""
    while len(tokens) < 3 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            if tok:
                tokens.append(int(tok))
                tok = b""
        else:
            tok += c
        i += 1
    if len(tokens) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    body = payload[i : i + 3 * w * h]
    if len(body) != 3 * w * h:
        raise ValueError(
            f"truncated PPM body: want {3 * w * h} bytes, got {len(body)}"
        )
    return {
        "fmt": "ppm",
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "sum_r": sum(body[0::3]),
        "sum_g": sum(body[1::3]),
        "sum_b": sum(body[2::3]),
    }


def _riff_chunks(payload: bytes) -> Iterator[tuple[bytes, bytes]]:
    """Walk a RIFF/WAVE container's (tag, body) chunks, honoring the
    word-alignment pad byte after odd-length chunks."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        yield tag, body
        pos += 8 + size + (size & 1)


def _decode_wav(payload: bytes) -> dict:
    """Parse a WAV: PCM (format 1) through the stdlib ``wave`` module
    (16-bit little-endian mono/stereo); G.711 µ-law (format 7) through
    an own RIFF chunk walk — skipping the ``fact`` chunk the non-PCM
    layout inserts — and the :func:`_ulaw_expand` codec, a genuine
    lossy companding decode, not just container parsing. Returns
    sample count/rate, duration, integer peak over the decoded linear
    samples, and RMS (sqrt of exact-integer sum of squares / n)."""
    fmt_code = None
    for tag, body in _riff_chunks(payload):
        if tag == b"fmt ":
            fmt_code = struct.unpack_from("<H", body, 0)[0]
            break
    if fmt_code == 7:
        return _decode_wav_g711(payload, 7, _ulaw_expand, "ulaw")
    if fmt_code == 6:
        return _decode_wav_g711(payload, 6, _alaw_expand, "alaw")
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        n, rate = wf.getnframes(), wf.getframerate()
        samples = array("h")
        samples.frombytes(wf.readframes(n))
    total = len(samples)
    ssq = 0
    peak = 0
    for s in samples:
        ssq += s * s
        a = -s if s < 0 else s
        if a > peak:
            peak = a
    return {
        "fmt": "wav",
        "n_samples": total,
        "sample_rate": rate,
        "duration_ms": n * 1000 // rate,
        "peak": peak,
        # math.sqrt is the correctly-rounded IEEE sqrt (x ** 0.5
        # goes through pow and can be one ulp off DuckDB's sqrt)
        "rms": math.sqrt(ssq / total) if total else None,
    }


def _decode_wav_g711(
    payload: bytes, expect_code: int, expand, name: str
) -> dict:
    """Decode a G.711-companded WAV (audio format 7 = µ-law, 6 =
    A-law; 8-bit codes): walk the RIFF chunks (validating fmt,
    skipping ``fact`` and anything else), expand every code byte to
    its 16-bit linear sample through ``expand``, and compute the same
    stats as the PCM path (fmt=``name``)."""
    fmt = data = None
    for tag, body in _riff_chunks(payload):
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError(f"{name} WAV missing fmt or data chunk")
    code, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if code != expect_code or channels != 1 or bits != 8:
        raise ValueError(
            f"only mono 8-bit {name} WAV supported "
            f"(format={code}, channels={channels}, bits={bits})"
        )
    n = len(data)
    ssq = 0
    peak = 0
    for c in data:
        s = expand(c)
        ssq += s * s
        a = -s if s < 0 else s
        if a > peak:
            peak = a
    return {
        "fmt": name,
        "n_samples": n,
        "sample_rate": rate,
        "duration_ms": n * 1000 // rate,
        "peak": peak,
        "rms": math.sqrt(ssq / n) if n else None,
    }


def decode_media(media: DataFrame) -> DataFrame:
    """REAL media decode (no codec library): dispatch on the payload's
    magic bytes — ``P6`` → PPM, ``BM`` → BMP, ``\\x89PNG`` → PNG,
    ``GIF8`` → GIF image stats; ``RIFF`` → WAV, ``FORM`` → AIFF audio
    stats — inside
    Arrow-batched ``mapInPandas``. Unknown containers raise
    loudly (silently wrong features are worse than a failed task).

    Scale shape is identical to :func:`extract_media_features`:
    payload bytes are consumed where the scan runs and never shuffle;
    the output is a narrow typed relation Catalyst plans like any
    other. This upgrades §2.10 multimodal from plumbing-only to an
    end-to-end decoded path for the two containers the Python stdlib
    can parse."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in DECODED_SCHEMA.names}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                p = bytes(payload) if payload is not None else b""
                if p.startswith(b"P6"):
                    d = _decode_ppm(p)
                elif p.startswith(b"BM"):
                    d = _decode_bmp(p)
                elif p.startswith(b"\x89PNG"):
                    d = _decode_png(p)
                elif p.startswith(b"GIF8"):
                    d = _decode_gif(p)
                elif p.startswith(b"qoif"):
                    d = _decode_qoi(p)
                elif p.startswith(b"RIFF"):
                    d = _decode_wav(p)
                elif p.startswith(b"FORM"):
                    d = _decode_aiff(p)
                else:
                    raise ValueError(
                        f"media_id={mid}: unrecognized container "
                        f"(magic={p[:4]!r}); only PPM/P6, BMP, PNG, "
                        "GIF, QOI, RIFF/WAV, and FORM/AIFF decode "
                        "without codec libraries"
                    )
                rows["media_id"].append(int(mid))
                rows["kind"].append(kind)
                for k in DECODED_SCHEMA.names[2:]:
                    rows[k].append(d.get(k))
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


FRAME_ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_in_frame", IntegerType()),
        StructField("peak", IntegerType()),
        StructField("rms", DoubleType()),
    ]
)


def audio_frame_energy(media: DataFrame, frame_len: int = 64) -> DataFrame:
    """Per-frame audio energy: split each PCM WAV payload into
    fixed-length sample frames and emit one row per frame with its
    sample count, integer peak, and RMS — the 1→N audio analysis
    twin of :func:`sample_frames` (which fans out image frames), and
    the feature a silence/loudness segmenter consumes.

    Decode runs inside Arrow-batched ``mapInPandas`` on the stdlib
    ``wave`` module — payload bytes never shuffle; the fan-out output
    is a narrow typed relation (≈ n_samples/frame_len rows per clip).
    RMS is ``(Σs² / n) ** 0.5`` on exact integer sums — the identical
    IEEE expression the byte-spec oracle replays. Non-audio rows are
    ignored by contract (filter ``kind = 'audio'`` upstream; a non-
    RIFF payload in an audio row still raises loudly).
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in FRAME_ENERGY_SCHEMA.names}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                p = bytes(payload) if payload is not None else b""
                if not p.startswith(b"RIFF"):
                    raise ValueError(
                        f"media_id={mid}: audio row without RIFF magic"
                    )
                with wave.open(io.BytesIO(p), "rb") as wf:
                    if wf.getsampwidth() != 2:
                        raise ValueError("only 16-bit PCM WAV supported")
                    n = wf.getnframes()
                    samples = array("h")
                    samples.frombytes(wf.readframes(n))
                for f0 in range(0, len(samples), frame_len):
                    chunk = samples[f0 : f0 + frame_len]
                    ssq = 0
                    peak = 0
                    for s in chunk:
                        ssq += s * s
                        a = -s if s < 0 else s
                        if a > peak:
                            peak = a
                    cnt = len(chunk)
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(f0 // frame_len)
                    rows["n_in_frame"].append(cnt)
                    rows["peak"].append(peak)
                    rows["rms"].append(math.sqrt(ssq / cnt) if cnt else None)
            yield pd.DataFrame(rows)

    return media.mapInPandas(frames, schema=FRAME_ENERGY_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("orig_w", IntegerType(), True),
        StructField("orig_h", IntegerType(), True),
        StructField("new_w", IntegerType(), True),
        StructField("new_h", IntegerType(), True),
        StructField("sum_r", LongType(), True),
        StructField("sum_g", LongType(), True),
        StructField("sum_b", LongType(), True),
    ]
)


def resize_ppm_stats(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL image downsampling for the stdlib-parseable container:
    nearest-neighbor stride-``factor`` resize of each binary PPM
    (pixel (y, x) of the output reads pixel (y·f, x·f) of the input)
    with the resized image's exact per-channel sums — the decoded-
    feature upgrade of :func:`resize_media`'s digest-stub plumbing,
    same Arrow-batched no-shuffle shape. Feature sums instead of
    payload bytes keep the result oracle-replayable (the byte spec is
    closed-form) and driver-canonicalizable.

    Non-image rows are ignored by contract (filter kind='image'
    upstream); non-P6 payloads raise loudly.
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in RESIZED_SCHEMA.names}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                p = bytes(payload) if payload is not None else b""
                d = _decode_ppm(p)  # raises on non-P6
                w, h = d["width"], d["height"]
                # re-parse the body for pixel access (decode returns sums)
                header_end = p.index(b"255\n") + 4
                body = p[header_end:]
                new_w = (w + factor - 1) // factor
                new_h = (h + factor - 1) // factor
                sums = [0, 0, 0]
                for yy in range(new_h):
                    for xx in range(new_w):
                        base = 3 * ((yy * factor) * w + (xx * factor))
                        for c in range(3):
                            sums[c] += body[base + c]
                rows["media_id"].append(int(mid))
                rows["orig_w"].append(w)
                rows["orig_h"].append(h)
                rows["new_w"].append(new_w)
                rows["new_h"].append(new_h)
                rows["sum_r"].append(sums[0])
                rows["sum_g"].append(sums[1])
                rows["sum_b"].append(sums[2])
            yield pd.DataFrame(rows)

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)
