"""Binary media plumbing: decode, resize, audio frames, corpus report.

Split out of the original single-file driver_queries module; sections
are verbatim (code moved, not rewritten) so oracle parity is untouched.
"""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries._shared import *  # noqa: F401,F403
from real_time_stock_market_data_pipeline__spark.driver_queries.dedup import (  # noqa: F401
    _minhash_cte,
)
from real_time_stock_market_data_pipeline__spark.driver_queries.text import (  # noqa: F401
    _TEXT_STATS_ORACLE,
)


# --------------------------------------------------------------------------
# Multimodal plumbing (stubbed decode, real Arrow/mapInPandas pipeline)
# --------------------------------------------------------------------------


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/mapInPandas feature extraction, scalarized for the driver:
    the library API returns an ``array<float>`` features column, but
    array cells don't canonicalize portably, so the registered query
    projects f0..f7 scalar columns (same values, same plan below the
    projection)."""
    from real_time_stock_market_data_pipeline__spark.operators import multimodal

    ensure_engine_conf(spark)
    media = multimodal.media_from_documents(_table("documents")(spark, sf_dir))
    feat = multimodal.extract_media_features(media, use_stub=True)
    return feat.select(
        "media_id",
        "kind",
        "n_bytes",
        "content_sha",
        *[F.col("features")[i].alias(f"f{i}") for i in range(8)],
    )


def _media_features_oracle() -> str:
    feats = ", ".join(
        "CAST(("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(sha, {8 * i + j + 1}, 1)) - 1) * {16 ** (7 - j)}"
            for j in range(8)
        )
        + f") / 4294967296.0 AS FLOAT) AS f{i}"
        for i in range(8)
    )
    return f"""
WITH m AS (SELECT doc_id AS media_id, 'image' AS kind,
                  octet_length(encode(text)) AS n_bytes,
                  sha256(text) AS sha
           FROM documents)
SELECT media_id, kind, n_bytes, sha AS content_sha, {feats}
FROM m
"""


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode (no codec library): deterministic binary
    PPM / PCM WAV payloads built per doc_id, then byte-level header
    parsing + pixel/sample statistics in Arrow-batched ``mapInPandas``
    (`operators/multimodal.py:decode_media`). The oracle replays the
    decoded features from the closed-form byte spec — so a parsing bug
    (endianness, header offset, channel interleave) breaks the hash."""
    from real_time_stock_market_data_pipeline__spark.operators import multimodal

    ensure_engine_conf(spark)
    docs = _table("documents")(spark, sf_dir)
    return multimodal.decode_media(multimodal.synthetic_media(docs))


# Replays multimodal._ppm_bytes/_wav_bytes + decode_media: images are
# w=4+d%5 × h=3+d%7 with interleaved-RGB byte j = (d*7+j*11)%256;
# audio is n=160+d%100 samples of ((d*13+i*17)%2003)-1001 at 8 kHz.
# All sums exact integers; rms = sqrt(ssq/n) is correctly-rounded IEEE
# in both engines.
_MEDIA_DECODE_ORACLE = """
WITH img AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 2 = 0
),
px AS (SELECT doc_id, w, h, unnest(range(0, 3 * w * h)) AS j FROM img),
imgf AS (
  SELECT doc_id, w, h,
         sum(CASE WHEN j % 3 = 0 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_r,
         sum(CASE WHEN j % 3 = 1 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_g,
         sum(CASE WHEN j % 3 = 2 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_b
  FROM px GROUP BY doc_id, w, h
),
aud AS (SELECT doc_id, 160 + doc_id % 100 AS n FROM documents WHERE doc_id % 2 = 1),
smp AS (
  SELECT doc_id, n, ((doc_id * 13 + unnest(range(0, n)) * 17) % 2003) - 1001 AS s
  FROM aud
),
audf AS (
  SELECT doc_id, n, max(abs(s)) AS peak, sum(s * s) AS ssq
  FROM smp GROUP BY doc_id, n
)
SELECT doc_id AS media_id, 'image' AS kind, 'ppm' AS fmt,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
       CAST(sum_b AS BIGINT) AS sum_b,
       CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS INT) AS sample_rate,
       CAST(NULL AS INT) AS duration_ms, CAST(NULL AS INT) AS peak,
       CAST(NULL AS DOUBLE) AS rms
FROM imgf
UNION ALL
SELECT doc_id, 'audio', 'wav', NULL, NULL, NULL, NULL, NULL, NULL,
       CAST(n AS BIGINT), 8000, CAST(n * 1000 // 8000 AS INT),
       CAST(peak AS INT), sqrt(CAST(ssq AS DOUBLE) / n)
FROM audf
"""


def q_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second real image container (round 8): the SAME logical pixels
    as `media_decode`'s PPMs, re-packed as 24-bit uncompressed BMP
    (bottom-up rows, BGR channels, 4-byte row padding) and decoded by
    the pure-stdlib BMP parser
    (`operators/multimodal.py:_decode_bmp` via `decode_media`). The
    oracle replays the PPM closed form — so mishandling any of the
    three container quirks (row flip, BGR, padding) flips a channel
    sum and breaks the hash."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        multimodal,
    )

    ensure_engine_conf(spark)
    docs = _table("documents")(spark, sf_dir)
    media = multimodal.synthetic_media(docs, image_fmt="bmp")
    return multimodal.decode_media(media.where(F.col("kind") == "image"))


_BMP_DECODE_ORACLE = """
WITH img AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 2 = 0
),
px AS (SELECT doc_id, w, h, unnest(range(0, 3 * w * h)) AS j FROM img),
imgf AS (
  SELECT doc_id, w, h,
         sum(CASE WHEN j % 3 = 0 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_r,
         sum(CASE WHEN j % 3 = 1 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_g,
         sum(CASE WHEN j % 3 = 2 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_b
  FROM px GROUP BY doc_id, w, h
)
SELECT doc_id AS media_id, 'image' AS kind, 'bmp' AS fmt,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
       CAST(sum_b AS BIGINT) AS sum_b,
       CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS INT) AS sample_rate,
       CAST(NULL AS INT) AS duration_ms, CAST(NULL AS INT) AS peak,
       CAST(NULL AS DOUBLE) AS rms
FROM imgf
"""


def q_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third real image container (round 9): the SAME logical pixels
    as `media_decode`'s PPMs, re-packed as zlib-compressed PNG — each
    image's scanlines cycle through ALL FIVE PNG filter types
    (None/Sub/Up/Average/Paeth), the IDAT stream is split across two
    chunks, and every chunk carries a CRC32 — and decoded by the
    pure-stdlib PNG parser (`operators/multimodal.py:_decode_png` via
    `decode_media`). The oracle replays the PPM closed form — so a bug
    in defiltering, DEFLATE handling, or IDAT reassembly flips a
    channel sum and breaks the hash."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        multimodal,
    )

    ensure_engine_conf(spark)
    docs = _table("documents")(spark, sf_dir)
    media = multimodal.synthetic_media(docs, image_fmt="png")
    return multimodal.decode_media(media.where(F.col("kind") == "image"))


_PNG_DECODE_ORACLE = """
WITH img AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 2 = 0
),
px AS (SELECT doc_id, w, h, unnest(range(0, 3 * w * h)) AS j FROM img),
imgf AS (
  SELECT doc_id, w, h,
         sum(CASE WHEN j % 3 = 0 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_r,
         sum(CASE WHEN j % 3 = 1 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_g,
         sum(CASE WHEN j % 3 = 2 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_b
  FROM px GROUP BY doc_id, w, h
)
SELECT doc_id AS media_id, 'image' AS kind, 'png' AS fmt,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
       CAST(sum_b AS BIGINT) AS sum_b,
       CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS INT) AS sample_rate,
       CAST(NULL AS INT) AS duration_ms, CAST(NULL AS INT) AS peak,
       CAST(NULL AS DOUBLE) AS rms
FROM imgf
"""


def q_qoi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth real image container (round 11): QOI (qoiformat.org) —
    run/delta ops over a 64-slot running color index, decoded by the
    pure-stdlib parser (`operators/multimodal.py:_decode_qoi` via
    `decode_media`). Unlike the shared-pixel containers this fixture
    walks its own closed-form pixel sequence DESIGNED to cycle the
    encoder through RUN, DIFF, LUMA, and RGB ops every four pixels
    (with mod-256 wraparound as the sums pass 255) — the oracle
    replays the closed form, so a bug in any op's decode arithmetic
    or the index/run bookkeeping flips a channel sum and breaks the
    hash. OP_INDEX/OP_RGBA are pinned by hand fixtures in tests."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        multimodal,
    )

    ensure_engine_conf(spark)
    docs = _table("documents")(spark, sf_dir)
    media = multimodal.synthetic_media(docs, image_fmt="qoi")
    return multimodal.decode_media(media.where(F.col("kind") == "image"))


_QOI_DECODE_ORACLE = """
WITH img AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 2 = 0
),
px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM img),
imgf AS (
  SELECT doc_id, w, h,
         sum((doc_id * 7 + (i + 2) // 4 + 4 * ((i + 1) // 4)
              + 50 * (i // 4)) % 256) AS sum_r,
         sum((doc_id * 11 + (i + 2) // 4 + 8 * ((i + 1) // 4)
              + 60 * (i // 4)) % 256) AS sum_g,
         sum((doc_id * 13 + (i + 2) // 4 + 4 * ((i + 1) // 4)
              + 70 * (i // 4)) % 256) AS sum_b
  FROM px GROUP BY doc_id, w, h
)
SELECT doc_id AS media_id, 'image' AS kind, 'qoi' AS fmt,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
       CAST(sum_b AS BIGINT) AS sum_b,
       CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS INT) AS sample_rate,
       CAST(NULL AS INT) AS duration_ms, CAST(NULL AS INT) AS peak,
       CAST(NULL AS DOUBLE) AS rms
FROM imgf
"""


def q_ulaw_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First real lossy CODEC decode (round 9): the SAME logical
    samples as `media_decode`'s WAVs, companded through G.711 µ-law
    (Sun/ITU reference arithmetic, bit-exact with audioop where that
    module exists) into 8-bit codes in a format-7 RIFF container with
    a `fact` chunk, then expanded back by the pure-stdlib decoder
    (`operators/multimodal.py:_decode_wav_ulaw` via `decode_media`).
    The oracle replays compress∘expand per sample in integer
    arithmetic — segment via the cross-engine `length(bin(x))`
    bit-length identity, mantissa via shifts — so a companding bug
    (bias, clip, segment boundary, sign fold) shifts peak/rms and
    breaks the hash. Unlike the container rounds, the decoded values
    here are DIFFERENT from the PCM WAV's (the codec is lossy): the
    oracle's expected stats are over the quantized lattice."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        multimodal,
    )

    ensure_engine_conf(spark)
    docs = _table("documents")(spark, sf_dir)
    media = multimodal.synthetic_media(docs, audio_fmt="ulaw")
    return multimodal.decode_media(media.where(F.col("kind") == "audio"))


# compress: s14 = floor(s/4); a = min(|s14|, 8159) + 33; seg =
# max(bitlen(a)-6, 0); mant = (a >> seg+1) & 15. expand: ±(((mant<<3)
# + 132) << seg) - 132. Fixture samples are in [-1001, 1001], so a <=
# 283 and the seg>=8 clip branch is unreachable (kept driver-side for
# generality, not replayed here).
_ULAW_DECODE_ORACLE = """
WITH aud AS (
  SELECT doc_id, 160 + doc_id % 100 AS n
  FROM documents WHERE doc_id % 2 = 1
),
smp AS (
  SELECT doc_id, n, ((doc_id * 13 + unnest(range(0, n)) * 17) % 2003) - 1001 AS s
  FROM aud
),
c14 AS (
  SELECT doc_id, n, CAST(floor(s / 4.0) AS INTEGER) AS s14 FROM smp
),
seg AS (
  SELECT doc_id, n, s14 < 0 AS neg,
         least(abs(s14), 8159) + 33 AS a
  FROM c14
),
lin AS (
  SELECT doc_id, n,
         CASE WHEN neg THEN -q ELSE q END AS v
  FROM (
    SELECT doc_id, n, neg,
           ((((a >> (g + 1)) & 15) * 8 + 132) << g) - 132 AS q
    FROM (SELECT doc_id, n, neg, a,
                 greatest(length(bin(a)) - 6, 0) AS g
          FROM seg)
  )
),
audf AS (
  SELECT doc_id, n, max(abs(v)) AS peak, sum(CAST(v AS BIGINT) * v) AS ssq
  FROM lin GROUP BY doc_id, n
)
SELECT doc_id AS media_id, 'audio' AS kind, 'ulaw' AS fmt,
       CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
       CAST(NULL AS BIGINT) AS n_pixels,
       CAST(NULL AS BIGINT) AS sum_r, CAST(NULL AS BIGINT) AS sum_g,
       CAST(NULL AS BIGINT) AS sum_b,
       CAST(n AS BIGINT) AS n_samples, 8000 AS sample_rate,
       CAST(n * 1000 // 8000 AS INT) AS duration_ms,
       CAST(peak AS INT) AS peak, sqrt(CAST(ssq AS DOUBLE) / n) AS rms
FROM audf
"""


def q_alaw_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711's other leg (round-10 stretch, pairing the round-9 µ-law
    query): the SAME logical samples companded through A-law (Sun
    g711.c arithmetic, bit-exact with audioop both directions over
    the full domains) into 8-bit codes in a format-6 RIFF container,
    expanded back by the pure-stdlib decoder
    (`operators/multimodal.py:_alaw_compress/_alaw_expand` via
    `decode_media`). The oracle replays compress∘expand per sample in
    integer SQL: the 13-bit >>3 domain, the ones-complement -s-1
    negative fold, seg = max(bitlen(a)-5, 0) via the cross-engine
    `length(bin(x))` identity, the seg<2 mantissa-shift floor, and
    the segment-wise expansion t=mant·16 (+8 / +264 / (t+264)<<(g-1))
    — so a bias, fold, or segment-boundary bug shifts peak/rms and
    breaks the hash. The A-law lattice differs from µ-law's, so a
    codec mix-up (format 6 through the µ-law expander) also fails."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        multimodal,
    )

    ensure_engine_conf(spark)
    docs = _table("documents")(spark, sf_dir)
    media = multimodal.synthetic_media(docs, audio_fmt="alaw")
    return multimodal.decode_media(media.where(F.col("kind") == "audio"))


# compress: s13 = floor(s/8); neg = s13<0; a = neg ? -s13-1 : s13;
# seg = max(bitlen(a)-5, 0); mant = (a >> max(seg,1)) & 15. expand:
# t = mant*16; seg 0 → t+8, seg 1 → t+264, else (t+264)<<(seg-1);
# sign from neg. Fixture samples are in [-1001, 1001], so a <= 125,
# seg <= 2 and the seg>=8 clip branch is unreachable (kept
# driver-side for generality, not replayed here).
_ALAW_DECODE_ORACLE = """
WITH aud AS (
  SELECT doc_id, 160 + doc_id % 100 AS n
  FROM documents WHERE doc_id % 2 = 1
),
smp AS (
  SELECT doc_id, n, ((doc_id * 13 + unnest(range(0, n)) * 17) % 2003) - 1001 AS s
  FROM aud
),
c13 AS (
  SELECT doc_id, n, CAST(floor(s / 8.0) AS INTEGER) AS s13 FROM smp
),
seg AS (
  SELECT doc_id, n, s13 < 0 AS neg,
         CASE WHEN s13 < 0 THEN -s13 - 1 ELSE s13 END AS a
  FROM c13
),
lin AS (
  SELECT doc_id, n,
         CASE WHEN neg THEN -q ELSE q END AS v
  FROM (
    SELECT doc_id, n, neg,
           CASE WHEN g = 0 THEN m * 16 + 8
                WHEN g = 1 THEN m * 16 + 264
                ELSE (m * 16 + 264) << (g - 1) END AS q
    FROM (
      SELECT doc_id, n, neg, g,
             (a >> CASE WHEN g < 2 THEN 1 ELSE g END) & 15 AS m
      FROM (SELECT doc_id, n, neg, a,
                   greatest(length(bin(a)) - 5, 0) AS g
            FROM seg)
    )
  )
),
audf AS (
  SELECT doc_id, n, max(abs(v)) AS peak, sum(CAST(v AS BIGINT) * v) AS ssq
  FROM lin GROUP BY doc_id, n
)
SELECT doc_id AS media_id, 'audio' AS kind, 'alaw' AS fmt,
       CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
       CAST(NULL AS BIGINT) AS n_pixels,
       CAST(NULL AS BIGINT) AS sum_r, CAST(NULL AS BIGINT) AS sum_g,
       CAST(NULL AS BIGINT) AS sum_b,
       CAST(n AS BIGINT) AS n_samples, 8000 AS sample_rate,
       CAST(n * 1000 // 8000 AS INT) AS duration_ms,
       CAST(peak AS INT) AS peak, sqrt(CAST(ssq AS DOUBLE) / n) AS rms
FROM audf
"""


def q_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth real image container (round 9): the SAME logical pixels
    as `media_decode`'s PPMs, re-expressed the way GIF demands —
    indexed color through a first-occurrence palette, GIF-variant LZW
    compression (variable code width on the giflib boundary, CLEAR/
    EOI, KwKwK), 32-byte sub-block splits, and 4-pass interlacing on
    every other image — decoded by the pure-stdlib GIF parser
    (`operators/multimodal.py:_decode_gif` via `decode_media`). The
    oracle replays the PPM closed form — so a bug in the palette
    indirection, the LZW protocol, sub-block reassembly, or the
    de-interlace row order flips a channel sum and breaks the hash."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        multimodal,
    )

    ensure_engine_conf(spark)
    docs = _table("documents")(spark, sf_dir)
    media = multimodal.synthetic_media(docs, image_fmt="gif")
    return multimodal.decode_media(media.where(F.col("kind") == "image"))


_GIF_DECODE_ORACLE = """
WITH img AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 2 = 0
),
px AS (SELECT doc_id, w, h, unnest(range(0, 3 * w * h)) AS j FROM img),
imgf AS (
  SELECT doc_id, w, h,
         sum(CASE WHEN j % 3 = 0 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_r,
         sum(CASE WHEN j % 3 = 1 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_g,
         sum(CASE WHEN j % 3 = 2 THEN (doc_id * 7 + j * 11) % 256 END) AS sum_b
  FROM px GROUP BY doc_id, w, h
)
SELECT doc_id AS media_id, 'image' AS kind, 'gif' AS fmt,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
       CAST(sum_b AS BIGINT) AS sum_b,
       CAST(NULL AS BIGINT) AS n_samples, CAST(NULL AS INT) AS sample_rate,
       CAST(NULL AS INT) AS duration_ms, CAST(NULL AS INT) AS peak,
       CAST(NULL AS DOUBLE) AS rms
FROM imgf
"""


def q_aiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second real audio container (round 9, mirroring round 8's BMP):
    the SAME logical samples as `media_decode`'s WAVs, re-packed as
    big-endian AIFF (80-bit extended sample rate in COMM, offset
    preamble in SSND, byte-swapped PCM) and decoded by the pure-stdlib
    AIFF parser (`operators/multimodal.py:_decode_aiff` via
    `decode_media`). The oracle replays the WAV closed form — so
    mishandling any container quirk (endianness above all) garbles
    peak/rms and breaks the hash."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        multimodal,
    )

    ensure_engine_conf(spark)
    docs = _table("documents")(spark, sf_dir)
    media = multimodal.synthetic_media(docs, audio_fmt="aiff")
    return multimodal.decode_media(media.where(F.col("kind") == "audio"))


_AIFF_DECODE_ORACLE = """
WITH aud AS (
  SELECT doc_id, 160 + doc_id % 100 AS n
  FROM documents WHERE doc_id % 2 = 1
),
smp AS (
  SELECT doc_id, n, ((doc_id * 13 + unnest(range(0, n)) * 17) % 2003) - 1001 AS s
  FROM aud
),
audf AS (
  SELECT doc_id, n, max(abs(s)) AS peak, sum(s * s) AS ssq
  FROM smp GROUP BY doc_id, n
)
SELECT doc_id AS media_id, 'audio' AS kind, 'aiff' AS fmt,
       CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
       CAST(NULL AS BIGINT) AS n_pixels,
       CAST(NULL AS BIGINT) AS sum_r, CAST(NULL AS BIGINT) AS sum_g,
       CAST(NULL AS BIGINT) AS sum_b,
       CAST(n AS BIGINT) AS n_samples, 8000 AS sample_rate,
       CAST(n * 1000 // 8000 AS INT) AS duration_ms,
       CAST(peak AS INT) AS peak,
       sqrt(CAST(ssq AS DOUBLE) / n) AS rms
FROM audf
"""


# --------------------------------------------------------------------------
# Round-7 batch 5: audio frame energy, MinHash audit, corpus report
# --------------------------------------------------------------------------


def q_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame RMS/peak over the synthetic WAV clips — 1→N audio
    fan-out with real stdlib decode
    (`operators/multimodal.py:audio_frame_energy`); the oracle replays
    the sample spec (`multimodal._wav_bytes`) declaratively."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        multimodal,
    )

    media = multimodal.synthetic_media(_table("documents")(spark, sf_dir))
    return multimodal.audio_frame_energy(
        media.where(F.col("kind") == "audio"), frame_len=64
    )


_AUDIO_FRAMES_ORACLE = """
WITH aud AS (
  SELECT doc_id, 160 + doc_id % 100 AS n
  FROM documents WHERE doc_id % 2 = 1
),
smp AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM aud),
sv AS (
  SELECT doc_id, CAST(i // 64 AS INT) AS frame_idx,
         ((doc_id * 13 + i * 17) % 2003) - 1001 AS s
  FROM smp
)
SELECT doc_id AS media_id, frame_idx,
       CAST(count(*) AS INT) AS n_in_frame,
       CAST(max(abs(s)) AS INT) AS peak,
       sqrt(CAST(sum(s * s) AS DOUBLE) / count(*)) AS rms
FROM sv GROUP BY doc_id, frame_idx
"""


def q_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator audit: signature-estimated vs true Jaccard
    on every LSH candidate pair
    (`operators/dedup.py:minhash_accuracy`)."""
    return dedup.minhash_accuracy(_table("documents")(spark, sf_dir))


def _minhash_accuracy_oracle() -> str:
    match_sum = " + ".join(
        f"CASE WHEN sa.sig[{i + 1}] = sb.sig[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(dedup.MINHASH_PERMS)
    )
    return f"""
WITH {_minhash_cte()},
est AS (
  SELECT c.id_a, c.id_b,
         round(({match_sum}) / {float(dedup.MINHASH_PERMS)!r}, 6)
           AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b
),
tr AS (
  SELECT c.id_a, c.id_b,
         round(CASE WHEN len(list_distinct(list_concat(sa.sh, sb.sh))) > 0
                    THEN CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                         / len(list_distinct(list_concat(sa.sh, sb.sh)))
                    ELSE 0.0 END, 4) AS true_jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
)
SELECT e.id_a, e.id_b, e.est_jaccard, t.true_jaccard,
       round(abs(e.est_jaccard - t.true_jaccard), 6) AS abs_err
FROM est e JOIN tr t ON e.id_a = t.id_a AND e.id_b = t.id_b
"""


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus dashboard: volume, mean length/quality,
    exact-duplicate and near-duplicate exposure — the composition a
    data-curation run reads before deciding per-source treatment
    (text_stats × exact-dup grouping × LSH candidate ids)."""
    docs = _table("documents")(spark, sf_dir)
    stats = text.text_stats(docs).select("doc_id", "n_words", "quality_score")
    norm = docs.select(
        "doc_id", "source", dedup.normalized_text("text").alias("nrm")
    )
    nc = norm.groupBy("nrm").agg(F.count(F.lit(1)).alias("c"))
    cand = dedup.dedup_minhash_pairs(docs).localCheckpoint(eager=True)
    nd_ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .unionByName(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("is_nd", F.lit(1))
    )
    base = (
        norm.join(nc, "nrm")
        .join(stats, "doc_id")
        .join(nd_ids, "doc_id", "left")
    )
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum("n_words").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_words"),
        F.round(
            F.sum(F.col("quality_score").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_exact_dup"),
        F.sum(F.coalesce(F.col("is_nd"), F.lit(0))).alias("n_neardup"),
        F.round(
            F.sum(F.coalesce(F.col("is_nd"), F.lit(0))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("neardup_fraction"),
    )


def _corpus_report_oracle() -> str:
    return f"""
WITH {_minhash_cte()},
nd_ids AS (
  SELECT DISTINCT doc_id FROM (
    SELECT id_a AS doc_id FROM cand
    UNION ALL SELECT id_b AS doc_id FROM cand
  ) u
),
nrm AS (
  SELECT doc_id, source, {_NORM.format(col="text")} AS nrm FROM documents
),
nc AS (SELECT nrm, count(*) AS c FROM nrm GROUP BY nrm),
base AS (
  SELECT n.source, s.n_words, s.quality_score,
         CASE WHEN c2.c > 1 THEN 1 ELSE 0 END AS is_exact_dup,
         CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_nd
  FROM nrm n
  JOIN ({_TEXT_STATS_ORACLE}) s ON n.doc_id = s.doc_id
  JOIN nc c2 ON n.nrm = c2.nrm
  LEFT JOIN nd_ids nd ON n.doc_id = nd.doc_id
)
SELECT source,
       count(*) AS n_docs,
       round(CAST(sum(n_words) AS DOUBLE) / count(*), 6) AS mean_words,
       round(CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_quality,
       CAST(sum(is_exact_dup) AS BIGINT) AS n_exact_dup,
       CAST(sum(is_nd) AS BIGINT) AS n_neardup,
       round(CAST(sum(is_nd) AS DOUBLE) / count(*), 6) AS neardup_fraction
FROM base GROUP BY source
"""


# --------------------------------------------------------------------------
# Round-7 batch 15: hierarchy pointer doubling, real PPM resize
# --------------------------------------------------------------------------


def q_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root/depth resolution of the decimal-digit customer forest
    (parent = custkey DIV 10) by log-round pointer doubling; the
    oracle walks every chain with a recursive CTE
    (`operators/relational.py:resolve_hierarchy`)."""
    ensure_engine_conf(spark)
    cust = load_table(spark, sf_dir, "customer")
    div = F.expr("c_custkey DIV 10")
    nodes = cust.select(
        F.col("c_custkey").alias("id"),
        F.when(div != 0, div).alias("parent"),
    )
    return relational.resolve_hierarchy(nodes, "id", "parent")


_HIERARCHY_ORACLE = """
WITH RECURSIVE n AS (
  SELECT c_custkey AS id,
         CASE WHEN c_custkey // 10 = 0 THEN NULL
              ELSE c_custkey // 10 END AS parent
  FROM customer
),
rec AS (
  SELECT id, id AS cur, 0 AS depth FROM n
  UNION ALL
  SELECT r.id, n2.parent AS cur, r.depth + 1
  FROM rec r JOIN n n2 ON r.cur = n2.id
  WHERE n2.parent IS NOT NULL
)
SELECT r.id, r.cur AS root, r.depth
FROM rec r JOIN n n3 ON r.cur = n3.id
WHERE n3.parent IS NULL
"""


def q_resize_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real nearest-neighbor PPM downsampling (stride 2) with exact
    resized per-channel sums; the oracle replays the sampled pixel
    grid from the byte spec
    (`operators/multimodal.py:resize_ppm_stats`)."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        multimodal,
    )

    media = multimodal.synthetic_media(_table("documents")(spark, sf_dir))
    return multimodal.resize_ppm_stats(
        media.where(F.col("kind") == "image"), factor=2
    )


_RESIZE_PPM_ORACLE = """
WITH img AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 2 = 0
),
dims AS (
  SELECT doc_id, w, h, (w + 1) // 2 AS nw, (h + 1) // 2 AS nh FROM img
),
grid AS (
  SELECT doc_id, w, h, nw, nh,
         3 * ((yy.i * 2) * w + (xx.i * 2)) AS j0
  FROM dims, unnest(range(0, nh)) AS yy(i), unnest(range(0, nw)) AS xx(i)
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS orig_w, CAST(h AS INT) AS orig_h,
       CAST(nw AS INT) AS new_w, CAST(nh AS INT) AS new_h,
       CAST(sum((doc_id * 7 + j0 * 11) % 256) AS BIGINT) AS sum_r,
       CAST(sum((doc_id * 7 + (j0 + 1) * 11) % 256) AS BIGINT) AS sum_g,
       CAST(sum((doc_id * 7 + (j0 + 2) * 11) % 256) AS BIGINT) AS sum_b
FROM grid GROUP BY doc_id, w, h, nw, nh
"""




__all__ = [
    "_AUDIO_FRAMES_ORACLE",
    "_HIERARCHY_ORACLE",
    "_MEDIA_DECODE_ORACLE",
    "_RESIZE_PPM_ORACLE",
    "_corpus_report_oracle",
    "_media_features_oracle",
    "_minhash_accuracy_oracle",
    "q_audio_frames",
    "q_corpus_report",
    "q_hierarchy",
    "q_media_decode",
    "q_bmp_decode",
    "_BMP_DECODE_ORACLE",
    "q_png_decode",
    "_PNG_DECODE_ORACLE",
    "q_qoi_decode",
    "_QOI_DECODE_ORACLE",
    "q_gif_decode",
    "_GIF_DECODE_ORACLE",
    "q_ulaw_decode",
    "_ULAW_DECODE_ORACLE",
    "q_alaw_decode",
    "_ALAW_DECODE_ORACLE",
    "q_aiff_decode",
    "_AIFF_DECODE_ORACLE",
    "q_media_features",
    "q_minhash_accuracy",
    "q_resize_ppm",
]
