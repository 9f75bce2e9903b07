"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic fake (`_fake_decode`) behind the same
interface a real decoder would use; everything Spark-side — schema,
batch iteration, partitioning, output typing — is real and tested.
Swap ``_fake_decode`` for PIL/librosa in a real deployment.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, checksum string, "
    "width int, height int, n_frames int, feature_mean double"
)

# Arrow batch byte budget for payload-bearing stages (r11, VERDICT
# item 7): Spark sizes Python-worker Arrow batches by ROW COUNT only
# (spark.sql.execution.arrow.maxRecordsPerBatch, default 10000), so a
# 10 MB-payload corpus would ship ~100 GB batches into each Python
# worker — the one knob that bounds it is the record count. Every
# mm_* plan builder calls ``pin_arrow_batch_for_payload`` with its
# (measured or closed-form) max payload size; the pin only ever
# LOWERS the record cap, so corpora whose payloads already fit the
# budget (every gate/bench corpus: <= a few KB) keep the default and
# the session is untouched. The pin is session-sticky by necessity —
# the conf is read at EXECUTION time, after the builder returns — and
# lowering it is the safe direction for everything else running.
MM_ARROW_BATCH_BYTES = 64 << 20
_ARROW_REC_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


def pin_arrow_batch_for_payload(spark: SparkSession, max_payload_bytes: int) -> int:
    """Bound Arrow batches to ~MM_ARROW_BATCH_BYTES of payload. Only
    lowers the session's maxRecordsPerBatch; returns the effective
    record cap."""
    rows = max(1, MM_ARROW_BATCH_BYTES // max(1, int(max_payload_bytes)))
    try:
        cur = int(spark.conf.get(_ARROW_REC_KEY))
    except Exception:  # unset -> Spark default
        cur = 10000
    if rows < cur:
        spark.conf.set(_ARROW_REC_KEY, str(rows))
        return int(rows)
    return cur


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image/audio decoder.

    A real implementation would go here (PIL.Image.open /
    soundfile.read); the container ships no codecs, so derive stable
    pseudo-metadata from the payload bytes instead.
    """
    digest = hashlib.sha256(payload).hexdigest()
    h = int(digest[:8], 16)
    # integer-floor "rounding" keeps the value engine-portable
    # (Python round() is banker's, SQL round() is half-away — ties at
    # the 4th decimal are common with a /256 divisor)
    div = max(min(len(payload), 256), 1)
    return {
        "n_bytes": len(payload),
        "checksum": digest[:16],
        "width": 64 + (h % 1920),
        "height": 64 + ((h >> 8) % 1080),
        "n_frames": 1 + ((h >> 16) % 240),
        "feature_mean": (sum(payload[:256]) * 10000 // div) / 10000.0,
    }


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    type_col: str = "media_type",
    max_payload_bytes: int | None = None,
) -> DataFrame:
    """mapInPandas decode over (doc_id, media_type, payload binary).

    Arrow-batched: each batch decodes vectorized-per-row in Python
    (decoders are per-item by nature) but transfers columnar. Pass
    ``max_payload_bytes`` (the corpus's payload bound) so the Arrow
    record cap is sized to MM_ARROW_BATCH_BYTES — mandatory hygiene
    on fat-payload corpora (see ``pin_arrow_batch_for_payload``).
    """
    if max_payload_bytes is not None:
        pin_arrow_batch_for_payload(df.sparkSession, max_payload_bytes)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "media_type", pdf[type_col].to_numpy())
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return df.mapInPandas(fn, schema=DECODE_SCHEMA)


def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a synthetic media table from document text payloads
    (binary column + type tag), run the decode pipeline. The decode
    stub is hash-derived, so ``MM_DECODE_SQL`` recomputes it exactly
    in DuckDB — even the binary path is hash-gated."""
    return decode_media(_media_table(spark, sf_dir)).orderBy("doc_id")


# The decode stub is hash-derived, so even the "binary" path is
# oracle-checkable: DuckDB recomputes sha256 + the byte-sum feature
# over the UTF-8 BYTES (octet_length + hex-pair extraction), so the
# oracle is byte-exact on any text — ASCII or not — and the empty
# payload sums to 0 (coalesce), matching the Python stub exactly.
MM_DECODE_SQL = """
WITH dec AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS dg,
         coalesce(list_sum(list_transform(
             generate_series(1, least(octet_length(encode(text)), 256)),
             i -> ('0x' || substr(hex(encode(text)), 2 * i - 1, 2))::INT)), 0) AS bsum,
         greatest(least(octet_length(encode(text)), 256), 1) AS bdiv
  FROM documents
)
SELECT doc_id, media_type, n_bytes,
       substr(dg, 1, 16) AS checksum,
       CAST(64 + (('0x' || substr(dg, 1, 8))::BIGINT % 1920) AS INT) AS width,
       CAST(64 + ((('0x' || substr(dg, 1, 8))::BIGINT >> 8) % 1080) AS INT) AS height,
       CAST(1 + ((('0x' || substr(dg, 1, 8))::BIGINT >> 16) % 240) AS INT) AS n_frames,
       CAST(bsum * 10000 // bdiv AS DOUBLE) / 10000 AS feature_mean
FROM dec ORDER BY doc_id
"""


RESIZE_SCHEMA = "doc_id long, width int, height int, resized_width int, resized_height int, thumb binary"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_checksum string"
FEATURES_SCHEMA = "doc_id long, media_type string, feature array<float>"


def resize_media(df: DataFrame, target: int = 64) -> DataFrame:
    """Resize stub over decoded metadata: computes the target box
    (aspect-preserving) and emits a deterministic fake thumbnail
    payload. A real implementation would call PIL's ``Image.resize``
    in the same batch loop."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            rows = []
            for doc_id, m, payload in zip(pdf["doc_id"], metas, pdf["payload"]):
                scale = target / max(m["width"], m["height"])
                rw, rh = max(1, int(m["width"] * scale)), max(1, int(m["height"] * scale))
                thumb = hashlib.sha256(bytes(payload) + f"{rw}x{rh}".encode()).digest()[:32]
                rows.append((doc_id, m["width"], m["height"], rw, rh, thumb))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "resized_width", "resized_height", "thumb"]
            )

    return df.mapInPandas(fn, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling stub for video payloads: emits one row per
    sampled frame index (explode-shaped output — one input row fans
    out to n_frames/every_n rows, the real shape of video pipelines)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_sum = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta = _fake_decode(bytes(payload))
                for idx in range(0, meta["n_frames"], every_n):
                    out_doc.append(doc_id)
                    out_idx.append(idx)
                    out_sum.append(
                        hashlib.sha256(bytes(payload) + idx.to_bytes(4, "big")).hexdigest()[:16]
                    )
            yield pd.DataFrame({"doc_id": out_doc, "frame_idx": out_idx, "frame_checksum": out_sum})

    return df.mapInPandas(fn, schema=FRAMES_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction stub: deterministic pseudo-embedding from
    payload bytes (a real pipeline would run a vision/audio encoder
    here — same batch loop, same output schema).

    Component i is ``digest_byte[i % 32] / 256`` — exactly
    representable in float32 AND recomputable in plain SQL from
    ``sha256(payload)``, so the whole pipeline can be hash-gated
    (the previous ``rng.normal`` draw was deterministic in Python
    but not oracle-expressible)."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                h = hashlib.sha256(bytes(payload)).digest()
                raw = (h * (dim // 32 + 1))[:dim]
                feats.append((np.frombuffer(raw, dtype=np.uint8) / 256.0).astype("float32"))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": pdf["media_type"], "feature": feats}
            )

    return df.mapInPandas(fn, schema=FEATURES_SCHEMA)


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # payload below = utf-8(text): bound its batch footprint from the
    # corpus's own metadata (one cheap 1-row agg over a long column;
    # x4 covers the widest UTF-8 expansion)
    max_chars = docs.agg(F.max("n_chars")).first()[0] or 0
    pin_arrow_batch_for_payload(spark, 4 * int(max_chars))
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


def mm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline: decode → resize (images) →
    frame-sample (videos) → feature-extract (all) → per-type summary.

    Every stage is hash-derived (no RNG), so ``MM_PIPELINE_SQL``
    recomputes the whole thing from ``sha256`` in DuckDB. The
    summary metric is the mean SQUARED feature norm: each squared
    component is an exact binary fraction (b²/65536), so the
    double-sum is exact and partition-order-independent — hash-safe
    where avg-of-sqrt would not be."""
    media = _media_table(spark, sf_dir)
    feats = extract_features(media)
    frames = sample_frames(media.filter(F.col("media_type") == "video"))
    resized = resize_media(media.filter(F.col("media_type") == "image"))
    sq_norm = F.aggregate(
        F.transform("feature", lambda x: x.cast("double")), F.lit(0.0), lambda a, x: a + x * x
    )
    per_type = feats.select("media_type", sq_norm.alias("sq")).groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        # floor (not round) at 4 dp: floor is bit-identical across
        # engines; round's tie handling is not.
        (F.floor(F.sum("sq") * 10000.0 / F.count("*")) / 10000.0).alias("avg_sq_norm"),
    )
    # Scalar side-counts stay in the plan (cross join of 1-row aggs)
    # instead of eager collect() jobs — the whole pipeline is one job.
    counts = frames.agg(F.count("*").alias("n_sampled_frames")).crossJoin(
        resized.agg(F.count("*").alias("n_resized"))
    )
    return per_type.crossJoin(counts).orderBy("media_type")


# Recomputes the pipeline in closed form from sha256(text): features
# are digest bytes / 256 (dim=16 → first 16 digest bytes), frame
# counts derive from the same digest field mm_decode exposes, resize
# count is just the image-type count. Integer squares sum exactly.
MM_PIPELINE_SQL = """
WITH dec AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         sha256(text) AS dg
  FROM documents
), feat AS (
  SELECT doc_id, media_type,
         list_sum(list_transform(generate_series(1, 16),
                  i -> ('0x' || substr(dg, 2*i-1, 2))::BIGINT
                       * ('0x' || substr(dg, 2*i-1, 2))::BIGINT)) / 65536.0 AS sq
  FROM dec
), per_type AS (
  SELECT media_type, count(*) AS n_items,
         floor(sum(sq) * 10000.0 / count(*)) / 10000.0 AS avg_sq_norm
  FROM feat GROUP BY media_type
), vids AS (
  SELECT CAST(coalesce(sum(1 + (((('0x' || substr(dg, 1, 8))::BIGINT >> 16) % 240) // 30)), 0) AS BIGINT)
           AS n_sampled_frames
  FROM dec WHERE media_type = 'video'
), imgs AS (
  SELECT count(*) AS n_resized FROM dec WHERE media_type = 'image'
)
SELECT media_type, n_items, avg_sq_norm, n_sampled_frames, n_resized
FROM per_type, vids, imgs ORDER BY media_type
"""


PGM_SCHEMA = "doc_id long, width int, height int, n_pixels int, mean_px double, min_px int, max_px int"


def _pgm_payload(doc_id: int) -> bytes:
    """A REAL binary PGM (P5) image: ASCII header + raw 8-bit pixel
    buffer. Dimensions and pixels derive deterministically from
    doc_id so the oracle can verify the decode in closed form."""
    import numpy as np

    w = 8 + doc_id % 9
    h = 8 + (doc_id * 3) % 7
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    px = ((doc_id + 31 * r + 7 * c) % 256).astype(np.uint8)
    return f"P5\n{w} {h}\n255\n".encode() + px.tobytes()


def _pgm_decode(payload: bytes) -> tuple[int, int, "object"]:
    """A REAL P5 decoder: parse the three header tokens, then read
    the raw pixel buffer with ``np.frombuffer``. This is the same
    parse any netpbm reader performs — no codec library needed,
    which is exactly why PGM proves the binary plumbing end-to-end
    where JPEG/PNG (PIL swap point) cannot run in this container."""
    import numpy as np

    magic, dims, maxval_and_rest = payload.split(b"\n", 2)
    if magic != b"P5":
        raise ValueError(f"not a P5 PGM payload: {magic!r}")
    w, h = (int(t) for t in dims.split())
    _maxval, raw = maxval_and_rest.split(b"\n", 1)
    px = np.frombuffer(raw[: w * h], dtype=np.uint8).reshape(h, w)
    return w, h, px


def mm_pgm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-format media pipeline: encode a genuine PGM image per
    document (stage 1), decode it back by actually parsing the bytes
    (stage 2), emit pixel statistics. The oracle recomputes the
    statistics from the pixel formula directly — a hash match proves
    encoder, binary transport, and decoder agree with ground truth.

    Two Arrow-batched Python stages over an opaque binary column —
    the exact shape of a production decode pipeline, with the
    PGM codec swapped for PIL/ffmpeg on a real cluster."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # closed-form payload bound: P5 header + w*h <= 16*14 px
    pin_arrow_batch_for_payload(spark, 256)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_pgm_payload(int(d)) for d in pdf["doc_id"]],
                }
            )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _pgm_decode(bytes(payload))
                s = int(px.sum())
                n = w * h
                # integer-floor mean: exact and engine-portable
                rows.append((doc_id, w, h, n, (s * 10000 // n) / 10000.0, int(px.min()), int(px.max())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_pixels", "mean_px", "min_px", "max_px"],
            )

    encoded = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    return encoded.mapInPandas(decode, schema=PGM_SCHEMA).orderBy("doc_id")


MM_PGM_ROUNDTRIP_SQL = """
WITH px AS (
  -- fixed-bound series + filter (DuckDB generate_series takes no
  -- lateral refs); w ∈ [8,16], h ∈ [8,14] by construction
  SELECT d.doc_id,
         8 + d.doc_id % 9 AS width,
         8 + (d.doc_id * 3) % 7 AS height,
         (d.doc_id + 31 * r.r + 7 * c.c) % 256 AS v
  FROM documents d,
       generate_series(0, 13) AS r(r),
       generate_series(0, 15) AS c(c)
  WHERE r.r < 8 + (d.doc_id * 3) % 7 AND c.c < 8 + d.doc_id % 9
)
SELECT doc_id,
       CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       CAST(width * height AS INT) AS n_pixels,
       CAST(sum(v) * 10000 // (width * height) AS DOUBLE) / 10000 AS mean_px,
       CAST(min(v) AS INT) AS min_px,
       CAST(max(v) AS INT) AS max_px
FROM px GROUP BY doc_id, width, height ORDER BY doc_id
"""

PGM_RESIZE_SCHEMA = (
    "doc_id long, src_width int, src_height int, out_width int, "
    "out_height int, mean_px double, min_px int, max_px int"
)


def mm_pgm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image TRANSFORM through the binary path: encode a genuine
    PGM per document, decode it, stride-2 nearest-neighbor downsample
    the pixel array, re-encode the thumbnail as a NEW PGM payload,
    then decode that and emit its statistics. Three Arrow-batched
    stages over opaque binary columns — the plumbing shape of a
    production thumbnailing pipeline (swap the stride-2 kernel for a
    PIL resize on a real cluster; everything else stays).

    The source pixels are closed-form (``px(r,c) = (doc_id + 31r +
    7c) % 256``), so the subsample is too (``out(i,j) = (doc_id +
    62i + 14j) % 256`` with ceil-half dims) and the oracle verifies
    the whole encode→decode→transform→encode→decode chain —
    a hash match means the transform really ran on the real bytes."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # closed-form payload bound (source PGM, see mm_pgm_roundtrip)
    pin_arrow_batch_for_payload(spark, 256)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_pgm_payload(int(d)) for d in pdf["doc_id"]],
                }
            )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _pgm_decode(bytes(payload))
                small = px[::2, ::2]  # nearest-neighbor stride-2
                h2, w2 = small.shape
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        f"P5\n{w2} {h2}\n255\n".encode() + small.tobytes(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "src_width", "src_height", "payload"]
            )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, sw, sh, payload in zip(
                pdf["doc_id"], pdf["src_width"], pdf["src_height"], pdf["payload"]
            ):
                w2, h2, px = _pgm_decode(bytes(payload))
                s, n = int(px.sum()), w2 * h2
                rows.append(
                    (
                        doc_id,
                        int(sw),
                        int(sh),
                        w2,
                        h2,
                        (s * 10000 // n) / 10000.0,
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "src_width",
                    "src_height",
                    "out_width",
                    "out_height",
                    "mean_px",
                    "min_px",
                    "max_px",
                ],
            )

    encoded = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    resized = encoded.mapInPandas(
        resize, schema="doc_id long, src_width int, src_height int, payload binary"
    )
    return resized.mapInPandas(stats, schema=PGM_RESIZE_SCHEMA).orderBy("doc_id")


MM_PGM_RESIZE_SQL = """
WITH px AS (
  -- stride-2 subsample of px(r,c) = (doc_id + 31r + 7c) % 256:
  -- out(i,j) = (doc_id + 62i + 14j) % 256, dims = ceil(src/2);
  -- w2 ∈ [4,8], h2 ∈ [4,7] by construction
  SELECT d.doc_id,
         8 + d.doc_id % 9 AS width,
         8 + (d.doc_id * 3) % 7 AS height,
         (d.doc_id + 62 * i.i + 14 * j.j) % 256 AS v
  FROM documents d,
       generate_series(0, 6) AS i(i),
       generate_series(0, 7) AS j(j)
  WHERE i.i < (8 + (d.doc_id * 3) % 7 + 1) // 2
    AND j.j < (8 + d.doc_id % 9 + 1) // 2
)
SELECT doc_id,
       CAST(width AS INT) AS src_width,
       CAST(height AS INT) AS src_height,
       CAST((width + 1) // 2 AS INT) AS out_width,
       CAST((height + 1) // 2 AS INT) AS out_height,
       CAST(sum(v) * 10000 // (((width + 1) // 2) * ((height + 1) // 2))
            AS DOUBLE) / 10000 AS mean_px,
       CAST(min(v) AS INT) AS min_px,
       CAST(max(v) AS INT) AS max_px
FROM px GROUP BY doc_id, width, height ORDER BY doc_id
"""


WAV_SR = 8000  # sample rate baked into the generated files
WAV_SCHEMA = "doc_id long, n_samples int, sample_rate int, duration_ms int, mean_sq double, peak int"


def _wav_payload(doc_id: int) -> bytes:
    """A REAL RIFF/WAVE file: canonical 44-byte header + 16-bit
    little-endian mono PCM. Sample values derive from doc_id in
    closed form so the oracle can recompute every statistic."""
    import struct

    import numpy as np

    n = 64 + doc_id % 129
    i = np.arange(n, dtype=np.int64)
    pcm = (((doc_id * 7919 + i * 104729) % 65536) - 32768).astype("<i2")
    data = pcm.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, WAV_SR, WAV_SR * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def _wav_decode(payload: bytes) -> tuple[int, "object"]:
    """A REAL WAV reader: validate RIFF/WAVE magic, walk the chunk
    list (the part naive 44-byte-offset readers get wrong), unpack
    fmt, then ``np.frombuffer`` the PCM. Same parse as the stdlib
    ``wave`` module, no codec library needed."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, pcm = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, sr, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if (fmt_tag, channels, bits) != (1, 1, 16):
                raise ValueError("unsupported WAV format")
        elif cid == b"data":
            pcm = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if sr is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return sr, pcm


def mm_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-format AUDIO pipeline: write a genuine RIFF/WAV file per
    document, ship it as an opaque binary column, parse it back by
    walking the chunk structure, emit PCM statistics. The oracle
    recomputes the statistics from the sample formula — a hash match
    proves encoder, binary transport, and chunk-walking decoder
    agree end to end. Companion to ``mm_pgm_roundtrip`` (image);
    swap the PCM parse for soundfile/ffmpeg on a real cluster.

    Stats stay in exact integer space (floor-scaled mean of squares)
    so no float summation order can diverge between engines."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # closed-form payload bound: 44-byte RIFF header + <=192 i16 samples
    pin_arrow_batch_for_payload(spark, 512)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_wav_payload(int(d)) for d in pdf["doc_id"]],
                }
            )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                sr, pcm = _wav_decode(bytes(payload))
                n = len(pcm)
                ssq = int((pcm.astype(np.int64) ** 2).sum())
                rows.append(
                    (
                        doc_id,
                        n,
                        sr,
                        n * 1000 // sr,
                        (ssq * 10000 // n) / 10000.0,
                        int(np.abs(pcm.astype(np.int64)).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sample_rate", "duration_ms", "mean_sq", "peak"],
            )

    encoded = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    return encoded.mapInPandas(decode, schema=WAV_SCHEMA).orderBy("doc_id")


MM_WAV_ROUNDTRIP_SQL = f"""
WITH pcm AS (
  SELECT d.doc_id,
         64 + d.doc_id % 129 AS n_samples,
         ((d.doc_id * 7919 + i.i * 104729) % 65536) - 32768 AS v
  FROM documents d, generate_series(0, 192) AS i(i)
  WHERE i.i < 64 + d.doc_id % 129
)
SELECT doc_id,
       CAST(n_samples AS INT) AS n_samples,
       CAST({WAV_SR} AS INT) AS sample_rate,
       CAST(n_samples * 1000 // {WAV_SR} AS INT) AS duration_ms,
       CAST(sum(v * v) * 10000 // n_samples AS DOUBLE) / 10000 AS mean_sq,
       CAST(max(abs(v)) AS INT) AS peak
FROM pcm GROUP BY doc_id, n_samples ORDER BY doc_id
"""


FP_FRAME = 16  # samples per fingerprint frame (coarser than analysis)


def mm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual AUDIO fingerprinting over the real RIFF/WAV path —
    the audio analogue of ``mm_image_ahash`` and the miniature of the
    Shazam/Chromaprint family: split the PCM into 16-sample frames,
    take each frame's exact integer energy (Σv²), emit one bit per
    adjacent frame pair (1 iff energy rose), pack the bits into a
    hex fingerprint, and count corpus-wide collisions per
    (n_frames, fingerprint). Energy-DELTA signs are loudness- and
    offset-tolerant where raw byte hashing is not — the property
    that makes this the audio dedup key.

    Bits are pure integer comparisons, so the fingerprint is
    engine-portable; the closed-form PCM contract lets the oracle
    recompute every frame energy, bit, and packed value in SQL.
    Same scale shape as mm_image_ahash: Arrow-batched decode+hash
    stages, one dedup_exact-style shuffle on the fingerprint."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pin_arrow_batch_for_payload(spark, 512)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_wav_payload(int(d)) for d in pdf["doc_id"]],
                }
            )

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _sr, pcm = _wav_decode(bytes(payload))
                n_fr = len(pcm) // FP_FRAME  # truncate the ragged tail
                e = (
                    pcm[: n_fr * FP_FRAME]
                    .astype(np.int64)
                    .reshape(n_fr, FP_FRAME)
                    ** 2
                ).sum(axis=1)
                val = 0
                for f in range(n_fr - 1):  # MSB = earliest frame pair
                    val = (val << 1) | int(e[f + 1] > e[f])
                rows.append((doc_id, n_fr, f"{val:03x}"))
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "fingerprint"])

    encoded = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    fps = encoded.mapInPandas(
        fingerprint, schema="doc_id long, n_frames int, fingerprint string"
    )
    dups = fps.groupBy("n_frames", "fingerprint").agg(F.count("*").alias("n_dups"))
    return (
        fps.join(dups, ["n_frames", "fingerprint"])
        .select("doc_id", "n_frames", "fingerprint", "n_dups")
        .orderBy("doc_id")
    )


MM_AUDIO_FINGERPRINT_SQL = f"""
WITH pcm AS (
  SELECT d.doc_id,
         (64 + d.doc_id % 129) // {FP_FRAME} AS n_fr,
         i.i // {FP_FRAME} AS f,
         ((d.doc_id * 7919 + i.i * 104729) % 65536) - 32768 AS v
  FROM documents d, generate_series(0, 192) AS i(i)
  WHERE i.i < ((64 + d.doc_id % 129) // {FP_FRAME}) * {FP_FRAME}
), fe AS (
  SELECT doc_id, n_fr, f, sum(v * v) AS e FROM pcm GROUP BY 1, 2, 3
), bits AS (
  SELECT doc_id, n_fr, f,
         CASE WHEN lead(e) OVER (PARTITION BY doc_id ORDER BY f) > e
              THEN 1 ELSE 0 END AS b
  FROM fe
), fp AS (
  SELECT doc_id, n_fr,
         printf('%03x', CAST(sum(b * (1 << (n_fr - 2 - f))) AS INT)) AS fingerprint
  FROM bits WHERE f < n_fr - 1 GROUP BY 1, 2
), dups AS (
  SELECT n_fr, fingerprint, count(*) AS n_dups FROM fp GROUP BY 1, 2
)
SELECT p.doc_id, CAST(p.n_fr AS INT) AS n_frames, p.fingerprint,
       CAST(d.n_dups AS BIGINT) AS n_dups
FROM fp p JOIN dups d ON p.n_fr = d.n_fr AND p.fingerprint = d.fingerprint
ORDER BY p.doc_id
"""


AUDIO_FRAME = 64  # samples per analysis frame
AUDIO_FEAT_SCHEMA = (
    "doc_id long, frame_idx int, frame_n int, energy_mean double, "
    "zero_crossings int"
)


def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level audio FEATURE EXTRACTION over the real RIFF/WAV
    payloads (the step after ``mm_wav_roundtrip``'s decode): split
    the PCM into 64-sample analysis frames and emit per-frame energy
    (exact integer mean of squares) and the zero-crossing count —
    the two classic cheap speech/music features. Explode-shaped
    output (one clip → n/64 frames), exactly the fan-out a real
    feature pipeline (MFCC, fbank) produces.

    Hash-gated: the oracle recomputes both features from the sample
    formula with a lag window — a match proves the encoder, the
    chunk-walking decoder, the frame split, and the crossing logic
    (frame-local, first sample of each frame excluded) all agree.
    Swap the frame loop for librosa/torchaudio on a real cluster."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # closed-form payload bound (same WAV builder as mm_wav_roundtrip)
    pin_arrow_batch_for_payload(spark, 512)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_wav_payload(int(d)) for d in pdf["doc_id"]],
                }
            )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _sr, pcm = _wav_decode(bytes(payload))
                v = pcm.astype(np.int64)
                nonneg = v >= 0
                # crossing at i (i>0): sign flip vs previous sample,
                # counted within the frame (first sample excluded)
                flips = np.zeros(len(v), dtype=bool)
                flips[1:] = nonneg[1:] != nonneg[:-1]
                for f in range(0, len(v), AUDIO_FRAME):
                    seg = v[f : f + AUDIO_FRAME]
                    segf = flips[f + 1 : f + AUDIO_FRAME]
                    ssq, n = int((seg * seg).sum()), len(seg)
                    rows.append(
                        (
                            doc_id,
                            f // AUDIO_FRAME,
                            n,
                            (ssq * 10000 // n) / 10000.0,
                            int(segf.sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_n", "energy_mean", "zero_crossings"],
            )

    encoded = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    return encoded.mapInPandas(feats, schema=AUDIO_FEAT_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )


MM_AUDIO_FEATURES_SQL = f"""
WITH pcm AS (
  SELECT d.doc_id, i.i AS i,
         ((d.doc_id * 7919 + i.i * 104729) % 65536) - 32768 AS v
  FROM documents d, generate_series(0, 192) AS i(i)
  WHERE i.i < 64 + d.doc_id % 129
), lagd AS (
  SELECT doc_id, i, v, i // {AUDIO_FRAME} AS frame_idx,
         lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM pcm
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(count(*) AS INT) AS frame_n,
       CAST(sum(v * v) * 10000 // count(*) AS DOUBLE) / 10000 AS energy_mean,
       CAST(sum(CASE WHEN i % {AUDIO_FRAME} <> 0
                      AND ((v >= 0) <> (pv >= 0)) THEN 1 ELSE 0 END) AS INT)
         AS zero_crossings
FROM lagd GROUP BY doc_id, frame_idx ORDER BY doc_id, frame_idx
"""


VID_EVERY_N = 2  # sample every 2nd frame
VID_SCHEMA = (
    "doc_id long, frame_idx int, n_frames int, width int, height int, "
    "mean_px double, min_px int, max_px int"
)


def _video_payload(doc_id: int) -> bytes:
    """A REAL multi-frame binary container: ASCII header
    ``BVID\\n<n_frames> <w> <h>\\n`` + n_frames raw 8-bit frames
    (the netpbm-style stand-in for an MP4 — same parse shape, no
    codec library needed). Frame f's pixel (r, c) is
    ``(doc_id + 17·f + 31·r + 7·c) % 256`` so the oracle replays the
    sampled-frame statistics in closed form."""
    import numpy as np

    nf = 4 + doc_id % 5
    w = 8 + doc_id % 5
    h = 6 + doc_id % 4
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    frames = [
        ((doc_id + 17 * f + 31 * r + 7 * c) % 256).astype(np.uint8).tobytes()
        for f in range(nf)
    ]
    return f"BVID\n{nf} {w} {h}\n".encode() + b"".join(frames)


def _video_decode_frames(payload: bytes, every_n: int):
    """Parse the container and yield (frame_idx, n_frames, w, h,
    pixel-array) for every ``every_n``-th frame — the real
    frame-seek: header parse, then offset arithmetic into the raw
    buffer (an MP4 demuxer does the same with chunk tables)."""
    import numpy as np

    magic, dims, raw = payload.split(b"\n", 2)
    if magic != b"BVID":
        raise ValueError(f"not a BVID payload: {magic!r}")
    nf, w, h = (int(t) for t in dims.split())
    fsz = w * h
    for f in range(0, nf, every_n):
        px = np.frombuffer(raw[f * fsz : (f + 1) * fsz], dtype=np.uint8)
        yield f, nf, w, h, px


def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling through the binary path: encode a real
    multi-frame container per document, then SEEK to every
    ``VID_EVERY_N``-th frame by offset arithmetic (no full-payload
    decode — the property that makes frame sampling cheap on real
    video) and emit per-frame pixel statistics. Explode-shaped
    output (one input row → n_frames/every_n rows), the true shape
    of video pipelines. Hash-gated: the oracle recomputes each
    sampled frame's stats from the generation formula — a match
    proves encoder, transport, header parse, and frame seek agree.

    Scale: two Arrow-batched ``mapInPandas`` stages over an opaque
    binary column; swap the BVID parser for an ffmpeg/pyav demuxer
    on a real cluster (same signature, same batch shape)."""
    import numpy as np  # noqa: F401 — used inside the closures

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # closed-form payload bound: BVID header + 8 frames * 12*9 px
    pin_arrow_batch_for_payload(spark, 1024)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_video_payload(int(d)) for d in pdf["doc_id"]],
                }
            )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for f, nf, w, h, px in _video_decode_frames(bytes(payload), VID_EVERY_N):
                    s, n = int(px.sum()), w * h
                    rows.append(
                        (doc_id, f, nf, w, h, (s * 10000 // n) / 10000.0,
                         int(px.min()), int(px.max()))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "n_frames", "width", "height",
                         "mean_px", "min_px", "max_px"],
            )

    encoded = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    return encoded.mapInPandas(decode, schema=VID_SCHEMA).orderBy("doc_id", "frame_idx")


MM_VIDEO_FRAMES_SQL = f"""
WITH px AS (
  -- fixed-bound series + filters; nf ∈ [4,8], w ∈ [8,12], h ∈ [6,9]
  SELECT d.doc_id, f.f AS frame_idx,
         4 + d.doc_id % 5 AS n_frames,
         8 + d.doc_id % 5 AS width,
         6 + d.doc_id % 4 AS height,
         (d.doc_id + 17 * f.f + 31 * r.r + 7 * c.c) % 256 AS v
  FROM documents d,
       generate_series(0, 7) AS f(f),
       generate_series(0, 8) AS r(r),
       generate_series(0, 11) AS c(c)
  WHERE f.f < 4 + d.doc_id % 5 AND f.f % {VID_EVERY_N} = 0
    AND r.r < 6 + d.doc_id % 4 AND c.c < 8 + d.doc_id % 5
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(n_frames AS INT) AS n_frames,
       CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       CAST(sum(v) * 10000 // (width * height) AS DOUBLE) / 10000 AS mean_px,
       CAST(min(v) AS INT) AS min_px,
       CAST(max(v) AS INT) AS max_px
FROM px GROUP BY doc_id, frame_idx, n_frames, width, height
ORDER BY doc_id, frame_idx
"""


def mm_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate detection over the binary image
    path: encode a genuine PGM per document, decode the bytes, and
    compute the classic AVERAGE HASH (aHash) — nearest-neighbor
    downsample to 8×8, threshold each sample against the patch mean,
    pack the 64 bits into a 16-hex-char fingerprint — then count how
    many corpus images share each fingerprint (``n_dups``). aHash is
    shift/scale-tolerant where exact byte hashing is not: visually
    identical images with different encodings collide here, which is
    the image-side analogue of text canonical fingerprinting.

    The threshold is the EXACT integer comparison ``64·p ≥ Σp`` (no
    mean division), so the bit pattern is engine-portable. Pixels
    are closed-form (the mm_pgm contract), so the oracle recomputes
    every sample, bit, and byte in SQL — a hash-gate match proves
    the real decoder + numpy downsample produced ground truth.

    Scale: two Arrow-batched Python stages (encode/decode+hash, the
    production decode shape) and ONE shuffle on the 8-byte
    fingerprint for the dup counts — the same groupBy-hash plan as
    ``dedup_exact``, so 100 TB behavior follows that key's."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pin_arrow_batch_for_payload(spark, 256)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_pgm_payload(int(d)) for d in pdf["doc_id"]],
                }
            )

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(8)
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _pgm_decode(bytes(payload))
                samp = px[(idx * h) // 8][:, (idx * w) // 8].astype(np.int64)
                s = int(samp.sum())
                bits = (64 * samp >= s).astype(np.uint8)
                byts = (bits << (7 - idx)[None, :]).sum(axis=1)
                rows.append((doc_id, w, h, "".join(f"{int(b):02x}" for b in byts)))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "ahash"])

    encoded = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    hashed = encoded.mapInPandas(
        ahash, schema="doc_id long, width int, height int, ahash string"
    )
    dups = hashed.groupBy("ahash").agg(F.count("*").alias("n_dups"))
    return (
        hashed.join(dups, "ahash")
        .select("doc_id", "width", "height", "ahash", "n_dups")
        .orderBy("doc_id")
    )


MM_IMAGE_AHASH_SQL = """
WITH g AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id * 3) % 7 AS h FROM documents
), samp AS (
  SELECT g.doc_id, g.w, g.h, i.i, j.j,
         (g.doc_id + 31 * ((i.i * g.h) // 8) + 7 * ((j.j * g.w) // 8)) % 256 AS p
  FROM g, generate_series(0, 7) AS i(i), generate_series(0, 7) AS j(j)
), tot AS (
  SELECT doc_id, sum(p) AS s FROM samp GROUP BY doc_id
), bytes AS (
  SELECT samp.doc_id, samp.i,
         sum(CASE WHEN 64 * samp.p >= t.s THEN 1 ELSE 0 END * (1 << (7 - samp.j))) AS b
  FROM samp JOIN tot t USING (doc_id) GROUP BY samp.doc_id, samp.i
), hashes AS (
  SELECT doc_id, string_agg(printf('%02x', CAST(b AS INT)), '' ORDER BY i) AS ahash
  FROM bytes GROUP BY doc_id
), dups AS (
  SELECT ahash, count(*) AS n_dups FROM hashes GROUP BY ahash
)
SELECT h.doc_id, CAST(g.w AS INT) AS width, CAST(g.h AS INT) AS height,
       h.ahash, CAST(d.n_dups AS BIGINT) AS n_dups
FROM hashes h JOIN g USING (doc_id) JOIN dups d USING (ahash)
ORDER BY h.doc_id
"""


def mm_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE hash (dHash) over the same binary PGM path as
    ``mm_image_ahash`` — the other standard perceptual fingerprint
    (per-row gradient: sample a 9×8 grid, bit = left pixel >
    right neighbor). dHash survives global brightness shifts that
    flip aHash bits (the mean moves, gradients don't); production
    image dedup runs both and unions the collision candidates.

    Bits are exact integer comparisons of closed-form pixels, so the
    oracle recomputes the full 9×8 sample grid, every gradient bit,
    and the dup counts in SQL. Same plan shape as aHash: two
    Arrow-batched stages + ONE shuffle on the 8-byte fingerprint."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pin_arrow_batch_for_payload(spark, 256)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_pgm_payload(int(d)) for d in pdf["doc_id"]],
                }
            )

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r8 = np.arange(8)
        c9 = np.arange(9)
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _pgm_decode(bytes(payload))
                samp = px[(r8 * h) // 8][:, (c9 * w) // 9].astype(np.int64)
                bits = (samp[:, :8] > samp[:, 1:]).astype(np.uint8)
                byts = (bits << (7 - r8)[None, :]).sum(axis=1)
                rows.append((doc_id, w, h, "".join(f"{int(b):02x}" for b in byts)))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "dhash"])

    encoded = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    hashed = encoded.mapInPandas(
        dhash, schema="doc_id long, width int, height int, dhash string"
    )
    dups = hashed.groupBy("dhash").agg(F.count("*").alias("n_dups"))
    return (
        hashed.join(dups, "dhash")
        .select("doc_id", "width", "height", "dhash", "n_dups")
        .orderBy("doc_id")
    )


MM_IMAGE_DHASH_SQL = """
WITH g AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id * 3) % 7 AS h FROM documents
), bits AS (
  SELECT g.doc_id, g.w, g.h, i.i, j.j,
         CASE WHEN (g.doc_id + 31 * ((i.i * g.h) // 8) + 7 * ((j.j * g.w) // 9)) % 256
                 > (g.doc_id + 31 * ((i.i * g.h) // 8) + 7 * (((j.j + 1) * g.w) // 9)) % 256
              THEN 1 ELSE 0 END AS b
  FROM g, generate_series(0, 7) AS i(i), generate_series(0, 7) AS j(j)
), bytes AS (
  SELECT doc_id, i, sum(b * (1 << (7 - j))) AS byte FROM bits GROUP BY doc_id, i
), hashes AS (
  SELECT doc_id, string_agg(printf('%02x', CAST(byte AS INT)), '' ORDER BY i) AS dhash
  FROM bytes GROUP BY doc_id
), dups AS (
  SELECT dhash, count(*) AS n_dups FROM hashes GROUP BY dhash
)
SELECT h.doc_id, CAST(g.w AS INT) AS width, CAST(g.h AS INT) AS height,
       h.dhash, CAST(d.n_dups AS BIGINT) AS n_dups
FROM hashes h JOIN g USING (doc_id) JOIN dups d USING (dhash)
ORDER BY h.doc_id
"""


QUERIES = {
    "mm_image_dhash": mm_image_dhash,
    "mm_decode": mm_decode,
    "mm_image_ahash": mm_image_ahash,
    "mm_audio_fingerprint": mm_audio_fingerprint,
    "mm_pipeline": mm_pipeline,
    "mm_pgm_roundtrip": mm_pgm_roundtrip,
    "mm_pgm_resize": mm_pgm_resize,
    "mm_wav_roundtrip": mm_wav_roundtrip,
    "mm_video_frames": mm_video_frames,
    "mm_audio_features": mm_audio_features,
}
ORACLES: dict[str, str] = {
    "mm_pgm_resize": MM_PGM_RESIZE_SQL,
    "mm_image_ahash": MM_IMAGE_AHASH_SQL,
    "mm_image_dhash": MM_IMAGE_DHASH_SQL,
    "mm_audio_fingerprint": MM_AUDIO_FINGERPRINT_SQL,
    "mm_decode": MM_DECODE_SQL,
    "mm_pipeline": MM_PIPELINE_SQL,
    "mm_pgm_roundtrip": MM_PGM_ROUNDTRIP_SQL,
    "mm_wav_roundtrip": MM_WAV_ROUNDTRIP_SQL,
    "mm_video_frames": MM_VIDEO_FRAMES_SQL,
    "mm_audio_features": MM_AUDIO_FEATURES_SQL,
}
