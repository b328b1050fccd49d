"""Multimodal column handling (north-star, BASELINE.json).

Convention (schemas.MEDIA): image/audio/video payloads are opaque BINARY
columns + typed metadata (modality, mime, meta map).  Metadata-only
operations (byte length, hashing, routing, filtering) are pure JVM
expressions.  Decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` — the Spark-side
plumbing (schema, batching, partitioning) is real and tested; the actual
media decode is STUBBED (this container ships no image/audio libs) behind
``decode_stub``: it raises NotImplementedError unless ``fake=True``, in
which case it produces deterministic fake features so the pipeline shape is
exercisable end-to-end.

Scale notes: payloads never pass through Python except inside the Arrow
batches of the decode stage itself; partition sizing is byte-aware
(``repartition_by_bytes``) so a partition of 100 MB images and a partition
of 100 MB audio cost the same, independent of row counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def media_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata pass: byte length + md5 of the payload — JVM-side only,
    no Python, usable as a dedup fingerprint for binary columns."""
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col)).cast("long")).withColumn(
        "payload_md5", F.md5(F.col(payload_col).cast("string"))
    )


def repartition_by_bytes(
    df: DataFrame,
    target_bytes: int,
    payload_col: str = "payload",
    sample_fraction: float | None = None,
) -> DataFrame:
    """Byte-aware repartitioning: estimate total payload bytes and pick the
    partition count so each partition holds ~target_bytes of media, not
    ~equal row counts (rows vary 1000× in size across modalities).

    EAGER: runs one scalar aggregation job over ``payload_col`` before
    returning (a transformation-shaped API cannot otherwise know the byte
    volume — callers sizing a 100 TB decode stage pay one column scan to
    avoid OOMing it).  Pass ``sample_fraction`` to estimate from a Bernoulli
    sample instead — at scale the mean payload size converges fast, and the
    sampled scan reads proportionally less of the (payload-only, column-
    pruned) input."""
    sized = df.select(F.octet_length(F.col(payload_col)).alias("b"))
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
        est = sized.sample(fraction=sample_fraction, seed=7).select(F.sum("b")).first()[0]
        total = int((est or 0) / sample_fraction)
    else:
        total = sized.select(F.sum("b")).first()[0] or 0
    parts = max(1, int(total / max(target_bytes, 1)))
    return df.repartition(parts)


def decode_stub(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    modality_col: str = "modality",
    n_features: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Decode / feature-extract stage over ``mapInPandas``.

    Real-world body would call PIL/torchaudio/ffmpeg per Arrow batch.  Those
    libs are absent here, so: ``fake=False`` raises NotImplementedError at
    executor time (clearly-marked stub); ``fake=True`` emits deterministic
    pseudo-features derived from payload bytes — same signature, same batch
    shape, so partitioning/schema/UDF plumbing is fully exercised.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present "
                    "in this environment; pass fake=True for plumbing tests"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "modality": pdf[modality_col],
                    "n_bytes": pdf[payload_col].map(lambda b: len(b) if b is not None else 0),
                }
            )
            # deterministic fake features: n_features moments of byte values
            # (vectorized — int64-exact, so results equal the naive loop)
            import numpy as np

            def feats(b):
                if b is None or len(b) == 0:
                    return [0.0] * n_features
                arr = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int64)
                moments = [
                    int(np.mod(arr ** k, 251).sum()) for k in (1, 2, 3)
                ]
                return [
                    round(moments[i % 3] / len(arr), 6) for i in range(n_features)
                ]

            out["features"] = pdf[payload_col].map(feats)
            yield out

    cols = df.select(id_col, modality_col, payload_col)
    return cols.mapInPandas(decode, DECODED_SCHEMA)


WAV_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("bits_per_sample", LongType()),
        StructField("n_samples", LongType()),
        StructField("amp_sum", LongType()),
        StructField("amp_max", LongType()),
    ]
)


def wav_wrap(
    df: DataFrame,
    payload_col: str = "payload",
    sample_rate: int = 8000,
) -> DataFrame:
    """Wrap a raw byte column as a canonical mono 8-bit PCM WAV file
    (44-byte RIFF header + data chunk) — pure JVM binary construction, no
    Python.  Only the two length fields vary per row; they are assembled
    little-endian from ``octet_length`` via hex/unhex byte arithmetic, the
    rest of the header is one binary literal.  This is the fixture side of
    the REAL decode path (``decode_wav``): at 100 TB the wrap is a narrow
    codegen-fused projection."""
    import struct as _struct

    data_len = F.octet_length(F.col(payload_col)).cast("long")

    def le4(x):  # little-endian uint32 → 4 raw bytes
        return F.unhex(
            F.concat(
                *[
                    F.lpad(F.hex(F.floor(x / (256**i)).cast("long") % 256), 2, "0")
                    for i in range(4)
                ]
            )
        )

    # "WAVE" + canonical fmt chunk (PCM, mono, 8-bit) + "data" magic
    static_mid = b"WAVEfmt " + _struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 1 * 1, 1, 8
    ) + b"data"
    return df.withColumn(
        payload_col,
        F.concat(
            F.lit(b"RIFF"),
            le4(data_len + 36),  # RIFF chunk size = 36 + data bytes
            F.lit(static_mid),
            le4(data_len),
            F.col(payload_col),
        ),
    )


def decode_wav(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    modality_col: str = "modality",
) -> DataFrame:
    """REAL, dependency-free media decode (not the stub): parse canonical
    RIFF/WAVE PCM — validate the RIFF/WAVE/fmt/data magics, unpack the
    44-byte header (``struct``), slice the PCM frame and compute
    integer-exact amplitude stats with numpy.  Supports 8-bit (unsigned)
    and 16-bit (signed LE) PCM, any channel count, rejecting anything
    non-canonical loudly (a training pipeline must quarantine undecodable
    media, not emit garbage features).

    Runs as Arrow-batched ``mapInPandas`` like every decode stage here;
    parity with Python's stdlib ``wave`` module is pinned by a pytest, and
    the registered query's DuckDB oracle independently recomputes header
    fields + amplitude stats from the pre-wrap source bytes — a full
    construct→decode roundtrip check."""
    import struct as _struct

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mod, raw in zip(
                pdf[id_col], pdf[modality_col], pdf[payload_col]
            ):
                b = bytes(raw)
                if (
                    len(b) < 44
                    or b[:4] != b"RIFF"
                    or b[8:12] != b"WAVE"
                    or b[12:16] != b"fmt "
                ):
                    raise ValueError(f"not a RIFF/WAVE payload (media_id={mid})")
                fmt_size, audio_fmt, ch, sr, _rate, _align, bits = _struct.unpack(
                    "<IHHIIHH", b[16:36]
                )
                if fmt_size != 16 or audio_fmt != 1:
                    raise ValueError(
                        f"only canonical PCM supported (media_id={mid})"
                    )
                if b[36:40] != b"data":
                    raise ValueError(f"missing data chunk (media_id={mid})")
                n_bytes = _struct.unpack("<I", b[40:44])[0]
                if len(b) < 44 + n_bytes:
                    raise ValueError(f"truncated data chunk (media_id={mid})")
                data = np.frombuffer(b, np.uint8, count=n_bytes, offset=44)
                if bits == 8:
                    samples = data.astype(np.int64)
                elif bits == 16:
                    samples = np.frombuffer(data.tobytes(), "<i2").astype(np.int64)
                else:
                    raise ValueError(f"unsupported bit depth {bits}")
                rows.append(
                    (
                        mid,
                        mod,
                        ch,
                        sr,
                        bits,
                        len(samples) // max(ch, 1),
                        int(samples.sum()),
                        int(samples.max()) if len(samples) else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_DECODED_SCHEMA.fields]
            )

    cols = df.select(id_col, modality_col, payload_col)
    return cols.mapInPandas(decode, WAV_DECODED_SCHEMA)


def chunk_payload(
    df: DataFrame,
    chunk_chars: int = 256,
    payload_col: str = "text_payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Split a large payload column into fixed-size chunks with (id, index,
    fingerprint) metadata — the shard-for-processing step of a multimodal
    pipeline (e.g. audio segments, video GOPs), expressed entirely JVM-side:
    sequence → transform(substring) → explode.  Chunk order is explicit in
    ``chunk_idx`` so downstream reassembly never depends on row order."""
    n_chunks = F.ceil(F.length(F.col(payload_col)) / F.lit(chunk_chars)).cast("int")
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.substring(
                F.col(payload_col), i * chunk_chars + 1, chunk_chars
            ).alias("chunk"),
        ),
    )
    exploded = df.select(F.col(id_col), F.explode(chunks).alias("c"))
    return exploded.select(
        F.col(id_col),
        F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
        F.length("c.chunk").cast("long").alias("chunk_chars"),
        F.md5(F.col("c.chunk")).alias("chunk_md5"),
    )


def frame_sample(
    df: DataFrame,
    frame_bytes: int = 128,
    every_k: int = 4,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Sample every k-th fixed-size frame from a binary payload — the
    video-style frame-sampling step (decode of the sampled frames is the
    separately-stubbed ``decode_stub``; THIS stage, the byte slicing, is
    where the data volume drops by k and it runs entirely JVM-side:
    sequence-with-step → substring on binary → explode.  No shuffle; at
    100 TB the 1/k output reduction happens before anything crosses to
    Python or the network)."""
    if frame_bytes <= 0 or every_k <= 0:
        raise ValueError(f"need positive frame_bytes/every_k, got {frame_bytes}/{every_k}")
    n_frames = F.ceil(F.octet_length(F.col(payload_col)) / F.lit(frame_bytes)).cast("int")
    idx = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(every_k))
    ).otherwise(F.array().cast("array<int>"))
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(
                F.col(payload_col), i * frame_bytes + 1, frame_bytes
            ).alias("frame"),
        ),
    )
    exploded = df.select(F.col(id_col), F.explode(frames).alias("f"))
    return exploded.select(
        F.col(id_col),
        F.col("f.frame_idx").cast("long").alias("frame_idx"),
        F.octet_length("f.frame").cast("long").alias("frame_bytes"),
        F.md5(F.col("f.frame")).alias("frame_md5"),
    )


PPM_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("r_sum", LongType()),
        StructField("g_sum", LongType()),
        StructField("b_sum", LongType()),
        StructField("rgb_max", LongType()),
    ]
)

PPM_RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def ppm_wrap(
    df: DataFrame,
    payload_col: str = "payload",
    width: int = 16,
    height: int = 12,
) -> DataFrame:
    """Wrap a raw byte column as a canonical binary PPM (P6) image of fixed
    ``width``×``height``: static ASCII header + the first w·h·3 payload
    bytes, zero-padded when short — pure JVM binary construction (concat +
    substring on BINARY), the image sibling of ``wav_wrap``.  At 100 TB the
    wrap is a narrow codegen-fused projection."""
    body_len = width * height * 3
    header = f"P6\n{width} {height}\n255\n".encode()
    return df.withColumn(
        payload_col,
        F.concat(
            F.lit(header),
            F.substring(
                F.concat(F.col(payload_col), F.lit(b"\x00" * body_len)),
                1,
                body_len,
            ),
        ),
    )


def _parse_p6(b: bytes, mid) -> tuple[int, int, bytes]:
    """Strict canonical P6 parse (the exact shape ppm_wrap writes):
    b'P6\\n{w} {h}\\n255\\n' + w*h*3 raw RGB bytes."""
    if not b.startswith(b"P6\n"):
        raise ValueError(f"not a P6 PPM payload (media_id={mid})")
    nl2 = b.index(b"\n", 3)
    dims = b[3:nl2].split(b" ")
    if len(dims) != 2:
        raise ValueError(f"malformed PPM dimensions (media_id={mid})")
    w, h = int(dims[0]), int(dims[1])
    nl3 = b.index(b"\n", nl2 + 1)
    if b[nl2 + 1 : nl3] != b"255":
        raise ValueError(f"only maxval 255 supported (media_id={mid})")
    body = b[nl3 + 1 :]
    if len(body) < w * h * 3:
        raise ValueError(f"truncated PPM body (media_id={mid})")
    return w, h, body[: w * h * 3]


def decode_ppm(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    modality_col: str = "modality",
) -> DataFrame:
    """REAL, dependency-free image decode: strict P6 header parse + numpy
    per-channel integer stats (sum per R/G/B plane, global max).  Arrow-
    batched ``mapInPandas`` like every decode stage; undecodable payloads
    raise loudly (quarantine, don't emit garbage features)."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mod, raw in zip(
                pdf[id_col], pdf[modality_col], pdf[payload_col]
            ):
                w, h, body = _parse_p6(bytes(raw), mid)
                img = np.frombuffer(body, np.uint8).reshape(h, w, 3).astype(np.int64)
                rows.append(
                    (
                        mid,
                        mod,
                        w,
                        h,
                        int(img[:, :, 0].sum()),
                        int(img[:, :, 1].sum()),
                        int(img[:, :, 2].sum()),
                        int(img.max()) if img.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PPM_DECODED_SCHEMA.fields]
            )

    return df.select(id_col, modality_col, payload_col).mapInPandas(
        decode, PPM_DECODED_SCHEMA
    )


def resize_ppm_nearest(
    df: DataFrame,
    out_width: int,
    out_height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    modality_col: str = "modality",
) -> DataFrame:
    """Nearest-neighbor image resize over P6 payloads — the multimodal
    RESIZE verb, real and deterministic (source pixel (floor(y·h/out_h),
    floor(x·w/out_w)); byte-exact, so the whole wrap→resize→decode chain
    replays in the DuckDB oracle).  Arrow-batched ``mapInPandas``; emits a
    re-encoded P6 payload so resize composes with every other P6 consumer.
    At scale this is the classic preprocessing step in front of a vision
    encoder: payload-in/payload-out, no shuffle, byte-aware partitioning
    upstream (``repartition_by_bytes``)."""
    import numpy as np

    if out_width <= 0 or out_height <= 0:
        raise ValueError(f"need positive output dims, got {out_width}x{out_height}")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mod, raw in zip(
                pdf[id_col], pdf[modality_col], pdf[payload_col]
            ):
                w, h, body = _parse_p6(bytes(raw), mid)
                img = np.frombuffer(body, np.uint8).reshape(h, w, 3)
                ys = (np.arange(out_height) * h) // out_height
                xs = (np.arange(out_width) * w) // out_width
                out = img[ys][:, xs]
                payload = (
                    f"P6\n{out_width} {out_height}\n255\n".encode()
                    + out.tobytes()
                )
                rows.append((mid, mod, payload, out_width, out_height))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PPM_RESIZED_SCHEMA.fields]
            )

    return df.select(id_col, modality_col, payload_col).mapInPandas(
        resize, PPM_RESIZED_SCHEMA
    )


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("ahash_hi", LongType()),
        StructField("ahash_lo", LongType()),
        StructField("n_set", LongType()),
    ]
)


def ahash_ppm(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    modality_col: str = "modality",
) -> DataFrame:
    """Perceptual average-hash over 8×8 P6 payloads — the image-near-dup
    primitive (compose with ``resize_ppm_nearest(df, 8, 8)`` to hash any
    size): per pixel gray = (r+g+b)//3, threshold at the integer mean
    (sum(gray)//64), bit i set when gray_i > mean, row-major.  Emitted as
    two BIGINT halves (bits 63..32 / 31..0) so consumers compute hamming
    distance with two XOR+popcounts and bucket near-identical images on
    hash equality or prefix — the SimHash playbook applied to pixels.
    All-integer, so the full wrap→resize→hash chain replays bit-for-bit
    in the DuckDB oracle."""
    import numpy as np

    def hsh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mod, raw in zip(
                pdf[id_col], pdf[modality_col], pdf[payload_col]
            ):
                w, h, body = _parse_p6(bytes(raw), mid)
                if (w, h) != (8, 8):
                    raise ValueError(
                        f"ahash_ppm expects 8x8 input, got {w}x{h} "
                        f"(media_id={mid}) — resize_ppm_nearest first"
                    )
                img = np.frombuffer(body, np.uint8).reshape(64, 3).astype(np.int64)
                gray = (img[:, 0] + img[:, 1] + img[:, 2]) // 3
                mean = int(gray.sum()) // 64
                bits = [1 if int(g) > mean else 0 for g in gray]
                hi = sum(b << i for i, b in enumerate(bits[:32]))  # pixels 0..31
                lo = sum(b << i for i, b in enumerate(bits[32:]))  # pixels 32..63
                rows.append((mid, mod, hi, lo, sum(bits)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AHASH_SCHEMA.fields]
            )

    return df.select(id_col, modality_col, payload_col).mapInPandas(
        hsh, AHASH_SCHEMA
    )


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_samples", LongType()),
        StructField("energy_sum", LongType()),
        StructField("fp", LongType()),
    ]
)


def wav_energy_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    modality_col: str = "modality",
    n_windows: int = 32,
) -> DataFrame:
    """Audio near-dup fingerprint over canonical mono 8-bit PCM WAV
    payloads (``wav_wrap`` output): split the sample stream into
    ``n_windows`` contiguous windows (window w covers samples
    [n·w/W, n·(w+1)/W)), e_w = integer sample sum, and bit w of ``fp`` is
    set when window w is LOUDER than window w+1 — compared density-exact
    by cross-multiplication (e_w·n_{w+1} > e_{w+1}·n_w), so unequal
    window lengths never bias the bit.  The energy-delta profile is the
    classic audio-matching shape (Shazam/chromaprint lineage, minus the
    FFT this container can't verify bit-exactly): W-1 bits in one BIGINT,
    hamming distance = one XOR+popcount, bucketing on fp equality/prefix.
    All-integer -> the whole chain replays in the DuckDB oracle."""
    import struct as _struct

    import numpy as np

    if not 2 <= n_windows <= 64:
        raise ValueError(f"n_windows must be in [2, 64], got {n_windows}")

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mod, raw in zip(
                pdf[id_col], pdf[modality_col], pdf[payload_col]
            ):
                b = bytes(raw)
                if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError(f"not a RIFF/WAVE payload (media_id={mid})")
                _, _, ch, _, _, _, bits = _struct.unpack("<IHHIIHH", b[16:36])
                if ch != 1 or bits != 8 or b[36:40] != b"data":
                    raise ValueError(
                        f"fingerprint needs canonical mono 8-bit PCM (media_id={mid})"
                    )
                n = _struct.unpack("<I", b[40:44])[0]
                s = np.frombuffer(b, np.uint8, count=n, offset=44).astype(np.int64)
                bounds = [(n * w) // n_windows for w in range(n_windows + 1)]
                e = [int(s[bounds[w] : bounds[w + 1]].sum()) for w in range(n_windows)]
                ln = [bounds[w + 1] - bounds[w] for w in range(n_windows)]
                val = sum(
                    (1 << w)
                    for w in range(n_windows - 1)
                    if e[w] * ln[w + 1] > e[w + 1] * ln[w]
                )
                rows.append((mid, mod, n, int(s.sum()), val))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FP_SCHEMA.fields]
            )

    return df.select(id_col, modality_col, payload_col).mapInPandas(
        fp, AUDIO_FP_SCHEMA
    )


QUIET_SEG_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("quiet_mask", LongType()),
        StructField("n_quiet", LongType()),
        StructField("n_segments", LongType()),
        StructField("longest_run", LongType()),
    ]
)


def wav_quiet_segments(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    modality_col: str = "modality",
    n_windows: int = 32,
) -> DataFrame:
    """Relative VAD (voice-activity-detection-lite) over canonical mono
    8-bit PCM WAV payloads: split the sample stream into ``n_windows``
    windows (same floor-division bounds as the energy fingerprint), a
    window is QUIET when its mean absolute deviation from the 128
    midline is below the document's own mean — compared density-exact by
    cross-multiplication (dev_w · n < dev_total · len_w), so no
    absolute threshold needs tuning per corpus.  Emits the packed quiet
    mask plus its run-length structure (count of quiet windows, number
    of maximal quiet segments, longest segment) — the segmentation a
    speech pipeline uses to cut clips before transcription.

    Integer end to end → the oracle replays windows, deviations, mask
    AND run-lengths (bin()-string splitting) in DuckDB."""
    import struct as _struct

    import numpy as np

    if not 2 <= n_windows <= 63:
        raise ValueError(f"n_windows must be in [2, 63], got {n_windows}")

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mod, raw in zip(
                pdf[id_col], pdf[modality_col], pdf[payload_col]
            ):
                b = bytes(raw)
                if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError(f"not a RIFF/WAVE payload (media_id={mid})")
                n = _struct.unpack("<I", b[40:44])[0]
                s = np.frombuffer(b, np.uint8, count=n, offset=44).astype(
                    np.int64
                )
                dev = np.abs(s - 128)
                bounds = [(n * w) // n_windows for w in range(n_windows + 1)]
                d = [
                    int(dev[bounds[w] : bounds[w + 1]].sum())
                    for w in range(n_windows)
                ]
                ln = [bounds[w + 1] - bounds[w] for w in range(n_windows)]
                dtot = sum(d)
                mask = sum(
                    (1 << w)
                    for w in range(n_windows)
                    if d[w] * n < dtot * ln[w]
                )
                bits = bin(mask)[2:]
                runs = [r for r in bits.split("0") if r]
                rows.append(
                    (
                        mid,
                        mod,
                        mask,
                        sum(len(r) for r in runs),
                        len(runs),
                        max((len(r) for r in runs), default=0),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in QUIET_SEG_SCHEMA.fields]
            )

    return df.select(id_col, modality_col, payload_col).mapInPandas(
        seg, QUIET_SEG_SCHEMA
    )


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("dhash_hi", LongType()),
        StructField("dhash_lo", LongType()),
        StructField("n_set", LongType()),
    ]
)


def dhash_ppm(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    modality_col: str = "modality",
) -> DataFrame:
    """Difference-hash over 9×8 P6 payloads — aHash's standard
    complement (compose with ``resize_ppm_nearest(df, 9, 8)``): per row
    of the 9-wide grayscale grid, bit (row·8 + col) is set when
    gray[row][col] > gray[row][col+1] — a horizontal-gradient signature,
    robust to global brightness shifts that move aHash's mean threshold.
    Same two-BIGINT-halves + popcount emission as ahash_ppm, so the
    near-dup bucketing/hamming machinery is shared.  All-integer →
    bit-for-bit DuckDB replay."""
    import numpy as np

    def hsh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mod, raw in zip(
                pdf[id_col], pdf[modality_col], pdf[payload_col]
            ):
                w, h, body = _parse_p6(bytes(raw), mid)
                if (w, h) != (9, 8):
                    raise ValueError(
                        f"dhash_ppm expects 9x8 input, got {w}x{h} "
                        f"(media_id={mid}) — resize_ppm_nearest first"
                    )
                img = (
                    np.frombuffer(body, np.uint8)
                    .reshape(8, 9, 3)
                    .astype(np.int64)
                )
                gray = (img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3
                bits = [
                    1 if int(gray[r, c]) > int(gray[r, c + 1]) else 0
                    for r in range(8)
                    for c in range(8)
                ]
                hi = sum(b << i for i, b in enumerate(bits[:32]))
                lo = sum(b << i for i, b in enumerate(bits[32:]))
                rows.append((mid, mod, hi, lo, sum(bits)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DHASH_SCHEMA.fields]
            )

    return df.select(id_col, modality_col, payload_col).mapInPandas(
        hsh, DHASH_SCHEMA
    )


SHOT_SEG_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_cuts", LongType()),
        StructField("n_shots", LongType()),
        StructField("longest_shot", LongType()),
    ]
)


def video_shot_segments(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    frame_bytes: int = 64,
) -> DataFrame:
    """Shot-boundary segmentation over raw video payloads (frames =
    consecutive ``frame_bytes`` slices, the frame_sample convention): a
    CUT falls between adjacent frames whose energy delta is above the
    video's own mean delta — |e_w − e_{w+1}|·(n−1) > Σd, the same
    relative cross-multiplied threshold as the audio quiet segments, so
    no per-corpus tuning.  Emits the shot structure (cuts, shots,
    longest shot in frames) — the pre-processing a video pipeline runs
    before per-shot frame sampling.  Integer end to end → full DuckDB
    replay including the run-length decomposition."""
    import numpy as np

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(raw)
                n = len(b)
                nf = (n + frame_bytes - 1) // frame_bytes
                if nf == 0:
                    rows.append((mid, 0, 0, 0, 0))
                    continue
                arr = np.frombuffer(b, np.uint8).astype(np.int64)
                es = [
                    int(arr[w * frame_bytes : min((w + 1) * frame_bytes, n)].sum())
                    for w in range(nf)
                ]
                ds = [abs(es[w] - es[w + 1]) for w in range(nf - 1)]
                sd = sum(ds)
                cuts = [
                    w + 1
                    for w in range(nf - 1)
                    if ds[w] * (nf - 1) > sd
                ]
                cp = [0] + cuts + [nf]
                lengths = [cp[k + 1] - cp[k] for k in range(len(cp) - 1)]
                rows.append(
                    (mid, nf, len(cuts), len(cuts) + 1, max(lengths))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SHOT_SEG_SCHEMA.fields]
            )

    return df.select(id_col, payload_col).mapInPandas(seg, SHOT_SEG_SCHEMA)


# --- pHash: DCT-II perceptual hash, integer fixed-point ---------------------

# Orthonormal DCT-II basis, scaled to integers by 2^10: the SAME literal
# matrix drives the pandas UDF (numpy int64 matmul) and the generated
# DuckDB oracle (phash_k_terms below), so the chain is bit-exact across
# engines by construction — floats only at module-import time, never at
# query time.
import math as _math

PHASH_DCT_SCALE = 1024
PHASH_C = [
    [
        round(
            PHASH_DCT_SCALE
            * _math.sqrt((1.0 if u == 0 else 2.0) / 8.0)
            * _math.cos((2 * x + 1) * u * _math.pi / 16.0)
        )
        for x in range(8)
    ]
    for u in range(8)
]
PHASH_BLOCK = 4  # keep the low-frequency 4x4 block; 15 AC bits


def phash_k_terms() -> list[list[int]]:
    """Per-AC-coefficient integer weights over the row-major 8×8 gray
    vector: K[(u,v)][r*8+c] = C[u][r]·C[v][c] for (u,v) in the low 4×4
    block, DC (0,0) excluded — the oracle generator consumes this."""
    out = []
    for u in range(PHASH_BLOCK):
        for v in range(PHASH_BLOCK):
            if u == 0 and v == 0:
                continue
            out.append(
                [PHASH_C[u][r] * PHASH_C[v][c] for r in range(8) for c in range(8)]
            )
    return out


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("phash", LongType()),
        StructField("n_set", LongType()),
        StructField("dc_fp", LongType()),
    ]
)


def phash_ppm(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    modality_col: str = "modality",
) -> DataFrame:
    """Perceptual DCT hash over 8×8 P6 payloads (pHash lineage: aHash
    thresholds raw pixels, dHash thresholds gradients; pHash thresholds
    the LOW-FREQUENCY SPECTRUM, so it survives brightness shifts and
    high-frequency noise that flip aHash bits).  Per image: gray =
    (r+g+b)//3 row-major, 2-D DCT-II D = C·G·Cᵀ in int64 fixed point
    (PHASH_C, 2^10-scaled orthonormal basis; |D| ≤ 64·2^20·255 < 2^35 —
    no overflow), keep the 4×4 low-frequency block minus DC, bit i set
    when coefficient i exceeds the LOWER MEDIAN of the 15 AC values
    (discrete rank-8 order statistic — integer-exact, the
    supplier_mad_outliers median discipline).  dc_fp carries the DC
    coefficient (total luminance in basis units) for brightness
    bucketing.  Same two-XOR+popcount consumer contract as
    ahash_ppm/dhash_ppm; 15 bits fit one BIGINT."""
    import numpy as np

    c4 = np.array(PHASH_C[:PHASH_BLOCK], dtype=np.int64)  # 4x8

    def hsh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mod, raw in zip(
                pdf[id_col], pdf[modality_col], pdf[payload_col]
            ):
                w, h, body = _parse_p6(bytes(raw), mid)
                if (w, h) != (8, 8):
                    raise ValueError(
                        f"phash_ppm expects 8x8 input, got {w}x{h} "
                        f"(media_id={mid}) — resize_ppm_nearest first"
                    )
                img = np.frombuffer(body, np.uint8).reshape(64, 3).astype(np.int64)
                gray = ((img[:, 0] + img[:, 1] + img[:, 2]) // 3).reshape(8, 8)
                d = c4 @ gray @ c4.T  # 4x4, exact int64
                ac = [int(d[u, v]) for u in range(PHASH_BLOCK)
                      for v in range(PHASH_BLOCK) if (u, v) != (0, 0)]
                med = sorted(ac)[(len(ac) + 1) // 2 - 1]  # lower median, rank 8/15
                bits = [1 if a > med else 0 for a in ac]
                ph = sum(b << i for i, b in enumerate(bits))
                rows.append((mid, mod, ph, sum(bits), int(d[0, 0])))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PHASH_SCHEMA.fields]
            )

    return df.select(id_col, modality_col, payload_col).mapInPandas(
        hsh, PHASH_SCHEMA
    )
