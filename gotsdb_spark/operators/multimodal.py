"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted via Arrow-batched mapInPandas.

The image/audio codecs aren't in this container, so the *decode* step is
a deterministic fake (md5-derived pseudo-dimensions) behind the same
seam a real decoder would use — the Spark-side plumbing (binary column,
schema, batch iteration, partitioning) is real and tested. A production
deployment swaps `_fake_decode` for PIL/ffmpeg inside the same
mapInPandas, nothing else changes.

Scale: mapInPandas streams Arrow batches through Python — payload bytes
are never materialized row-at-a-time, and each partition decodes
independently (embarrassingly parallel across 1000 executors).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gotsdb_spark.operators.registry import query
from gotsdb_spark.sources.registry import fan_out, load_table

FEATURE_SCHEMA = (
    "doc_id bigint, payload_len bigint, fingerprint string, width int, height int"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + typed metadata struct.

    Models how a real pipeline carries images/audio: bytes next to
    structured metadata, schema known to Spark, payload opaque to it.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length("text").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for an image decoder.

    Returns (fingerprint, width, height) derived from md5 so the DuckDB
    oracle can reproduce it. Real decode would raise on corrupt bytes;
    see `decode_image` below for the gated real path.
    """
    h = hashlib.md5(payload).hexdigest()
    width = (ord(h[0]) * 256 + ord(h[1])) % 1024
    height = (ord(h[2]) * 256 + ord(h[3])) % 1024
    return h, width, height


def decode_image(payload: bytes) -> tuple[str, int, int]:
    """Real image decode behind an optional PIL dependency.

    When PIL is installed, decodes the payload and returns the same
    (fingerprint, width, height) shape as ``_fake_decode`` so the two
    are drop-in interchangeable inside ``extract_features``. When PIL is
    absent (as in this container), raises NotImplementedError — both
    branches are covered by tests (skip-gated on the import)."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as exc:
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "_fake_decode is the deterministic stand-in for the oracle"
        ) from exc
    img = Image.open(io.BytesIO(payload))
    img.load()
    return hashlib.md5(payload).hexdigest(), img.width, img.height


def extract_features(payloads: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(lambda b: _fake_decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_len": pdf["payload"].map(len).astype("int64"),
                    "fingerprint": decoded.map(lambda t: t[0]),
                    "width": decoded.map(lambda t: t[1]).astype("int32"),
                    "height": decoded.map(lambda t: t[2]).astype("int32"),
                }
            )

    return payloads.mapInPandas(batches, schema=FEATURE_SCHEMA)


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
           md5(text) AS fingerprint,
           CAST((ascii(substr(md5(text), 1, 1)) * 256
                 + ascii(substr(md5(text), 2, 1))) % 1024 AS INT) AS width,
           CAST((ascii(substr(md5(text), 3, 1)) * 256
                 + ascii(substr(md5(text), 4, 1))) % 1024 AS INT) AS height
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas decode → typed feature columns.

    The only Pandas-UDF-path query in the suite — deliberately, to prove
    the Arrow batch plumbing end-to-end against a SQL oracle.
    """
    # Cap the fan-out: each partition costs a Python worker; 8 keeps the
    # Arrow batches large enough to amortize worker startup locally.
    docs = fan_out(load_table(spark, "documents", sf_dir), n=8)
    return extract_features(with_binary_payload(docs))


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_hash string"


def sample_frames(payloads: DataFrame) -> DataFrame:
    """One-to-many Pandas decode: 'sample N frames' per payload.

    Models video frame-sampling: each binary payload yields a variable
    number of output rows (here a deterministic fake: 1 + len%5 frames,
    each fingerprinted from the payload hash + index). The plumbing —
    variable fan-out inside mapInPandas, typed output schema — is
    exactly what a real ffmpeg-based sampler needs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                h = hashlib.md5(b).hexdigest()
                for i in range(1 + len(b) % 5):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_hash"].append(
                        hashlib.md5(f"{h}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return payloads.mapInPandas(batches, schema=FRAME_SCHEMA)


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(g.i AS INT) AS frame_idx,
           md5(md5(text) || ':' || CAST(g.i AS VARCHAR)) AS frame_hash
    FROM documents,
         unnest(generate_series(0, octet_length(encode(text)) % 5)) AS g(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-fan-out frame sampling through the binary-payload path."""
    docs = fan_out(load_table(spark, "documents", sf_dir), n=8)
    return sample_frames(with_binary_payload(docs))


# ---------------------------------------------------------------------------
# Real codec path: netpbm P6 (binary PPM) — an actual image format with
# a real parser, zero external dependencies (numpy ships in every Spark
# Python env). The fixtures carry no images, so the payloads are
# deterministic VALID P6 files synthesized from each document (dims from
# doc_id, pixels from the md5 digest cycled) — real bytes through a real
# header-parsing, buffer-reshaping decoder, with decode failures raised
# on malformed input. The DuckDB oracle reproduces the expected channel
# means analytically from the same md5 byte stream, so the decoder's
# OUTPUT (not a stand-in) is what hash-matches.
# ---------------------------------------------------------------------------

PPM_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int,"
    " mean_r double, mean_g double, mean_b double"
)


def with_ppm_payload(docs: DataFrame) -> DataFrame:
    """Synthesize a valid P6 PPM binary per document (JVM-side concat:
    ASCII header + md5-derived pixel bytes)."""
    w = (F.col("doc_id") % 8 + 2).cast("int")
    h = (F.floor(F.col("doc_id") / 8).cast("long") % 6 + 2).cast("int")
    n_bytes = (w * h * 3).cast("int")
    header = F.format_string("P6\n%d %d\n255\n", w, h)
    pixels = F.substr(
        F.unhex(F.repeat(F.md5("text"), 12)), F.lit(1), n_bytes
    )
    return docs.select(
        "doc_id",
        F.concat(F.encode(header, "UTF-8"), pixels).alias("payload"),
    )


def decode_ppm(payload: bytes) -> tuple[int, int, float, float, float]:
    """Parse a binary P6 PPM: magic, dimensions, maxval, pixel buffer.

    Returns (width, height, mean_r, mean_g, mean_b). Raises ValueError
    on malformed input — this is a real decoder, not a fingerprint."""
    import numpy as np

    if not payload.startswith(b"P6\n"):
        raise ValueError("not a P6 PPM payload")
    dims, rest = payload[3:].split(b"\n", 1)
    width, height = (int(x) for x in dims.split())
    maxval, rest = rest.split(b"\n", 1)
    if int(maxval) != 255:
        raise ValueError(f"unsupported maxval {int(maxval)}")
    n = width * height * 3
    px = np.frombuffer(rest, dtype=np.uint8, count=-1)
    if px.size != n:
        raise ValueError(f"pixel buffer is {px.size} bytes, expected {n}")
    arr = px.reshape(height, width, 3).astype(np.float64)
    return (
        width,
        height,
        float(arr[..., 0].mean()),
        float(arr[..., 1].mean()),
        float(arr[..., 2].mean()),
    )


@query(
    "multimodal_ppm_decode",
    oracle="""
    WITH g AS (
      SELECT doc_id, md5(text) AS hx,
             CAST(doc_id % 8 + 2 AS INT) AS width,
             CAST((doc_id // 8) % 6 + 2 AS INT) AS height
      FROM documents
    ), idx AS (
      SELECT doc_id, hx, width, height,
             unnest(generate_series(0, width * height * 3 - 1)) AS i
      FROM g
    ), vals AS (
      SELECT doc_id, width, height, i % 3 AS channel,
             CAST('0x' || substr(hx, 2 * (i % 16) + 1, 2) AS INT) AS v
      FROM idx
    )
    SELECT doc_id, width, height,
           avg(CASE WHEN channel = 0 THEN v END) AS mean_r,
           avg(CASE WHEN channel = 1 THEN v END) AS mean_g,
           avg(CASE WHEN channel = 2 THEN v END) AS mean_b
    FROM vals GROUP BY doc_id, width, height
    """,
)
def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode end-to-end: synthesize valid P6 PPMs, stream
    them through an Arrow-batched mapInPandas running an actual netpbm
    parser (header → dims → buffer reshape), emit per-channel means.

    The oracle never sees the binary — it recomputes the expected means
    analytically from the md5 byte cycle, so a parser bug (offset,
    stride, channel order) is a hash mismatch. Channel sums are integer
    counts in float64 (exact), so the division is bit-identical across
    engines. At 100 TB this is the template for any codec: bytes stay
    in Arrow batches, each partition decodes independently, and the
    numeric features are the only thing that shuffles.
    """
    docs = fan_out(load_table(spark, "documents", sf_dir))
    payloads = with_ppm_payload(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(lambda b: decode_ppm(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": decoded.map(lambda t: t[0]).astype("int32"),
                    "height": decoded.map(lambda t: t[1]).astype("int32"),
                    "mean_r": decoded.map(lambda t: t[2]),
                    "mean_g": decoded.map(lambda t: t[3]),
                    "mean_b": decoded.map(lambda t: t[4]),
                }
            )

    return payloads.mapInPandas(batches, schema=PPM_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Real audio codec path: RIFF/WAV PCM16 via the stdlib `wave` module —
# the audio twin of the PPM decoder above. Payloads are valid mono
# 8 kHz 16-bit WAV files (constant 44-byte header precomputed below +
# 64 md5-cycled samples), decoded by an actual RIFF parser; the oracle
# recomputes RMS/mean/peak analytically from the same little-endian
# int16 byte pairs.
# ---------------------------------------------------------------------------

# RIFF/fmt/data header for mono, 8000 Hz, 16-bit, 64 samples (struct
# layout "<4sI4s4sIHHIIHH4sI" — fixed because every field is constant).
_WAV_HEADER_HEX = (
    "52494646a400000057415645666d7420100000000100"
    "0100401f0000803e000002001000646174618000"
    "0000"
)
WAV_N_SAMPLES = 64
WAV_RATE = 8000

WAV_FEATURE_SCHEMA = (
    "doc_id bigint, n_samples int, sample_rate int,"
    " mean_amp double, rms double, peak int"
)


def with_wav_payload(docs: DataFrame) -> DataFrame:
    """Valid WAV binary per document: constant header + 128 PCM bytes
    cycled from the md5 digest (8 distinct LE int16 samples × 8)."""
    pcm = F.unhex(F.repeat(F.md5("text"), 8))
    return docs.select(
        "doc_id",
        F.concat(F.unhex(F.lit(_WAV_HEADER_HEX)), pcm).alias("payload"),
    )


def decode_wav(payload: bytes) -> tuple[int, int, float, float, int]:
    """Parse a RIFF/WAV payload with the stdlib wave reader.

    Returns (n_samples, sample_rate, mean_amp, rms, peak). Raises on
    anything that is not mono 16-bit PCM."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getnchannels() != 1 or wf.getsampwidth() != 2:
            raise ValueError("expected mono 16-bit PCM")
        rate = wf.getframerate()
        n = wf.getnframes()
        raw = wf.readframes(n)
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    if samples.size != n:
        raise ValueError(f"frame count mismatch: {samples.size} != {n}")
    return (
        n,
        rate,
        float(samples.mean()),
        float(np.sqrt((samples * samples).mean())),
        int(np.abs(samples).max()),
    )


@query(
    "multimodal_wav_decode",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, md5(text) AS hx FROM documents
    ), idx AS (
      SELECT doc_id, hx, unnest(generate_series(0, {WAV_N_SAMPLES - 1})) AS i
      FROM g
    ), vals AS (
      SELECT doc_id,
             CAST('0x' || substr(hx, 2 * ((2 * i) % 16) + 1, 2) AS INT)
             + 256 * CAST('0x' || substr(hx, 2 * ((2 * i + 1) % 16) + 1, 2)
                          AS INT) AS u
      FROM idx
    ), pcm AS (
      SELECT doc_id, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v
      FROM vals
    )
    SELECT doc_id,
           CAST({WAV_N_SAMPLES} AS INT) AS n_samples,
           CAST({WAV_RATE} AS INT) AS sample_rate,
           avg(v) AS mean_amp,
           sqrt(avg(CAST(v AS DOUBLE) * v)) AS rms,
           CAST(max(abs(v)) AS INT) AS peak
    FROM pcm GROUP BY doc_id
    """,
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode end-to-end: valid RIFF/WAV PCM16 payloads
    through the stdlib wave parser inside mapInPandas, emitting
    amplitude statistics.

    Same contract as multimodal_ppm_decode: the oracle reconstructs the
    little-endian int16 stream analytically, so endianness or framing
    bugs in the decode path are hash mismatches. Integer sample sums
    and sums of squares are exact in float64 (64 samples × < 2^30 per
    term), making mean/rms bit-identical across engines.
    """
    docs = fan_out(load_table(spark, "documents", sf_dir))
    payloads = with_wav_payload(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(lambda b: decode_wav(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": decoded.map(lambda t: t[0]).astype("int32"),
                    "sample_rate": decoded.map(lambda t: t[1]).astype("int32"),
                    "mean_amp": decoded.map(lambda t: t[2]),
                    "rms": decoded.map(lambda t: t[3]),
                    "peak": decoded.map(lambda t: t[4]).astype("int32"),
                }
            )

    return payloads.mapInPandas(batches, schema=WAV_FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, out_w int, out_h int,"
    " rmean_r double, rmean_g double, rmean_b double"
)


def resize_nearest(arr, out_h: int, out_w: int):
    """Nearest-neighbor resize of an (h, w, c) uint8/float array — the
    real index arithmetic (source row/col = floor(target * src / dst)),
    not a stand-in."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[np.ix_(rows, cols)]


@query(
    "multimodal_resize",
    oracle="""
    WITH g AS (
      SELECT doc_id, md5(text) AS hx,
             CAST(doc_id % 8 + 2 AS INT) AS width,
             CAST((doc_id // 8) % 6 + 2 AS INT) AS height
      FROM documents
    ), grid AS (
      SELECT doc_id, hx, width, height,
             unnest(generate_series(0, 11)) AS j
      FROM g
    ), sampled AS (
      SELECT doc_id, j % 3 AS channel,
             CAST('0x' || substr(hx,
               2 * ((((((j // 3) // 2) * height // 2) * width
                      + ((j // 3) % 2) * width // 2) * 3 + j % 3) % 16)
               + 1, 2) AS INT) AS v
      FROM grid
    )
    SELECT doc_id,
           CAST(2 AS INT) AS out_w,
           CAST(2 AS INT) AS out_h,
           avg(CASE WHEN channel = 0 THEN v END) AS rmean_r,
           avg(CASE WHEN channel = 1 THEN v END) AS rmean_g,
           avg(CASE WHEN channel = 2 THEN v END) AS rmean_b
    FROM sampled GROUP BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → nearest-neighbor resize to 2×2 → per-channel means, all
    inside one Arrow-batched mapInPandas.

    Completes the decode / feature-extract / RESIZE / frame-sample
    quartet with the resize step done by real index arithmetic on the
    decoded pixel array. The oracle replays the same source-index
    computation ((target * src) // dst per axis, row-major offset into
    the md5 byte cycle) without touching the binary, so an off-by-one
    in either axis, a transposed index order, or a channel mixup all
    hash-mismatch.
    """
    import numpy as np

    docs = fan_out(load_table(spark, "documents", sf_dir))
    payloads = with_ppm_payload(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "out_w": [], "out_h": [],
                   "rmean_r": [], "rmean_g": [], "rmean_b": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w, h, *_ = decode_ppm(b)
                rest = b.split(b"\n", 3)[3]
                arr = (
                    np.frombuffer(rest, dtype=np.uint8, count=w * h * 3)
                    .reshape(h, w, 3)
                    .astype(np.float64)
                )
                small = resize_nearest(arr, 2, 2)
                out["doc_id"].append(doc_id)
                out["out_w"].append(2)
                out["out_h"].append(2)
                out["rmean_r"].append(float(small[..., 0].mean()))
                out["rmean_g"].append(float(small[..., 1].mean()))
                out["rmean_b"].append(float(small[..., 2].mean()))
            pdf_out = pd.DataFrame(out)
            pdf_out["out_w"] = pdf_out["out_w"].astype("int32")
            pdf_out["out_h"] = pdf_out["out_h"].astype("int32")
            yield pdf_out

    return payloads.mapInPandas(batches, schema=RESIZE_SCHEMA)


_AUDIO_FRAME = 16  # samples per analysis frame (64 samples -> 4 frames)


@query(
    "multimodal_audio_framing",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, md5(text) AS hx FROM documents
    ), idx AS (
      SELECT doc_id, hx, unnest(generate_series(0, {WAV_N_SAMPLES - 1})) AS i
      FROM g
    ), vals AS (
      SELECT doc_id, i,
             CAST('0x' || substr(hx, 2 * ((2 * i) % 16) + 1, 2) AS INT)
             + 256 * CAST('0x' || substr(hx, 2 * ((2 * i + 1) % 16) + 1, 2)
                          AS INT) AS u
      FROM idx
    ), pcm AS (
      SELECT doc_id, i, CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v
      FROM vals
    ), lagged AS (
      SELECT doc_id, i, CAST(i // {_AUDIO_FRAME} AS INT) AS frame_id, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM pcm
    )
    SELECT doc_id, frame_id,
           CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS energy,
           CAST(sum(CASE WHEN i % {_AUDIO_FRAME} > 0
                          AND pv * v < 0 THEN 1 ELSE 0 END) AS INT)
             AS zero_crossings
    FROM lagged GROUP BY doc_id, frame_id
    """,
)
def multimodal_audio_framing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level audio features over the real WAV decode path:
    16-sample frames, per-frame energy (Σv²) and zero-crossing count.

    The framing step every audio featurizer (VAD, MFCC front ends,
    silence trimming) starts with, run through the actual RIFF parser
    in mapInPandas — one Arrow batch in, four frame rows per clip out.
    Energy is an exact int64 (samples < 2^15, 16 terms); crossings
    compare consecutive samples strictly inside the frame, so the
    oracle can reconstruct both from the same little-endian int16
    stream analytically. The per-clip row fan-out (×4) happens AFTER
    decode inside the same Python call — no second pass over payloads,
    no shuffle until a consumer aggregates frames.
    """
    import numpy as np

    docs = fan_out(load_table(spark, "documents", sf_dir))
    payloads = with_wav_payload(docs)
    n_frames = WAV_N_SAMPLES // _AUDIO_FRAME

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_doc, out_frame, out_energy, out_zc = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                import io
                import wave

                with wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
                    raw = wf.readframes(wf.getnframes())
                v = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                frames = v.reshape(n_frames, _AUDIO_FRAME)
                energy = (frames * frames).sum(axis=1)
                signs = frames[:, :-1] * frames[:, 1:]
                zc = (signs < 0).sum(axis=1)
                out_doc.extend([doc_id] * n_frames)
                out_frame.extend(range(n_frames))
                out_energy.extend(energy.tolist())
                out_zc.extend(zc.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_id": pd.Series(out_frame, dtype="int32"),
                    "energy": pd.Series(out_energy, dtype="int64"),
                    "zero_crossings": pd.Series(out_zc, dtype="int32"),
                }
            )

    return payloads.mapInPandas(
        batches,
        schema="doc_id bigint, frame_id int, energy bigint, zero_crossings int",
    )


_AC_MAX_LAG = 16

_AUTOCORR_ORACLE = f"""
    WITH g AS (
      SELECT doc_id, md5(text) AS hx FROM documents
    ), idx AS (
      SELECT doc_id, hx, unnest(generate_series(0, {WAV_N_SAMPLES - 1})) AS i
      FROM g
    ), vals AS (
      SELECT doc_id, i,
             CAST('0x' || substr(hx, 2 * ((2 * i) % 16) + 1, 2) AS INT)
             + 256 * CAST('0x' || substr(hx, 2 * ((2 * i + 1) % 16) + 1, 2)
                          AS INT) AS u
      FROM idx
    ), pcm AS (
      SELECT doc_id, i,
             CAST(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS BIGINT) AS v
      FROM vals
    ), r0 AS (
      SELECT doc_id, sum(v * v) AS r0 FROM pcm GROUP BY doc_id
    ), lagged AS (
      SELECT a.doc_id, l.lag, sum(a.v * b.v) AS r
      FROM (SELECT unnest(generate_series(1, {_AC_MAX_LAG})) AS lag) l,
           pcm a JOIN pcm b ON b.doc_id = a.doc_id AND b.i = a.i + l.lag
      GROUP BY a.doc_id, l.lag
    ), best AS (
      SELECT doc_id, lag, r,
             row_number() OVER (PARTITION BY doc_id ORDER BY r DESC, lag)
               AS rn
      FROM lagged
    )
    SELECT b.doc_id, CAST(b.lag AS INT) AS best_lag,
           CAST(b.r AS BIGINT) AS r_best, CAST(r0.r0 AS BIGINT) AS r0,
           CAST((b.r * 1000000) // r0.r0 AS BIGINT) AS strength_e6
    FROM best b JOIN r0 USING (doc_id) WHERE rn = 1
"""


@query("multimodal_audio_autocorr", oracle=_AUTOCORR_ORACLE)
def multimodal_audio_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pitch detection by autocorrelation over the decoded WAV corpus:
    per clip, the lag in 1..{_AC_MAX_LAG} whose raw autocorrelation
    R[L] = Σ x[i]·x[i+L] is largest, with its periodicity strength
    R[best]/R[0].

    The first DSP feature extractor over the audio payloads (decode →
    amplitude stats existed; this analyzes STRUCTURE): autocorrelation
    peak-picking is the classic O(n·maxlag) pitch estimator, and the
    md5-cycled fixtures have an exact period of 8 samples, which the
    estimator must discover from the waveform alone. All arithmetic is
    int64 (int16 products summed, strength as integer-scaled division)
    so the DuckDB oracle — which recomputes the PCM stream analytically
    from the md5 bytes and autocorrelates in SQL — matches bit-exactly.

    Scale shape: identical to every codec op here — payload decode and
    the full R[1..{_AC_MAX_LAG}] loop run inside one Arrow batch in
    numpy (row-local, no shuffle at all); the cluster cost is the scan.
    """
    import numpy as np

    docs = fan_out(load_table(spark, "documents", sf_dir))
    payloads = with_wav_payload(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                import io
                import wave

                with wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
                    raw = wf.readframes(wf.getnframes())
                x = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                r0 = int(np.dot(x, x))
                rs = [int(np.dot(x[:-lag], x[lag:])) for lag in range(1, _AC_MAX_LAG + 1)]
                best = max(range(_AC_MAX_LAG), key=lambda k: (rs[k], -k))
                rows.append(
                    (doc_id, best + 1, rs[best], r0, rs[best] * 1000000 // r0)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "best_lag", "r_best", "r0", "strength_e6"]
            ).astype(
                {"doc_id": "int64", "best_lag": "int32", "r_best": "int64",
                 "r0": "int64", "strength_e6": "int64"}
            )

    return payloads.mapInPandas(
        batches,
        schema="doc_id bigint, best_lag int, r_best bigint, r0 bigint,"
        " strength_e6 bigint",
    )


# ---------------------------------------------------------------------------
# Image average-hash (aHash) near-dup buckets — registered in round 6;
# tests/test_multimodal_ahash.py also runs the full DuckDB oracle
# comparison.
# ---------------------------------------------------------------------------

AHASH_SCHEMA = "doc_id bigint, width int, height int, ahash bigint"

IMAGE_AHASH_ORACLE = """
    WITH g AS (
      SELECT doc_id, md5(text) AS hx,
             CAST(doc_id % 8 + 2 AS INT) AS width,
             CAST((doc_id // 8) % 6 + 2 AS INT) AS height
      FROM documents
    ), px AS (
      SELECT doc_id, hx, width, height,
             unnest(generate_series(0, width * height - 1)) AS p
      FROM g
    ), gray AS (
      SELECT doc_id, width, height, p,
             (CAST('0x' || substr(hx, 2 * ((3 * p) % 16) + 1, 2) AS INT)
              + CAST('0x' || substr(hx, 2 * ((3 * p + 1) % 16) + 1, 2) AS INT)
              + CAST('0x' || substr(hx, 2 * ((3 * p + 2) % 16) + 1, 2) AS INT)
             ) // 3 AS gv
      FROM px
    ), tot AS (
      SELECT doc_id, sum(gv) AS tg, count(*) AS npix FROM gray GROUP BY doc_id
    ), bits AS (
      SELECT gray.doc_id, width, height,
             CAST(sum(CASE WHEN gv * npix > tg
                           THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
                  AS BIGINT) AS ahash
      FROM gray JOIN tot USING (doc_id)
      GROUP BY gray.doc_id, width, height
    )
    SELECT doc_id, width, height, ahash,
           CAST(count(*) OVER (PARTITION BY width, height, ahash) AS BIGINT)
             AS n_same_hash
    FROM bits
"""


@query("image_ahash_buckets", oracle=IMAGE_AHASH_ORACLE)
def image_ahash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash per image + same-hash bucket sizes — the
    image twin of dedup_simhash: images whose pixels sit on the same
    side of their own mean collapse to one 64-bit key, so near-dup
    candidate generation is a groupBy on the hash, never pixel-space
    pairwise comparison.

    The hash is computed from the REAL decoded pixel buffer (the same
    netpbm parser as multimodal_ppm_decode) with pure integer math:
    gray = (r+g+b) DIV 3, bit_p = gray_p * npix > Σgray (integer
    cross-multiplication instead of comparing against a rounded mean),
    hash = Σ 2^p over the row-major native grid (≤ 63 px → fits
    BIGINT). The DuckDB oracle recomputes the identical hash
    analytically from the md5 byte cycle — any decoder offset/stride
    bug flips bits and fails the gate.

    Scale: decode + hash is a stateless Arrow-batched map (zero
    shuffle); the bucket count is one window over (width, height,
    hash) — at 100 TB the only thing that shuffles is a 64-bit key per
    image.
    """
    import numpy as np

    docs = fan_out(load_table(spark, "documents", sf_dir))
    payloads = with_ppm_payload(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def ahash(b: bytes) -> tuple[int, int, int]:
            if not b.startswith(b"P6\n"):
                raise ValueError("not a P6 PPM payload")
            dims, rest = b[3:].split(b"\n", 1)
            width, height = (int(x) for x in dims.split())
            _, rest = rest.split(b"\n", 1)
            px = np.frombuffer(rest, dtype=np.uint8).reshape(height, width, 3)
            gray = px.astype(np.int64).sum(axis=2) // 3
            flat = gray.flatten()  # row-major == payload byte order
            npix = flat.size
            tg = int(flat.sum())
            h = 0
            for p, gv in enumerate(flat):
                if int(gv) * npix > tg:
                    h |= 1 << p
            return width, height, h

        for pdf in it:
            decoded = pdf["payload"].map(lambda b: ahash(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": decoded.map(lambda t: t[0]).astype("int32"),
                    "height": decoded.map(lambda t: t[1]).astype("int32"),
                    "ahash": decoded.map(lambda t: t[2]).astype("int64"),
                }
            )

    hashed = payloads.mapInPandas(batches, schema=AHASH_SCHEMA)
    from pyspark.sql.window import Window as W

    return hashed.select(
        "doc_id",
        "width",
        "height",
        "ahash",
        F.count("*")
        .over(W.partitionBy("width", "height", "ahash"))
        .cast("bigint")
        .alias("n_same_hash"),
    )


# ---------------------------------------------------------------------------
# Energy-based voice-activity segmentation (VAD) — round 6.
# ---------------------------------------------------------------------------

_VAD_ORACLE = f"""
    WITH g AS (
      SELECT doc_id, md5(text) AS hx FROM documents
    ), idx AS (
      SELECT doc_id, hx, unnest(generate_series(0, {WAV_N_SAMPLES - 1})) AS i
      FROM g
    ), vals AS (
      SELECT doc_id, i,
             CAST('0x' || substr(hx, 2 * ((2 * i) % 16) + 1, 2) AS INT)
             + 256 * CAST('0x' || substr(hx, 2 * ((2 * i + 1) % 16) + 1, 2)
                          AS INT) AS u
      FROM idx
    ), pcm AS (
      SELECT doc_id, i,
             CAST(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS BIGINT) AS v
      FROM vals
    ), frames AS (
      SELECT doc_id, i // {_AUDIO_FRAME} AS frame_id, sum(v * v) AS energy
      FROM pcm GROUP BY doc_id, i // {_AUDIO_FRAME}
    ), tot AS (
      SELECT doc_id, sum(energy) AS total FROM frames GROUP BY doc_id
    ), flags AS (
      SELECT frames.doc_id, frame_id,
             CASE WHEN energy * {WAV_N_SAMPLES // _AUDIO_FRAME} > total
                  THEN 1 ELSE 0 END AS act
      FROM frames JOIN tot ON frames.doc_id = tot.doc_id
    ), runs AS (
      SELECT doc_id, frame_id, act,
             act - COALESCE(lag(act) OVER (PARTITION BY doc_id
                                           ORDER BY frame_id), 0) AS rise
      FROM flags
    )
    SELECT doc_id,
           CAST({WAV_N_SAMPLES // _AUDIO_FRAME} AS INT) AS n_frames,
           CAST(sum(act) AS INT) AS n_active,
           CAST(sum(CASE WHEN rise = 1 THEN 1 ELSE 0 END) AS INT)
             AS n_segments
    FROM runs GROUP BY doc_id
"""


@query("multimodal_audio_vad", oracle=_VAD_ORACLE)
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-threshold voice-activity segmentation over the decoded
    WAV corpus: a frame is ACTIVE when its energy exceeds the clip's
    mean frame energy (integer cross-multiplication energy·n_frames >
    total — no division), and activity runs collapse into segments —
    the silence-trimming / speech-region primitive an audio curation
    pipeline runs before transcription or framing.

    Builds on the same real stdlib-wave decode as
    multimodal_audio_frames; the frame energies, threshold, and
    run-length segmentation all happen row-locally in one numpy pass
    per Arrow batch (no shuffle — cluster cost is the scan), and the
    DuckDB oracle re-derives the identical segmentation analytically
    from the md5 byte cycle with a per-doc 4-frame lag window.
    """
    import numpy as np

    n_frames = WAV_N_SAMPLES // _AUDIO_FRAME
    docs = fan_out(load_table(spark, "documents", sf_dir))
    payloads = with_wav_payload(docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                import io
                import wave

                with wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
                    raw = wf.readframes(wf.getnframes())
                v = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                frames = v.reshape(n_frames, _AUDIO_FRAME)
                energy = (frames * frames).sum(axis=1)
                total = int(energy.sum())
                act = (energy * n_frames > total).astype(np.int64)
                rises = int(act[0]) + int(((act[1:] == 1) & (act[:-1] == 0)).sum())
                rows.append((doc_id, n_frames, int(act.sum()), rises))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "n_active", "n_segments"]
            ).astype(
                {
                    "doc_id": "int64",
                    "n_frames": "int32",
                    "n_active": "int32",
                    "n_segments": "int32",
                }
            )

    return payloads.mapInPandas(
        batches,
        schema="doc_id bigint, n_frames int, n_active int, n_segments int",
    )
