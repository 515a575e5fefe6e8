"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, mapInPandas signatures.  The codec layer is per-format:

- WAV audio (RIFF/PCM): REAL decode, stdlib-only (`_wav_decode_stdlib`,
  r5) — exercised on genuine bytes in pytest; soundfile takes precedence
  when installed (covers non-PCM encodings too).
- PNG/JPEG: real decode via PIL when importable on the worker; a
  clearly-marked NotImplementedError otherwise (this sandbox ships no
  image codec).
- The deterministic FAKE format drives plan/shape tests at any scale.

Swapping codecs never changes the Spark plan, schema, partitioning, or
Arrow batch shape.

Pattern: binary payloads ride an opaque ``binary`` column; per-batch work is
``mapInPandas`` (Arrow-vectorized, no per-row Python), metadata extraction
stays in JVM built-ins wherever the format allows.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimic_spark.operators.catalog import load_tables, register

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, width int, height int"
)


def synthesize_media(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic fake media table: binary payloads derived from documents.

    Payload layout (little-endian): magic 4s | width i32 | height i32 |
    body bytes.  Stands in for real image bytes; the header parse below is a
    real binary decode exercised through the full Arrow path.
    """
    (d,) = load_tables(spark, sf, "documents")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = (pdf["doc_id"] % 640 + 16).astype("int32")
            h = (pdf["doc_id"] % 480 + 16).astype("int32")
            payloads = [
                struct.pack("<4sii", b"FAKE", int(wi), int(hi))
                + t.encode("utf-8")[:64]
                for wi, hi, t in zip(w, h, pdf["text"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [
                        "image" if i % 3 else "audio" for i in pdf["doc_id"]
                    ],
                    "payload": payloads,
                    "width": w,
                    "height": h,
                }
            )

    return d.select("doc_id", "text").mapInPandas(encode, schema=MEDIA_SCHEMA)


def _codec_modules():
    """Try-import real codec libraries ONCE per executor worker process.

    Returns (PIL.Image module or None, soundfile module or None).  Cached in
    a module global so the import cost is paid once per Python worker, not
    per Arrow batch."""
    global _CODECS
    try:
        return _CODECS
    except NameError:
        pass
    try:
        from PIL import Image as _img  # noqa: PLC0415
    except ImportError:
        _img = None
    try:
        import soundfile as _snd  # noqa: PLC0415
    except ImportError:
        _snd = None
    _CODECS = (_img, _snd)
    return _CODECS


def _decode_one(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode a single payload to (width, height, features).

    Runtime decoder selection: real image/audio formats go to PIL/soundfile
    when those libraries exist on the worker; the deterministic FAKE format
    (and real formats on codec-less workers like this sandbox) go to the
    stub path.  Same output contract either way — the Spark plan, schema,
    partitioning and Arrow batch shape never change."""
    magic4 = bytes(payload[:4])
    if magic4 == b"FAKE":
        _, w, h = struct.unpack_from("<4sii", payload)
        body = payload[12:]
        s = sum(body) or 1
        feats = [
            round(len(body) / 64.0, 6),
            round(s / (255.0 * max(len(body), 1)), 6),
            round((body[0] if body else 0) / 255.0, 6),
            round((body[-1] if body else 0) / 255.0, 6),
        ]
        return w, h, feats
    img_mod, snd_mod = _codec_modules()
    if magic4 == b"\x89PNG" or magic4.startswith(b"\xff\xd8"):
        if img_mod is None:
            raise NotImplementedError(
                "real image payload but no image codec on this worker "
                "(pip install pillow); deterministic stub handles FAKE only"
            )
        import io  # noqa: PLC0415

        im = img_mod.open(io.BytesIO(bytes(payload))).convert("L")
        w, h = im.size
        px = list(im.getdata())
        mean = (sum(px) / (255.0 * len(px))) if px else 0.0
        return w, h, [
            round(len(payload) / 64.0, 6),
            round(mean, 6),
            round(px[0] / 255.0, 6) if px else 0.0,
            round(px[-1] / 255.0, 6) if px else 0.0,
        ]
    if magic4 == b"RIFF":
        if snd_mod is not None:
            import io  # noqa: PLC0415

            data, rate = snd_mod.read(io.BytesIO(bytes(payload)))
            n = int(getattr(data, "shape", [len(data)])[0])
            return n, int(rate), [
                round(n / 64.0, 6),
                round(float(abs(data).mean()), 6) if n else 0.0,
                round(float(data[0] if data.ndim == 1 else data[0][0]), 6) if n else 0.0,
                round(float(data[-1] if data.ndim == 1 else data[-1][0]), 6) if n else 0.0,
            ]
        return _wav_decode_stdlib(payload)
    raise ValueError(f"bad media magic: {magic4!r}")


def _wav_decode_stdlib(payload: bytes) -> tuple[int, int, list[float]]:
    """Real WAV (RIFF/WAVE PCM) decode with ONLY the Python stdlib — the
    codec path that actually runs in this sandbox (soundfile, when present,
    takes precedence above and also covers non-PCM encodings).

    Output contract matches the soundfile branch: (n_frames, sample_rate,
    [n/64, mean|x| over all channels, first sample of channel 0, last
    sample of channel 0]) with samples normalized to [-1, 1) using the
    same scale soundfile applies to integer PCM (2^(bits-1); 8-bit WAV is
    unsigned, offset by 128)."""
    import io
    import struct as _struct
    import wave as _wave

    with _wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        rate = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:  # PCM_U8: unsigned, midpoint 128
        samples = [(b - 128) / 128.0 for b in raw]
    elif sw == 2:
        samples = [
            v / 32768.0 for v in _struct.unpack(f"<{len(raw) // 2}h", raw)
        ]
    elif sw == 4:
        samples = [
            v / 2147483648.0
            for v in _struct.unpack(f"<{len(raw) // 4}i", raw)
        ]
    elif sw == 3:  # PCM_24: 3-byte little-endian two's complement
        samples = []
        for i in range(0, len(raw), 3):
            v = int.from_bytes(raw[i : i + 3], "little", signed=True)
            samples.append(v / 8388608.0)
    else:
        raise NotImplementedError(f"WAV sample width {sw} bytes")
    total = len(samples)
    # frame count from the DECODED data, not the header: a truncated data
    # chunk (header promises more frames than exist) must degrade to the
    # frames actually present, never to an IndexError mid-Arrow-batch
    n = total // ch if ch else 0
    return n, int(rate), [
        round(n / 64.0, 6),
        round(sum(abs(s) for s in samples) / total, 6) if total else 0.0,
        round(samples[0], 6) if total else 0.0,  # first frame, channel 0
        round(samples[(n - 1) * ch], 6) if n else 0.0,  # last frame, ch 0
    ]


def decode_media_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode: per-payload runtime decoder selection via
    ``_decode_one`` — real codecs (PIL/soundfile) when importable on the
    worker, the deterministic FAKE-format stub otherwise/always for FAKE."""
    for pdf in batches:
        widths, heights, feats = [], [], []
        for payload in pdf["payload"]:
            w, h, fv = _decode_one(payload)
            widths.append(w)
            heights.append(h)
            feats.append(fv)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "dec_width": pd.Series(widths, dtype="int32"),
                "dec_height": pd.Series(heights, dtype="int32"),
                "features": feats,
            }
        )


@register(
    "multimodal_decode_features",
    family="training-data: binary media columns -> mapInPandas decode/feature-extract (codec stubbed, plumbing real)",
    oracle=None,  # binary plumbing; shape/determinism asserted in pytest
)
def multimodal_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    media = synthesize_media(spark, sf)
    feats = media.repartition(8, "doc_id").mapInPandas(
        decode_media_stub,
        schema="doc_id long, media_type string, dec_width int, dec_height int, "
        "features array<double>",
    )
    return feats.select(
        "doc_id",
        "media_type",
        "dec_width",
        "dec_height",
        F.round(F.element_at("features", 2), 4).alias("brightness"),
    )


@register(
    "multimodal_frame_sample",
    family="training-data: frame-sampling plan over media (explode deterministic frame indices)",
    # the sampled frame indices are pure integer arithmetic on doc_id (the
    # synthetic media metadata is doc_id-derived), so the plan IS oracle-able
    # even though the payload bytes aren't: the oracle recomputes the same
    # indices without touching binary
    oracle="""
WITH m AS (
  SELECT doc_id,
         (doc_id % 640 + 16) * (doc_id % 480 + 16) % 7 + 1 AS n_frames
  FROM documents WHERE doc_id % 3 <> 0
)
SELECT doc_id,
       cast(unnest(generate_series(0, n_frames - 1)) * 10 + doc_id % 10
            AS BIGINT) AS frame_idx
FROM m
""",
)
def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video-style frame sampling: JVM-side index synthesis (sequence +
    explode); the per-frame decode would run in the same decode stub."""
    media = synthesize_media(spark, sf)
    n_frames = (F.col("width") * F.col("height") % 7 + 1).cast("int")
    return (
        media.filter(F.col("media_type") == "image")
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: i * F.lit(10) + F.pmod(F.col("doc_id"), F.lit(10)),
                )
            ).alias("frame_idx"),
        )
    )
