"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side machinery (schema, partitioning, UDF signature, batch
shape) is real and tested.  Image decode is real for PNG everywhere
(``decode_png_stdlib`` — zlib+struct, CRC-checked, fully unfiltered)
and for every format when PIL is importable; other formats without PIL
fail loudly (NotImplementedError from ``decode_image_stub``) — audio/
video decode stays stubbed, those libraries are not in this
environment.  The deterministic feature extractor stands in for the
heavier decode steps so the pipeline shape is exercised end-to-end:
payload → per-batch pandas → features, with md5/byte-length outputs
the DuckDB oracle can recompute.

At 100 TB: binary payloads stay columnar in parquet; ``mapInPandas``
streams Arrow batches (never a per-row Python crossing); feature
extraction parallelism = input partitions, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Opaque binary column + typed metadata struct — the storage shape
    for any media modality (here the payload is the utf-8 text bytes;
    for images/audio it is the encoded file bytes)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (``mapInPandas``): deterministic stand-in for decode/resize/
    frame-sample — md5 + byte stats per payload."""
    import hashlib

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "head_hex": payloads.map(lambda b: bytes(b)[:8].hex()),
                }
            )

    return media.mapInPandas(batches, MEDIA_FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("n_sampled_frames", T.IntegerType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def attach_image_metadata(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Binary payload + image-shaped metadata.  Real ingestion reads
    dimensions from the encoded file; this environment has no media
    files or decode libs, so dimensions derive deterministically from
    the id (fake-but-stable, which keeps the downstream resize math
    oracle-checkable)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.lit(64) + F.col(id_col) % 960).cast("int").alias("width"),
            (F.lit(64) + (F.col(id_col) * 7) % 540).cast("int").alias("height"),
            (F.lit(1) + F.col(id_col) % 120).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def resize_plan(
    media: DataFrame, target: int = 224, frame_stride: int = 30
) -> DataFrame:
    """Resize + frame-sample stage over binary payloads (mapInPandas).

    The geometry is integer math (w*target // max_dim) so Spark, the
    pandas batch code, and the DuckDB oracle agree exactly; the
    "thumbnail" is the decode stub's stand-in — md5 of payload bytes +
    the target geometry (a real decoder would hash resized pixels).
    Frame sampling keeps every ``frame_stride``-th frame."""
    import hashlib

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                w, h, n_frames = meta["width"], meta["height"], meta["n_frames"]
                m = max(w, h)
                nw, nh = (w, h) if m <= target else (
                    w * target // m, h * target // m
                )
                thumb = hashlib.md5(
                    bytes(payload) + f"|{nw}x{nh}".encode()
                ).hexdigest()
                rows.append(
                    (doc_id, w, h, nw, nh, (n_frames - 1) // frame_stride + 1, thumb)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "new_width", "new_height",
                    "n_sampled_frames", "thumb_md5",
                ],
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
    ]
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png_stdlib(payload: bytes) -> dict:
    """Real PNG decode in pure stdlib (zlib + struct; the PNG spec is
    public): chunk walk with CRC verification, IDAT inflate, and full
    scanline unfiltering (None/Sub/Up/Average/Paeth), for 8-bit
    non-interlaced images.  Returns width/height/mode plus the
    reconstructed raw pixel bytes so tests can assert actual pixel
    values, not just header fields; palette images (color_type 3, mode
    "P" — the PIL mode string) have their indices expanded through the
    PLTE chunk, so 'pixels' is always raw channel bytes, never palette
    indices.  Truncated or malformed chunk layouts raise ValueError.
    This is the no-dependency fallback decoder — PIL (when importable)
    is preferred: it covers every format and runs its filters in C."""
    import struct
    import zlib

    data = bytes(payload)
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, idat, plte = 8, b"", None
    width = height = bit_depth = color_type = interlace = None
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(f"truncated PNG chunk {tag!r}")
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            if length != 13:
                raise ValueError("malformed PNG IHDR chunk")
            width, height, bit_depth, color_type, _c, _f, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_MODES:
        raise ValueError(
            f"stdlib PNG path handles 8-bit non-interlaced only "
            f"(bit_depth={bit_depth}, interlace={interlace}, "
            f"color_type={color_type})"
        )
    bpp = _PNG_CHANNELS[color_type]
    stride = width * bpp
    raw = zlib.decompress(idat)
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    out, prev, p = bytearray(), bytearray(stride), 0
    for _y in range(height):
        filt = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if filt == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif filt == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pr = a + b - c
                pa, pb, pc = abs(pr - a), abs(pr - b), abs(pr - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif filt != 0:
            raise ValueError(f"bad PNG filter type {filt}")
        out += line
        prev = line
    if color_type == 3:
        # palette image: expand indices through PLTE so 'pixels' is raw
        # RGB bytes (the docstring contract), never bare indices
        if plte is None or len(plte) % 3 != 0 or not plte:
            raise ValueError("palette PNG missing or malformed PLTE chunk")
        n_entries = len(plte) // 3
        if any(i >= n_entries for i in out):
            raise ValueError("PNG palette index out of range")
        out = bytearray(
            b"".join(plte[3 * i : 3 * i + 3] for i in out)
        )
    return {
        "width": width,
        "height": height,
        "mode": _PNG_MODES[color_type],
        "pixels": bytes(out),
    }


def decode_image_stub(payload: bytes) -> dict:
    """Per-image decode: PIL when importable (every format, C-speed
    filters), else a REAL stdlib PNG decode (``decode_png_stdlib`` —
    CRC-checked, inflated, unfiltered), else NotImplementedError.  The
    loud-fail branch now covers only non-PNG formats in PIL-less
    environments — a decode pipeline must fail loudly there, never emit
    fake geometry."""
    try:
        from PIL import Image
    except ImportError as exc:
        if bytes(payload).startswith(_PNG_MAGIC):
            d = decode_png_stdlib(payload)
            return {k: d[k] for k in ("width", "height", "mode")}
        raise NotImplementedError(
            "non-PNG image decode requires PIL; this environment stubs it"
        ) from exc
    import io

    with Image.open(io.BytesIO(bytes(payload))) as img:
        return {"width": img.width, "height": img.height, "mode": img.mode}


def decode_images(media: DataFrame) -> DataFrame:
    """Arrow-batched image decode over (doc_id, payload) rows — the
    same mapInPandas shape as ``extract_media_features``, but calling
    the real decoder (PIL, or the stdlib PNG path).  Raises
    NotImplementedError AT EXECUTORS for non-PNG payloads when PIL is
    absent: a decode pipeline must fail loudly, not emit fake pixel
    geometry.  Scale shape: parallelism = input partitions, zero
    shuffle, payload bytes never leave their partition."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_image_stub(payload)
                rows.append((doc_id, d["width"], d["height"], d["mode"]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mode"]
            )

    return media.select("doc_id", "payload").mapInPandas(
        batches, DECODE_SCHEMA
    )
