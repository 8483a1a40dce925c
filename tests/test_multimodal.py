"""Image decode branch (multimodal.media.decode_images): REAL decode
through the Arrow mapInPandas plumbing in every environment — PIL when
importable, the stdlib zlib+struct PNG decoder otherwise — and loud
NotImplementedError for non-PNG payloads without PIL.  The PNG fixtures
are generated in pure Python (the PNG spec is public), including
scanlines encoded with every filter type, so the decoder's unfiltering
is asserted pixel-exactly with no checked-in binaries and no image
library anywhere in the loop."""

from __future__ import annotations

import struct
import zlib

import pytest

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.multimodal.media import (
    decode_image_stub,
    decode_images,
    decode_png_stdlib,
)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _pixel(x: int, y: int) -> bytes:
    return bytes((x % 256, y % 256, (x * y) % 256, 255))


def make_png(width: int, height: int, filters: list[int] | None = None) -> bytes:
    """Valid RGBA PNG; ``filters`` gives the per-scanline filter type
    (default all-0/None).  Filtering is applied forward per the spec, so
    a correct decoder must unfilter to recover ``_pixel`` values."""
    bpp = 4
    stride = width * bpp
    prev = bytearray(stride)
    enc_rows = []
    for y in range(height):
        raw = bytearray()
        for x in range(width):
            raw += _pixel(x, y)
        f = filters[y % len(filters)] if filters else 0
        line = bytearray(raw)
        if f == 1:  # Sub
            for i in range(stride - 1, bpp - 1, -1):
                line[i] = (raw[i] - raw[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (raw[i] - prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = raw[i - bpp] if i >= bpp else 0
                line[i] = (raw[i] - (a + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = raw[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (raw[i] - pred) & 0xFF
        enc_rows.append(bytes((f,)) + bytes(line))
        prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(enc_rows)))
        + _chunk(b"IEND", b"")
    )


def test_png_fixture_is_wellformed():
    png = make_png(4, 3)
    assert png.startswith(b"\x89PNG\r\n\x1a\n")
    assert b"IHDR" in png and b"IDAT" in png and png.endswith(b"IEND\xaeB`\x82")


def test_stdlib_decode_pixel_exact_unfiltered():
    d = decode_png_stdlib(make_png(5, 4))
    assert (d["width"], d["height"], d["mode"]) == (5, 4, "RGBA")
    px = d["pixels"]
    assert len(px) == 5 * 4 * 4
    for y in range(4):
        for x in range(5):
            o = (y * 5 + x) * 4
            assert px[o : o + 4] == _pixel(x, y), (x, y)


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_stdlib_decode_unfilters_every_filter_type(filters):
    """Scanlines encoded with Sub/Up/Average/Paeth must unfilter back to
    the exact same pixels as the unfiltered encoding."""
    d = decode_png_stdlib(make_png(6, 5, filters=filters))
    assert d["pixels"] == decode_png_stdlib(make_png(6, 5))["pixels"]


def test_stdlib_decode_rejects_corrupt_crc():
    png = bytearray(make_png(4, 3))
    png[40] ^= 0xFF  # flip a byte inside IDAT without fixing its CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png_stdlib(bytes(png))


def test_decode_stub_real_for_png_everywhere():
    """decode_image_stub decodes PNG with or without PIL — geometry from
    actual decode, identical either way."""
    d = decode_image_stub(make_png(7, 2))
    assert (d["width"], d["height"], d["mode"]) == (7, 2, "RGBA")


def test_decode_stub_loud_for_non_png_without_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — non-PNG decode succeeds, branch unreachable")
    except ImportError:
        pass
    fake_jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    with pytest.raises(NotImplementedError, match="requires PIL"):
        decode_image_stub(fake_jpeg)


def test_decode_images_live_branch(spark):
    """Real decode of generated PNGs through the mapInPandas path,
    geometry asserted exactly — runs in EVERY environment now (stdlib
    PNG fallback), not just where PIL exists."""
    media = spark.createDataFrame(
        [(1, make_png(4, 3)), (2, make_png(7, 2, filters=[4]))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in decode_images(media).collect()}
    assert (got[1].width, got[1].height) == (4, 3)
    assert (got[2].width, got[2].height) == (7, 2)
    assert got[1].mode == "RGBA"


def test_decode_images_plumbing_fails_loudly_for_non_png(spark):
    """Without PIL the SAME plumbing must surface NotImplementedError
    from the executors for undecodable formats — never fake geometry."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — loud-failure branch not reachable")
    except ImportError:
        pass
    media = spark.createDataFrame(
        [(1, b"\xff\xd8\xff\xe0" + b"\x00" * 32)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|requires PIL"):
        decode_images(media).collect()


def make_palette_png(width: int, height: int, n_colors: int = 4) -> bytes:
    """Valid color_type-3 (palette) PNG: index i at (x, y) cycles over
    the PLTE; pixel bytes after a correct decode are the RGB triples."""
    plte = b"".join(
        bytes((c * 10 % 256, c * 20 % 256, c * 30 % 256))
        for c in range(n_colors)
    )
    rows = b"".join(
        b"\x00" + bytes((x + y) % n_colors for x in range(width))
        for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(rows))
        + _chunk(b"IEND", b"")
    )


def test_stdlib_decode_expands_palette_to_rgb():
    """color_type 3 'pixels' are PLTE-expanded RGB bytes, never bare
    palette indices (the docstring contract)."""
    d = decode_png_stdlib(make_palette_png(4, 3))
    assert (d["width"], d["height"], d["mode"]) == (4, 3, "P")
    px = d["pixels"]
    assert len(px) == 4 * 3 * 3
    for y in range(3):
        for x in range(4):
            c = (x + y) % 4
            o = (y * 4 + x) * 3
            assert px[o : o + 3] == bytes(
                (c * 10 % 256, c * 20 % 256, c * 30 % 256)
            ), (x, y)


def test_stdlib_decode_palette_missing_plte_is_valueerror():
    png = make_palette_png(4, 3)
    # excise the PLTE chunk (12-byte framing + 12-byte body)
    i = png.index(b"PLTE") - 4
    ln = struct.unpack(">I", png[i : i + 4])[0]
    with pytest.raises(ValueError, match="PLTE"):
        decode_png_stdlib(png[:i] + png[i + 12 + ln :])


def test_stdlib_decode_truncated_chunk_is_valueerror():
    """A chunk whose declared length runs past the payload must raise
    ValueError, not struct.error."""
    png = bytearray(make_png(4, 3))
    i = bytes(png).index(b"IDAT") - 4
    png[i : i + 4] = struct.pack(">I", 1 << 20)  # absurd declared length
    with pytest.raises(ValueError, match="truncated"):
        decode_png_stdlib(bytes(png))
