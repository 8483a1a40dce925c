"""Image decode branch (multimodal.media.decode_images): REAL decode
through the Arrow mapInPandas plumbing wherever PIL exists, loud
NotImplementedError where it doesn't.  The PNG fixture is generated in
pure Python (zlib + struct — the PNG spec is public), so the live
branch needs no checked-in binary and no image library to BUILD the
input, only to decode it."""

from __future__ import annotations

import struct
import zlib

import pytest

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.multimodal.media import (
    decode_image_stub,
    decode_images,
)


def make_png(width: int, height: int) -> bytes:
    """Minimal valid RGBA PNG: IHDR + one zlib IDAT + IEND."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    # each scanline: filter byte 0, then width RGBA pixels
    rows = []
    for y in range(height):
        row = b"\x00"
        for x in range(width):
            row += bytes((x % 256, y % 256, (x * y) % 256, 255))
        rows.append(row)
    raw = b"".join(rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_fixture_is_wellformed():
    png = make_png(4, 3)
    assert png.startswith(b"\x89PNG\r\n\x1a\n")
    assert b"IHDR" in png and b"IDAT" in png and png.endswith(b"IEND\xaeB`\x82")


def test_decode_stub_raises_loudly_without_pil():
    pytest.importorskip("PIL", reason="covered by the live-branch test")
    # unreachable when PIL exists; the live test below takes over


def test_decode_stub_error_branch():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — error branch not reachable here")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="requires PIL"):
        decode_image_stub(make_png(4, 3))


def test_decode_images_live_branch(spark):
    """Where PIL exists: real decode of generated PNGs through the same
    mapInPandas path, geometry asserted exactly."""
    pytest.importorskip("PIL")
    media = spark.createDataFrame(
        [(1, make_png(4, 3)), (2, make_png(7, 2))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in decode_images(media).collect()}
    assert (got[1].width, got[1].height) == (4, 3)
    assert (got[2].width, got[2].height) == (7, 2)
    assert got[1].mode == "RGBA"


def test_decode_images_plumbing_fails_loudly_without_pil(spark):
    """Without PIL the SAME plumbing must surface NotImplementedError
    from the executors — never fake geometry."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — loud-failure branch not reachable")
    except ImportError:
        pass
    media = spark.createDataFrame(
        [(1, make_png(4, 3))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|requires PIL"):
        decode_images(media).collect()
