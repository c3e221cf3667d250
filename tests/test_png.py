"""Real PNG codec (operators/media.py): spec-reference unfiltering,
round trips over every color type and filter, reject-path totality, and
the registry entry vs its DuckDB oracle."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ocr_spark.operators.media import (
    _PNG_SIG,
    _png_chunk,
    decode_png,
    encode_png,
)
from tests.conftest import SF_SMALL


def _hand_png(w, h, color, depth=8, interlace=0, rows=None):
    """Build a PNG by hand (independent of encode_png): ``rows`` is the
    raw scanline byte list [(filter_type, filtered_bytes), ...]."""
    raw = b"".join(bytes([t]) + bytes(fb) for t, fb in rows)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


class TestSpecReference:
    """Filtered bytes written by hand from the PNG spec; decode_png must
    produce the recon values derived by hand — the decoder is checked
    against the spec, not against encode_png."""

    def test_none_and_sub(self):
        # grey 3x2: row0 None = [10, 20, 30]; row1 Sub with filt
        # [5, 250, 7] -> recon [5, (250+5)%256=255, (7+255)%256=6]
        data = _hand_png(3, 2, 0, rows=[(0, [10, 20, 30]), (1, [5, 250, 7])])
        px = decode_png(data)
        assert px.shape == (2, 3, 1)
        assert px[:, :, 0].tolist() == [[10, 20, 30], [5, 255, 6]]

    def test_up_and_average(self):
        # row0 None = [100, 200]; row1 Up filt [60, 70] -> [160, (270)%256=14]
        # row2 Average filt [3, 9]:
        #   i0: left=0, up=160 -> 3 + 80 = 83
        #   i1: left=83, up=14 -> 9 + (83+14)//2 = 9 + 48 = 57
        data = _hand_png(
            2, 3, 0, rows=[(0, [100, 200]), (2, [60, 70]), (3, [3, 9])]
        )
        px = decode_png(data)
        assert px[:, :, 0].tolist() == [[100, 200], [160, 14], [83, 57]]

    def test_paeth_tiebreak_order(self):
        # row0 None = [50, 90]; row1 Paeth filt [10, 20]:
        #   i0: a=0, b=50, c=0 -> p=50: pa=50, pb=0, pc=50 -> b=50; 10+50=60
        #   i1: a=60, b=90, c=50 -> p=100: pa=40, pb=10, pc=50 -> b=90;
        #       20+90=110
        data = _hand_png(2, 2, 0, rows=[(0, [50, 90]), (4, [10, 20])])
        px = decode_png(data)
        assert px[:, :, 0].tolist() == [[50, 90], [60, 110]]

    def test_paeth_prefers_a_on_tie(self):
        # row0 None [8, 8]; row1 Paeth filt [0, 0]:
        #   i0: a=0,b=8,c=0 -> p=8: pa=8,pb=0,pc=8 -> b -> 8
        #   i1: a=8,b=8,c=8 -> p=8: all ties -> a wins -> 8
        data = _hand_png(2, 2, 0, rows=[(0, [8, 8]), (4, [0, 0])])
        assert decode_png(data)[:, :, 0].tolist() == [[8, 8], [8, 8]]

    def test_rgb_bpp_is_three(self):
        # RGB 2x2, row1 Sub: left-neighbor distance is 3 BYTES (one pixel)
        data = _hand_png(
            2, 2, 2,
            rows=[(0, [1, 2, 3, 4, 5, 6]), (1, [10, 10, 10, 1, 1, 1])],
        )
        px = decode_png(data)
        assert px[1].reshape(-1).tolist() == [10, 10, 10, 11, 11, 11]


class TestRoundTrip:
    @pytest.mark.parametrize("ctype,ch", [(0, 1), (2, 3), (6, 4)])
    def test_all_color_types_all_filters(self, ctype, ch):
        rng = np.random.default_rng(ctype)
        px = rng.integers(0, 256, size=(7, 5, ch), dtype=np.uint8)
        out = decode_png(encode_png(px, ctype))  # 7 rows -> filters 0..4,0,1
        assert out is not None and np.array_equal(out, px)

    def test_single_idat_variant(self):
        px = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
        out = decode_png(encode_png(px, 2, split_idat=False))
        assert np.array_equal(out, px)


class TestRejects:
    def _px(self):
        return np.full((3, 3, 3), 7, dtype=np.uint8)

    def test_bad_signature(self):
        data = bytearray(encode_png(self._px(), 2))
        data[0] ^= 1
        assert decode_png(bytes(data)) is None

    def test_corrupt_crc(self):
        assert decode_png(encode_png(self._px(), 2, corrupt_crc=True)) is None

    def test_interlace_rejected(self):
        assert decode_png(encode_png(self._px(), 2, interlace=1)) is None

    def test_truncated(self):
        data = encode_png(self._px(), 2)
        assert decode_png(data[: len(data) - 20]) is None

    def test_unknown_filter_byte(self):
        data = _hand_png(2, 1, 0, rows=[(7, [1, 2])])
        assert decode_png(data) is None

    def test_raster_length_mismatch(self):
        # one row too many in the zlib stream
        data = _hand_png(2, 1, 0, rows=[(0, [1, 2]), (0, [3, 4])])
        assert decode_png(data) is None

    def test_palette_and_16bit_rejected(self):
        data = _hand_png(2, 1, 3, rows=[(0, [0, 1])])
        assert decode_png(data) is None
        data = _hand_png(1, 1, 0, depth=16, rows=[(0, [0, 1])])
        assert decode_png(data) is None

    def test_none_and_garbage(self):
        assert decode_png(None) is None
        assert decode_png(b"\x89PNG\r\n\x1a\n not chunks") is None


def test_registry_entry_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as em

    got = em.queries()["mm_decode_png"](spark, SF_SMALL)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_SMALL}/documents.parquet'"
    )
    want = con.sql(em.oracle_sql()["mm_decode_png"])
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.fetchall()))
    assert g == w
    # both reject families present and false
    oks = {row[0]: row[1] for row in g}
    assert oks[0] is False or oks[0] == False  # noqa: E712  (0 % 17 == 0)
    assert any(not v for v in oks.values()) and any(v for v in oks.values())
