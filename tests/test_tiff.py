"""Baseline TIFF codec: byte-order axis, strip assembly, rejects, oracle."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators.media import (
    decode_image_any,
    decode_tiff,
    encode_tiff,
)
from tests.conftest import SF_SMALL


class TestRoundTrip:
    @pytest.mark.parametrize("big_endian", [False, True])
    @pytest.mark.parametrize("ch", [1, 3])
    @pytest.mark.parametrize("rps", [1, 3, 100])
    def test_orders_channels_strips(self, big_endian, ch, rps):
        rng = np.random.default_rng(ch * 10 + rps)
        px = rng.integers(0, 256, (9, 7, ch)).astype(np.uint8)
        out = decode_tiff(
            encode_tiff(px, big_endian=big_endian, rows_per_strip=rps)
        )
        assert out is not None and np.array_equal(out, px)

    def test_both_orders_decode_identically(self):
        px = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
        a = decode_tiff(encode_tiff(px, big_endian=False))
        b = decode_tiff(encode_tiff(px, big_endian=True))
        assert np.array_equal(a, b) and np.array_equal(a, px)

    def test_short_last_strip(self):
        # h=5, rps=4 -> strips of 4 and 1 rows
        px = np.full((5, 3, 1), 9, np.uint8)
        assert np.array_equal(
            decode_tiff(encode_tiff(px, rows_per_strip=4)), px
        )


class TestRejects:
    def _px(self):
        return np.full((6, 6, 3), 3, np.uint8)

    def test_bad_magic_and_order(self):
        data = bytearray(encode_tiff(self._px()))
        data[2] ^= 1  # magic != 42
        assert decode_tiff(bytes(data)) is None
        assert decode_tiff(b"XX" + bytes(data[2:])) is None

    def test_truncated_strip(self):
        assert decode_tiff(encode_tiff(self._px(), truncate=True)) is None

    def test_compressed_rejected(self):
        data = bytearray(encode_tiff(self._px()))
        # Compression entry is the 4th (tag 259); value at entry+8
        ifd = 8 + 2
        for i in range(10):
            pos = ifd + i * 12
            import struct as st

            tag = st.unpack_from("<H", data, pos)[0]
            if tag == 259:
                data[pos + 8] = 5  # LZW
        assert decode_tiff(bytes(data)) is None

    def test_garbage_totality(self):
        assert decode_tiff(None) is None
        assert decode_tiff(b"II*\x00" + b"\xff" * 40) is None
        assert decode_tiff(b"MM\x00*" + b"\x00" * 3) is None

    def test_sniffer_routes_tiff(self):
        px = np.full((3, 3, 3), 5, np.uint8)
        for be in (False, True):
            got = decode_image_any(encode_tiff(px, big_endian=be))
            assert got is not None and got[0] == "tiff"


def test_registry_entry_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as em

    got = em.queries()["mm_decode_tiff"](spark, SF_SMALL)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_SMALL}/documents.parquet'"
    )
    want = con.sql(em.oracle_sql()["mm_decode_tiff"])
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.fetchall()))
    assert g == w
    oks = [row[1] for row in g]
    assert any(oks) and not all(oks)
