"""Real GIF codec (operators/media.py): LZW spec references, round trips
across stream variants, reject totality, and the registry entry vs its
DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.operators.media import (
    _gif_interlace_order,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from tests.conftest import SF_SMALL


class TestLZWSpec:
    def test_hand_built_stream(self):
        """Codes packed by hand, LSB-first, mcs=2 (clear=4, end=5,
        first dict entry=6): stream [clear, 1, 2, 6, end] with 3-bit
        codes then 4-bit after the table reaches 8 entries.

        After emitting 1 then 2 the table holds {.., 6:(1,2)}; code 6
        decodes to (1, 2) and adds 7:(2, 1). Table is then 8 entries ->
        code size bumps to 4 for the end code."""
        bits = []

        def emit(code, size):
            bits.extend((code >> b) & 1 for b in range(size))

        emit(4, 3)  # clear
        emit(1, 3)
        emit(2, 3)  # adds 6:(1,2)
        emit(6, 3)  # adds 7:(2,1); table now 8 -> size 4
        emit(5, 4)  # end
        data = bytes(
            sum(b << j for j, b in enumerate(bits[i : i + 8]))
            for i in range(0, len(bits), 8)
        )
        out = _lzw_decode(data, 2, 4)
        assert out.tolist() == [1, 2, 1, 2]

    def test_cscsc_case(self):
        """code == next-dict-entry: [clear, 0, 5, end] at mcs=2 — code 5
        is the entry being defined (prev=(0,) -> entry (0, 0))."""
        bits = []

        def emit(code, size):
            bits.extend((code >> b) & 1 for b in range(size))

        emit(4, 3)
        emit(0, 3)
        emit(6, 3)  # next_code is 6: cScSc -> (0, 0)
        emit(5, 3)
        data = bytes(
            sum(b << j for j, b in enumerate(bits[i : i + 8]))
            for i in range(0, len(bits), 8)
        )
        assert _lzw_decode(data, 2, 3).tolist() == [0, 0, 0]

    def test_out_of_range_code_rejected(self):
        bits = []

        def emit(code, size):
            bits.extend((code >> b) & 1 for b in range(size))

        emit(4, 3)
        emit(7, 3)  # beyond next_code with empty prev chain
        data = bytes(
            sum(b << j for j, b in enumerate(bits[i : i + 8]))
            for i in range(0, len(bits), 8)
        )
        assert _lzw_decode(data, 2, 1) is None

    def test_encoder_decoder_inverse_with_table_overflow(self):
        """Long low-entropy sequence forces code growth toward the 12-bit
        cap and a mid-stream table clear."""
        rng = np.random.default_rng(3)
        seq = rng.integers(0, 4, 20000).astype(np.uint8)
        data = _lzw_encode(seq, 2, uncompressed=False)
        out = _lzw_decode(data, 2, len(seq))
        assert out is not None and np.array_equal(out, seq)


class TestInterlace:
    def test_order_is_the_spec_4_pass(self):
        assert _gif_interlace_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]

    def test_interlaced_equals_progressive(self):
        rng = np.random.default_rng(5)
        pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
        idx = rng.integers(0, 8, (11, 6)).astype(np.uint8)
        a = decode_gif(encode_gif(idx, pal, interlace=False))
        b = decode_gif(encode_gif(idx, pal, interlace=True))
        assert np.array_equal(a, b) and np.array_equal(a, pal[idx])


class TestRoundTrip:
    @pytest.mark.parametrize("psize", [2, 3, 4, 16, 200, 256])
    def test_palette_sizes(self, psize):
        rng = np.random.default_rng(psize)
        pal = rng.integers(0, 256, (psize, 3)).astype(np.uint8)
        idx = rng.integers(0, psize, (9, 7)).astype(np.uint8)
        out = decode_gif(encode_gif(idx, pal))
        assert np.array_equal(out, pal[idx])

    def test_uniform_image_triggers_cscsc(self):
        pal = np.array([[9, 8, 7], [1, 2, 3]], np.uint8)
        idx = np.zeros((12, 12), np.uint8)
        assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])

    def test_gif87a_accepted(self):
        pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
        idx = np.eye(4, dtype=np.uint8)
        data = b"GIF87a" + encode_gif(idx, pal)[6:]
        assert np.array_equal(decode_gif(data), pal[idx])


class TestRejects:
    def _gif(self, **kw):
        pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
        return encode_gif(np.zeros((5, 5), np.uint8), pal, **kw)

    def test_bad_magic(self):
        data = bytearray(self._gif())
        data[0] ^= 1
        assert decode_gif(bytes(data)) is None

    def test_truncated_stream(self):
        assert decode_gif(self._gif(truncate=True)) is None

    def test_trailer_without_frame(self):
        import struct as st

        data = b"GIF89a" + st.pack("<HHBBB", 5, 5, 0x80, 0, 0)
        data += bytes(6) + b"\x3b"  # 2-entry GCT then trailer
        assert decode_gif(data) is None

    def test_no_color_table_anywhere(self):
        data = bytearray(self._gif())
        data[10] &= 0x7F  # clear the GCT flag, leave its bytes in place
        assert decode_gif(bytes(data)) is None

    def test_none_and_garbage(self):
        assert decode_gif(None) is None
        assert decode_gif(b"GIF89a123") is None


def test_registry_entry_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as em

    got = em.queries()["mm_decode_gif"](spark, SF_SMALL)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_SMALL}/documents.parquet'"
    )
    want = con.sql(em.oracle_sql()["mm_decode_gif"])
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.fetchall()))
    assert g == w
    oks = [row[1] for row in g]
    assert any(oks) and not all(oks)  # both families present
