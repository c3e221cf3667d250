"""Baseline JPEG codec: exact DC-only roundtrips, entropy machinery,
restart/stuffing/AC paths, rejects, oracle mirror."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from ocr_spark.operators.jpeg import (
    _AC_BITS,
    _AC_VALS,
    _BitWriter,
    _huff_codes,
    _DC_LUMA_BITS,
    _DC_VALS,
    decode_jpeg,
    encode_jpeg_blocks,
)


def _grid(bh, bw, seed=0):
    bi = np.arange(bh, dtype=np.int64)[:, None]
    bj = np.arange(bw, dtype=np.int64)[None, :]
    return 64 + (seed * 37 + bi * 29 + bj * 13) % 128


def _expand(bv, h=None, w=None):
    full = np.repeat(np.repeat(bv, 8, 0), 8, 1)
    return full[: h or full.shape[0], : w or full.shape[1]]


class TestRoundTrip:
    @pytest.mark.parametrize("seed", [0, 1, 5, 11])
    def test_gray_exact(self, seed):
        bv = _grid(3, 4, seed)
        px = decode_jpeg(encode_jpeg_blocks(bv, color=False))
        assert np.array_equal(px[:, :, 0], _expand(bv))

    @pytest.mark.parametrize("w,h", [(17, 9), (24, 16), (32, 20), (23, 15)])
    def test_cropped_dims_color(self, w, h):
        """Every right/bottom partial-MCU shape decodes and crops
        exactly (4:2:0 pads the block grid to even)."""
        bv = _grid(-(-h // 8), -(-w // 8), w + h)
        px = decode_jpeg(
            encode_jpeg_blocks(bv, color=True, width=w, height=h)
        )
        assert px.shape == (h, w, 3)
        want = _expand(bv, h, w)
        for ch in range(3):
            assert np.array_equal(px[:, :, ch], want)

    @pytest.mark.parametrize("ri", [1, 2, 3, 7])
    def test_restart_intervals(self, ri):
        """RST markers byte-align, cycle m 0..7, and reset DC preds."""
        bv = _grid(4, 5, ri)
        data = encode_jpeg_blocks(bv, color=False, restart_interval=ri)
        n_rst = (bv.size - 1) // ri
        found = sum(
            data.count(bytes([0xFF, 0xD0 + m])) for m in range(8)
        )
        assert found >= n_rst  # at least every boundary marker present
        assert np.array_equal(
            decode_jpeg(data)[:, :, 0], _expand(bv)
        )

    def test_dc_prediction_chain(self):
        """Monotone blocks give nonzero diffs every block — a broken
        predictor shifts every later block."""
        bv = np.arange(64, 64 + 24, dtype=np.int64).reshape(4, 6)
        px = decode_jpeg(encode_jpeg_blocks(bv, color=False))
        assert np.array_equal(px[:, :, 0], _expand(bv))

    def test_byte_stuffing_roundtrip(self):
        """This pinned block matrix provably emits a stuffed FF 00 in
        its entropy segment (found by search, asserted below); the exact
        roundtrip then proves the decoder unstuffs it."""
        bv = np.array(
            [[242, 165, 75, 181], [166, 8, 0, 255]], dtype=np.int64
        )
        data = encode_jpeg_blocks(bv, color=False)
        sos = data.find(b"\xff\xda")
        assert b"\xff\x00" in data[sos + 20 :]
        px = decode_jpeg(data)
        assert np.array_equal(px[:, :, 0], _expand(bv))


class TestACPath:
    def test_single_ac_coefficient(self):
        """Hand-write an entropy stream with one AC coefficient so the
        run-length/extend/zigzag/dequant path is exercised; compare to an
        independently computed IDCT."""
        base = encode_jpeg_blocks(
            np.array([[128]], dtype=np.int64), color=False
        )
        sos_end = base.find(b"\xff\xda") + 2 + struct.unpack_from(
            ">H", base, base.find(b"\xff\xda") + 2
        )[0]
        dc = _huff_codes(_DC_LUMA_BITS, _DC_VALS)
        ac = _huff_codes(_AC_BITS, _AC_VALS)
        bw = _BitWriter()
        c = dc[0]
        bw.put(c & 0xFFFF, c >> 16)  # DC diff 0
        c = ac[0x01]  # run 0, size 1
        bw.put(c & 0xFFFF, c >> 16)
        bw.put(1, 1)  # AC value +1 at zigzag index 1 -> natural (0, 1)
        c = ac[0x00]  # EOB
        bw.put(c & 0xFFFF, c >> 16)
        bw.align()
        px = decode_jpeg(base[:sos_end] + bytes(bw.out) + b"\xff\xd9")
        assert px is not None
        # reference: F[0,1] = q[1] = 17; f(x,y) = F * c0/2*cos(..u=0..x)
        # * c1/2*cos((2y+1)pi/16)
        want = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                want[x, y] = (
                    17.0
                    * (math.sqrt(0.5) / 2.0)
                    * (math.cos((2 * y + 1) * math.pi / 16.0) / 2.0)
                )
        want = np.clip(np.round(want) + 128, 0, 255).astype(np.uint8)
        assert np.array_equal(px[:, :, 0], want)


class TestRejects:
    def _gray(self):
        return encode_jpeg_blocks(_grid(2, 3, 7), color=False)

    @pytest.mark.parametrize(
        "sof", [0xC2, 0xC1, 0xC9, 0xCB]
    )
    def test_non_baseline_sofs(self, sof):
        raw = bytearray(self._gray())
        raw[raw.find(b"\xff\xc0") + 1] = sof
        assert decode_jpeg(bytes(raw)) is None

    def test_16bit_dqt(self):
        raw = bytearray(self._gray())
        off = raw.find(b"\xff\xdb") + 4
        raw[off] = 0x10  # Pq=1
        assert decode_jpeg(bytes(raw)) is None

    def test_missing_dht(self):
        raw = self._gray()
        start = raw.find(b"\xff\xc4")
        seg_len = struct.unpack_from(">H", raw, start + 2)[0]
        assert decode_jpeg(raw[:start] + raw[start + 2 + seg_len :]) is None

    def test_entropy_truncation(self):
        raw = self._gray()
        assert decode_jpeg(raw[: int(len(raw) * 0.7)]) is None

    def test_early_eoi(self):
        raw = self._gray()
        sos = raw.find(b"\xff\xda")
        assert decode_jpeg(raw[: sos + 14] + b"\xff\xd9") is None

    @pytest.mark.parametrize(
        "junk", [None, b"", b"\x00" * 16, b"\xff\xd8" + b"\x00" * 6]
    )
    def test_garbage_total(self, junk):
        assert decode_jpeg(junk) is None

    def test_every_prefix_total(self):
        full = encode_jpeg_blocks(
            _grid(3, 3, 2), color=True, restart_interval=2
        )
        for cut in range(0, len(full), 13):
            decode_jpeg(full[:cut])  # must never raise


class TestSynthOracleMirror:
    def test_sweep(self):
        from ocr_spark.queries_media import synth_jpeg

        for d in range(0, 120):
            px = decode_jpeg(synth_jpeg(d))
            if d % 19 == 0 or d % 29 == 0:
                assert px is None
                continue
            w, h = 17 + d % 16, 9 + d % 12
            ch = 3 if d % 2 else 1
            assert px.shape == (h, w, ch)
            bv = _grid(-(-h // 8), -(-w // 8), d)
            want = _expand(bv, h, w)
            for k in range(ch):
                assert np.array_equal(px[:, :, k], want), (d, k)

    def test_sniffer_routes_jpeg(self):
        from ocr_spark.operators.media import decode_image_any
        from ocr_spark.queries_media import synth_jpeg

        fmt, px = decode_image_any(synth_jpeg(1))
        assert fmt == "jpeg" and px.shape[2] == 3
