"""Tests for the REAL codec-free media decode paths (operators/media.py):
BMP encode/decode/resize and WAV PCM16 encode/decode, plus the graded
Spark stages. The decoders are checked against independent references —
stdlib ``wave`` for WAV, hand-built byte layouts and pure-Python pixel
loops for BMP — never only against the sibling encoders.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from ocr_spark.operators.media import (
    bmp_features,
    bmp_resize,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resize_nn,
    wav_features,
)
from ocr_spark.queries import QUERIES
import ocr_spark.queries_media as qm
from tests.test_plans import _plan


def _rand_px(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(
        np.uint8
    )


# --- BMP -----------------------------------------------------------------------------


@pytest.mark.parametrize("w", [17, 18, 19, 20, 1])  # every w % 4 residue
def test_bmp_roundtrip_all_padding_residues(w):
    rng = np.random.default_rng(w)
    px = _rand_px(rng, 5, w)
    out = decode_bmp(encode_bmp(px))
    assert out.shape == px.shape
    assert np.array_equal(out, px)


def test_bmp_roundtrip_1x1():
    px = np.array([[[7, 200, 13]]], dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_decoder_reads_padding_from_spec():
    # Hand-build a 2x2 bottom-up BMP (row stride 8: 6 pixel bytes + 2 pad)
    # without the encoder: pixel (0,0)=RGB(1,2,3) (1,1)=RGB(10,20,30).
    row_top = bytes([3, 2, 1, 0, 0, 0, 0xAA, 0xBB])  # BGR + junk padding
    row_bot = bytes([0, 0, 0, 30, 20, 10, 0xCC, 0xDD])
    body = row_bot + row_top  # bottom-up: file row 0 = image row 1
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    hdr += struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body), 0, 0, 0, 0
    )
    px = decode_bmp(hdr + body)
    assert px[0, 0].tolist() == [1, 2, 3]
    assert px[1, 1].tolist() == [10, 20, 30]
    assert px[0, 1].tolist() == [0, 0, 0]


def test_bmp_decoder_topdown_negative_height():
    px = _rand_px(np.random.default_rng(3), 4, 6)
    data = bytearray(encode_bmp(px))
    # flip to top-down: negate biHeight and reverse the stored row order
    struct.pack_into("<i", data, 22, -4)
    row_len = (6 * 3 + 3) & ~3
    body = bytes(data[54:])
    rows = [body[i * row_len : (i + 1) * row_len] for i in range(4)]
    data[54:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(data)), px)


@pytest.mark.parametrize(
    "payload",
    [
        None,
        b"",
        b"BM" + b"\x00" * 10,  # truncated header
        b"PNG not a bmp at all, but long enough to clear 54 bytes" + b"\x00" * 20,
        encode_bmp(np.zeros((2, 2, 3), np.uint8))[:-5],  # truncated body
    ],
)
def test_bmp_decoder_rejects_malformed(payload):
    assert decode_bmp(payload) is None


def test_bmp_decoder_rejects_unsupported_bpp():
    data = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    struct.pack_into("<H", data, 28, 8)  # claim 8 bpp
    assert decode_bmp(bytes(data)) is None


def test_resize_nn_matches_pure_python_loops():
    rng = np.random.default_rng(11)
    px = _rand_px(rng, 7, 13)
    out = resize_nn(px, 5, 9)
    for r2 in range(9):
        for c2 in range(5):
            assert (
                out[r2, c2].tolist()
                == px[(r2 * 7) // 9, (c2 * 13) // 5].tolist()
            )


# --- WAV -----------------------------------------------------------------------------


def test_wav_roundtrip_and_stdlib_cross_check():
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32768, size=333, dtype=np.int64).astype(
        np.int16
    )
    blob = encode_wav(s, 16000)
    rate, out = decode_wav(blob)
    assert rate == 16000 and np.array_equal(out, s)
    # independent reference: stdlib wave must parse the same bytes
    with wave.open(io.BytesIO(blob)) as wf:
        assert wf.getframerate() == 16000
        assert wf.getnchannels() == 1 and wf.getsampwidth() == 2
        ref = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
    assert np.array_equal(ref, s)


def test_wav_decoder_walks_extra_chunks():
    s = np.arange(-50, 50, dtype=np.int16)
    blob = bytearray(encode_wav(s, 8000))
    # splice an odd-length LIST chunk between fmt and data (word-aligned
    # per RIFF: 5-byte body + 1 pad byte)
    extra = struct.pack("<4sI", b"LIST", 5) + b"abcde" + b"\x00"
    insert_at = 12 + 8 + 16  # after fmt chunk
    blob[insert_at:insert_at] = extra
    struct.pack_into("<I", blob, 4, len(blob) - 8)
    rate, out = decode_wav(bytes(blob))
    assert rate == 8000 and np.array_equal(out, s)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: None,
        lambda b: b[:10],
        lambda b: b"JUNK" + b[4:],  # bad RIFF magic
        lambda b: b[:8] + b"AVI " + b[12:],  # not WAVE
        lambda b: b[:-3],  # truncated data chunk
    ],
)
def test_wav_decoder_rejects_malformed(mutate):
    blob = encode_wav(np.zeros(16, np.int16), 8000)
    assert decode_wav(mutate(blob)) is None


def test_wav_decoder_rejects_stereo():
    blob = bytearray(encode_wav(np.zeros(16, np.int16), 8000))
    struct.pack_into("<H", blob, 12 + 8 + 2, 2)  # channels = 2
    assert decode_wav(bytes(blob)) is None


# --- Spark stages --------------------------------------------------------------------


def test_bmp_features_stage_and_malformed_rows(spark):
    good = encode_bmp(np.full((3, 5, 3), 9, np.uint8))
    df = spark.createDataFrame(
        [(1, good), (2, b"not a bmp"), (3, None)],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r for r in bmp_features(df).collect()}
    assert rows[1].ok and rows[1].width == 5 and rows[1].height == 3
    assert rows[1].sum_r == rows[1].sum_g == rows[1].sum_b == 9 * 15
    assert not rows[2].ok and rows[2].width is None
    assert not rows[3].ok


def test_wav_features_stage(spark):
    s = np.array([-3, 4, -5], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, encode_wav(s, 9000)), (2, b"xx")],
        "doc_id bigint, payload binary",
    )
    rows = {r.doc_id: r for r in wav_features(df).collect()}
    assert rows[1].ok and rows[1].sample_rate == 9000
    assert rows[1].n_samples == 3 and rows[1].sum_abs == 12
    assert not rows[2].ok


def test_resize_stage_output_redecodes(spark):
    px = _rand_px(np.random.default_rng(2), 10, 21)
    df = spark.createDataFrame(
        [(1, encode_bmp(px))], "doc_id bigint, payload binary"
    )
    row = bmp_resize(df, 6, 4).collect()[0]
    assert row.ok and row.width == 6 and row.height == 4
    out = decode_bmp(bytes(row.resized))
    assert np.array_equal(out, resize_nn(px, 6, 4))


def test_synth_params_match_oracle_formulas():
    # the python synth and the SQL oracle share only these formulas; pin
    # them against hand-computed values so neither drifts silently
    w, h, br, bg, bb = qm._bmp_params(40)
    assert (w, h) == (17 + 1, 9 + 5)
    assert (br, bg, bb) == ((40 * 37) % 256, (40 * 59) % 256, (40 * 83) % 256)
    px = decode_bmp(qm.synth_bmp(40))
    assert px.shape == (h, w, 3)
    assert px[2, 3].tolist() == [
        (br + 2) % 256, (bg + 3) % 256, (bb + 2 + 3) % 256
    ]
    rate, s = decode_wav(qm.synth_wav(40))
    assert rate == 8000 and len(s) == 200 + 40 % 300
    assert s[7] == (40 * 7919 + 7 * 104729) % 4001 - 2000


def test_media_plans_are_map_only(spark):
    sf = "/root/testdata/sf0.001"
    for name in ["mm_decode_bmp", "mm_audio_wav", "mm_resize_bmp"]:
        plan = _plan(QUERIES[name](spark, sf))
        assert "Exchange" not in plan, name


# --- netpbm --------------------------------------------------------------------


def test_netpbm_roundtrip_and_grammar_variants():
    import numpy as np

    from ocr_spark.operators.media import (
        decode_netpbm,
        encode_pgm,
        encode_ppm,
    )

    px = (np.arange(7 * 5 * 3, dtype=np.int64) % 256).reshape(
        5, 7, 3
    ).astype(np.uint8)
    for style in (0, 1, 2):
        got, fmt = decode_netpbm(encode_ppm(px, header_style=style))
        assert fmt == "P6" and (got == px).all(), style
    g = (np.arange(7 * 5, dtype=np.int64) % 256).reshape(5, 7).astype(
        "uint8"
    )
    for style in (0, 1):
        got, fmt = decode_netpbm(encode_pgm(g, header_style=style))
        assert fmt == "P5" and (got == g).all(), style


def test_netpbm_rejects_malformed():
    import numpy as np

    from ocr_spark.operators.media import decode_netpbm, encode_ppm

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_ppm(px)
    assert decode_netpbm(None) is None
    assert decode_netpbm(b"") is None
    assert decode_netpbm(b"P3\n2 2\n255\n0 0 0 0") is None  # ASCII PPM
    assert decode_netpbm(b"P6\n2 2\n65535\n" + b"\0" * 24) is None  # 16-bit
    assert decode_netpbm(good[: len(good) - 5]) is None  # truncated raster
    assert decode_netpbm(b"XX" + good[2:]) is None  # bad magic
    assert decode_netpbm(b"P6\n0 4\n255\n") is None  # zero width
    assert decode_netpbm(b"P6\n2 2\n255") is None  # header cut at maxval
    # comment swallowing must not eat the raster: first raster byte 0x23
    hdr = b"P6\n1 1\n255\n"
    assert decode_netpbm(hdr + bytes([0x23, 1, 2]))[0].tolist() == [
        [[0x23, 1, 2]]
    ]


def test_netpbm_raster_boundary_single_whitespace():
    """The byte after maxval's single terminating whitespace IS raster —
    even when it is whitespace-valued (0x0A gray pixel)."""
    from ocr_spark.operators.media import decode_netpbm

    data = b"P5\n1 2\n255\n" + bytes([0x0A, 0x20])
    px, fmt = decode_netpbm(data)
    assert fmt == "P5" and px.tolist() == [[0x0A], [0x20]]


def test_phash_matches_hand_reference():
    """aHash bits recomputed with plain Python loops over the decoded
    pixels (independent of the numpy vectorization in bmp_phash)."""
    import numpy as np

    from ocr_spark.operators.media import decode_bmp, encode_bmp

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(11, 23, 3)).astype(np.uint8)
    data = encode_bmp(px)
    back = decode_bmp(data)
    assert back is not None and (back == px).all()

    # independent reference: pure-Python cell walk
    h, w = 11, 23
    cells = []
    for r2 in range(8):
        for c2 in range(8):
            ri, ci = (r2 * h) // 8, (c2 * w) // 8
            cells.append(int(px[ri, ci, 0]) + int(px[ri, ci, 1])
                         + int(px[ri, ci, 2]))
    total = sum(cells)
    lo = sum(1 << k for k in range(32) if cells[k] * 64 > total)
    hi = sum(1 << k for k in range(32) if cells[k + 32] * 64 > total)

    # engine path via the same mapInPandas worker fn, driven directly
    import pandas as pd

    from ocr_spark.operators.media import bmp_phash

    captured = {}

    class _FakeDF:
        def mapInPandas(self, fn, schema):
            out = list(fn(iter([pd.DataFrame(
                {"doc_id": [1], "payload": [data]}
            )])))
            captured["row"] = out[0].iloc[0]
            return None

    bmp_phash(_FakeDF())
    row = captured["row"]
    assert bool(row["ok"])
    assert int(row["phash_lo"]) == lo
    assert int(row["phash_hi"]) == hi


def test_phash_malformed_and_duplicate_payloads():
    import numpy as np
    import pandas as pd

    from ocr_spark.operators.media import bmp_phash, encode_bmp

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[0, 0] = 255  # one bright cell -> a nonzero bit
    good = encode_bmp(px)
    captured = {}

    class _FakeDF:
        def mapInPandas(self, fn, schema):
            out = list(fn(iter([pd.DataFrame({
                "doc_id": [1, 2, 3],
                "payload": [good, good, b"not a bmp"],
            })])))
            captured["pdf"] = out[0]
            return None

    bmp_phash(_FakeDF())
    pdf = captured["pdf"]
    assert list(pdf["ok"]) == [True, True, False]
    # identical payloads -> identical hash (the dedup key)
    assert pdf.iloc[0]["phash_lo"] == pdf.iloc[1]["phash_lo"]
    assert pdf.iloc[0]["phash_hi"] == pdf.iloc[1]["phash_hi"]
    assert pdf.iloc[0]["phash_lo"] != 0 or pdf.iloc[0]["phash_hi"] != 0


def test_bmp_tiles_partition_the_image(spark):
    """bmp_tiles: tiles partition every image exactly — per-channel tile
    sums add up to bmp_features' whole-image sums, tile dims tile the
    (h, w) rectangle — and a malformed payload yields one ok=false row."""
    from collections import defaultdict

    from ocr_spark.operators.media import bmp_features, bmp_tiles
    from ocr_spark.queries_media import _payloads, synth_bmp

    sf = "/root/testdata/sf0.001"
    pay = _payloads(spark, sf, synth_bmp)
    whole = {
        r["doc_id"]: (r["width"], r["height"], r["sum_r"], r["sum_g"], r["sum_b"])
        for r in bmp_features(pay).collect()
    }
    sums = defaultdict(lambda: [0, 0, 0])
    dims = defaultdict(lambda: [0, 0])
    for r in bmp_tiles(pay).collect():
        assert r["ok"]
        s = sums[r["doc_id"]]
        s[0] += r["sum_r"]; s[1] += r["sum_g"]; s[2] += r["sum_b"]
        if r["tile_c"] == 0:
            dims[r["doc_id"]][0] += r["th"]
        if r["tile_r"] == 0:
            dims[r["doc_id"]][1] += r["tw"]
    for did, (w, h, sr, sg, sb) in whole.items():
        assert sums[did] == [sr, sg, sb], did
        assert dims[did] == [h, w], did

    bad = spark.createDataFrame(
        [(1, bytearray(b"nope"))], "doc_id long, payload binary"
    )
    rows = bmp_tiles(bad).collect()
    assert len(rows) == 1 and not rows[0]["ok"]
    assert rows[0]["tile_r"] == -1
