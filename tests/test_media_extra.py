"""Audio frame featurizer + mixed-format image sniffing: pure-Python
references independent of the numpy implementation."""

from __future__ import annotations

import numpy as np

from ocr_spark.operators.media import (
    AUDIO_FRAME,
    decode_image_any,
    decode_wav,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_wav,
)


def test_frame_features_match_hand_loop(spark):
    from ocr_spark.queries_media import synth_wav

    doc_id = 42
    payload = synth_wav(doc_id)
    _, s = decode_wav(payload)
    s = [int(v) for v in s]
    n = len(s)
    nf = n // AUDIO_FRAME
    expect = []
    for f in range(nf):
        fr = s[f * AUDIO_FRAME : (f + 1) * AUDIO_FRAME]
        sumsq = sum(v * v for v in fr)
        zc = sum(1 for a, b in zip(fr, fr[1:]) if a * b < 0)
        expect.append((doc_id, f, True, sumsq, zc))

    from ocr_spark.operators.media import wav_frame_features

    df = spark.createDataFrame(
        [(doc_id, bytearray(payload))], "doc_id bigint, payload binary"
    )
    got = sorted(map(tuple, wav_frame_features(df).collect()))
    assert got == expect
    # the partial tail frame is dropped, not padded
    assert len(got) == nf and n % AUDIO_FRAME != 0


def test_sniff_dispatch_all_formats():
    px3 = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.eye(3, dtype=np.uint8)
    cases = {
        "bmp": encode_bmp(px3),
        "png": encode_png(px3, 2),
        "gif": encode_gif(idx, pal),
    }
    for fmt, blob in cases.items():
        got = decode_image_any(blob)
        assert got is not None and got[0] == fmt
    assert decode_image_any(b"\x00" * 64) is None
    assert decode_image_any(None) is None
    # a sniffed format that fails its own decoder is None, not misrouted
    assert decode_image_any(b"BM" + b"\x01" * 60) is None
