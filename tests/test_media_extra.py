"""Audio frame featurizer + mixed-format image sniffing: pure-Python
references independent of the numpy implementation."""

from __future__ import annotations

import numpy as np

from ocr_spark.operators.media import (
    AUDIO_FRAME,
    decode_gif,
    decode_image_any,
    decode_png,
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


# --- hypothesis differential fuzz over the codecs -------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _images(draw, max_ch=4):
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 12))
    ch = draw(st.sampled_from([1, 3, 4][: max_ch]))
    data = draw(
        st.lists(st.integers(0, 255), min_size=h * w * ch,
                 max_size=h * w * ch)
    )
    return np.array(data, dtype=np.uint8).reshape(h, w, ch)


@given(_images())
@settings(max_examples=150, deadline=None)
def test_png_roundtrip_property(px):
    ctype = {1: 0, 3: 2, 4: 6}[px.shape[2]]
    out = decode_png(encode_png(px, ctype))
    assert out is not None and np.array_equal(out, px)


@given(_images(max_ch=1), st.integers(2, 256), st.booleans(), st.booleans())
@settings(max_examples=150, deadline=None)
def test_gif_roundtrip_property(key, psize, interlace, uncompressed):
    rng = np.random.default_rng(int(key.sum()) + psize)
    pal = rng.integers(0, 256, (psize, 3)).astype(np.uint8)
    idx = (key[:, :, 0] % psize).astype(np.uint8)
    out = decode_gif(
        encode_gif(idx, pal, interlace=interlace, uncompressed=uncompressed)
    )
    assert out is not None and np.array_equal(out, pal[idx])


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=300, deadline=None)
def test_codecs_never_raise_on_garbage(blob):
    """Totality: arbitrary bytes (including ones starting with the real
    magics) must return None, never raise."""
    from ocr_spark.operators.media import decode_bmp, decode_gif, decode_png

    for prefix in (b"", b"BM", b"\x89PNG\r\n\x1a\n", b"GIF89a"):
        data = prefix + blob
        assert decode_png(data) is None or prefix == b"\x89PNG\r\n\x1a\n"
        for dec in (decode_bmp, decode_gif, decode_image_any):
            dec(data)  # must not raise; result may be None or a decode
