"""ISO-BMFF structural parse: version axes, largesize, skips, rejects."""

from __future__ import annotations

import struct

import pytest

from ocr_spark.operators.media import _box, encode_mp4, parse_mp4


def _tracks(n=2):
    out = [
        dict(
            version=0,
            track_id=1,
            handler=b"vide",
            width=640,
            height=360,
            md_timescale=3000,
            md_duration=90000,
        )
    ]
    if n > 1:
        out.append(
            dict(
                version=1,
                track_id=2,
                handler=b"soun",
                width=0,
                height=0,
                md_timescale=44100,
                md_duration=441000,
            )
        )
    return out[:n]


class TestRoundTrip:
    @pytest.mark.parametrize("mv_version", [0, 1])
    def test_mvhd_versions(self, mv_version):
        dur = 2**33 + 600 if mv_version else 30000
        m = parse_mp4(encode_mp4(b"isom", mv_version, 600, dur, _tracks()))
        assert m is not None
        assert m["timescale"] == 600 and m["duration"] == dur
        assert m["dur_ms"] == dur * 1000 // 600

    def test_v1_duration_needs_u64(self):
        """A u32 read of a v1 duration truncates 2^33 to 0 — catch it."""
        dur = 2**33
        m = parse_mp4(encode_mp4(b"isom", 1, 1000, dur, _tracks(1)))
        assert m["duration"] == dur != dur % 2**32

    def test_tkhd_mdhd_versions_and_dims(self):
        m = parse_mp4(encode_mp4(b"mp42", 0, 1000, 5000, _tracks(2)))
        t0, t1 = m["tracks"]
        assert (t0["width"], t0["height"]) == (640, 360)
        assert t0["handler"] == "vide" and t0["md_ms"] == 30000
        assert t1["handler"] == "soun" and t1["md_ms"] == 10000
        assert t1["md_duration"] == 441000  # v1 mdhd, u64 layout

    def test_brand_and_track_order(self):
        m = parse_mp4(encode_mp4(b"avc1", 0, 1000, 1, _tracks(2)))
        assert m["brand"] == "avc1"
        assert [t["track_id"] for t in m["tracks"]] == [1, 2]

    @pytest.mark.parametrize("largesize", [False, True])
    @pytest.mark.parametrize("udta", [False, True])
    def test_skippable_and_largesize(self, largesize, udta):
        m = parse_mp4(
            encode_mp4(
                b"isom", 0, 1000, 7000, _tracks(1),
                largesize_mdat=largesize, with_udta=udta,
            )
        )
        assert m is not None and len(m["tracks"]) == 1

    def test_size_zero_final_box(self):
        """size==0 means 'to EOF' — legal only as the final box."""
        base = encode_mp4(b"isom", 0, 1000, 7000, _tracks(1))
        tail = struct.pack(">I4s", 0, b"mdat") + b"\x00" * 40
        assert parse_mp4(base + tail) is not None


class TestRejects:
    def test_truncated(self):
        assert parse_mp4(
            encode_mp4(b"isom", 0, 1000, 7000, _tracks(1), truncate=True)
        ) is None

    def test_corrupt_inner_size(self):
        assert parse_mp4(
            encode_mp4(
                b"isom", 0, 1000, 7000, _tracks(1), corrupt_size=True
            )
        ) is None

    def test_moov_without_ftyp(self):
        full = encode_mp4(b"isom", 0, 1000, 7000, _tracks(1))
        ftyp_size = struct.unpack_from(">I", full, 0)[0]
        assert parse_mp4(full[ftyp_size:]) is None

    def test_unknown_fullbox_version(self):
        raw = bytearray(encode_mp4(b"isom", 0, 1000, 7000, _tracks(1)))
        off = raw.find(b"mvhd") + 4
        raw[off] = 2
        assert parse_mp4(bytes(raw)) is None

    def test_zero_timescale(self):
        assert parse_mp4(
            encode_mp4(b"isom", 0, 0, 7000, _tracks(1))
        ) is None

    @pytest.mark.parametrize(
        "junk",
        [None, b"", b"\x00" * 7, b"garbage!" * 64,
         struct.pack(">I4s", 5, b"ftyp")],
    )
    def test_garbage_total(self, junk):
        assert parse_mp4(junk) is None

    def test_every_prefix_is_total(self):
        full = encode_mp4(b"isom", 1, 600, 2**33, _tracks(2))
        for cut in range(0, len(full), 7):
            parse_mp4(full[:cut])  # must never raise


class TestSynthOracleMirror:
    def test_synth_features_match_closed_form(self):
        """Mirror the mm_mp4_meta oracle arithmetic in Python for a
        doc_id sweep covering every axis residue."""
        from ocr_spark.queries_media import _MP4_DUR_HI, synth_mp4

        for d in range(0, 120):
            m = parse_mp4(synth_mp4(d))
            bad = d % 17 == 0 or d % 23 == 0
            if bad:
                assert m is None
                continue
            mv_dur = 10000 + (d * 97) % 90000 + (
                _MP4_DUR_HI if d % 2 else 0
            )
            assert m["dur_ms"] == mv_dur * 1000 // (600 * (1 + d % 4))
            n = 1 + d % 3
            assert len(m["tracks"]) == n
            want_ms = sum(
                (5000 + (d * 31 + k * 7919) % 50000
                 + ((d + k) % 2) * _MP4_DUR_HI) * 1000
                // (1000 * (1 + (d + k) % 3))
                for k in range(n)
            )
            assert sum(t["md_ms"] for t in m["tracks"]) == want_ms

    def test_mp4_is_not_sniffed_as_image(self):
        from ocr_spark.operators.media import decode_image_any
        from ocr_spark.queries_media import synth_mp4

        assert decode_image_any(synth_mp4(1)) is None


def test_box_helper_largesize_layout():
    b = _box(b"mdat", b"\x01\x02", largesize=True)
    size, btype = struct.unpack_from(">I4s", b, 0)
    assert size == 1 and btype == b"mdat"
    assert struct.unpack_from(">Q", b, 8)[0] == len(b) == 18


class TestFiveWayDispatch:
    def test_sniff_all_sweep(self):
        """decode_image_any routes every synth_image_all payload to the
        right decoder; rejects match each format's families."""
        from ocr_spark.operators.media import decode_image_any
        from ocr_spark.queries_media import synth_image_all

        fmts = {0: "bmp", 1: "png", 2: "gif", 3: "tiff", 4: "jpeg"}
        bad = {
            1: lambda d: d % 17 == 0 or d % 13 == 0,
            2: lambda d: d % 19 == 0,
            3: lambda d: d % 23 == 0,
            4: lambda d: d % 19 == 0 or d % 29 == 0,
        }
        seen = set()
        for d in range(100):
            sel = d % 5
            got = decode_image_any(synth_image_all(d))
            if bad.get(sel, lambda _: False)(d):
                assert got is None, d
                continue
            assert got is not None and got[0] == fmts[sel], d
            seen.add(got[0])
        assert seen == set(fmts.values())
