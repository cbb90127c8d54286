"""The real PPM (P6) decode -> resize chain (functions/multimodal.py):
header parse per the netpbm spec, raster reshape, numpy nearest-neighbor
resize, and the Arrow-batched Spark operator over synthesized fixtures.
Closes the round-3 'decode is stubbed' boundary for one real format."""

import numpy as np
import pytest

from scala_timeseries_lib_spark.functions.multimodal import (
    decode_stub,
    parse_ppm,
    ppm_decode_stats,
    resize_nearest,
    synthesize_ppm,
)


def test_synthesize_roundtrip():
    for doc_id in (0, 1, 7, 12, 91, 12345):
        w, h, maxval, pix = parse_ppm(synthesize_ppm(doc_id))
        assert (w, h, maxval) == (doc_id % 13 + 4, doc_id % 7 + 3, 255)
        # closed-form pixel values survive the encode/decode round trip
        y, x, c = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(3), indexing="ij"
        )
        assert np.array_equal(pix, (doc_id * 7 + y * 5 + x * 3 + c) % 256)


def test_parse_handles_comments_and_whitespace():
    pix = bytes(range(2 * 1 * 3))
    payload = b"P6 # inline\n# full comment line\n 2\t1 \n255\n" + pix
    w, h, maxval, arr = parse_ppm(payload)
    assert (w, h, maxval) == (2, 1, 255)
    assert arr.tobytes() == pix


@pytest.mark.parametrize(
    "payload",
    [
        b"P5\n1 1\n255\n" + b"\x00" * 3,   # wrong magic (P5 is grayscale)
        b"P6\n2 2\n255\n" + b"\x00" * 5,    # truncated raster
        b"P6\n2 2\n65535\n" + b"\x00" * 24, # 2-byte samples unsupported
        b"P6\nx 2\n255\n" + b"\x00" * 12,   # malformed width
        b"P6\n2 2\n255",                     # missing separator + raster
    ],
)
def test_parse_rejects_malformed(payload):
    with pytest.raises(ValueError):
        parse_ppm(payload)


def test_resize_nearest_matches_bruteforce():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    out = resize_nearest(img, 8, 6)
    assert out.shape == (6, 8, 3)
    for y in range(6):
        for x in range(8):
            assert np.array_equal(out[y, x], img[(y * 9) // 6, (x * 13) // 8])
    # identity resize is exact
    assert np.array_equal(resize_nearest(img, 13, 9), img)


def test_decode_stub_uses_real_parser_for_ppm():
    p = synthesize_ppm(42)
    assert decode_stub(p) == (42 % 13 + 4, 42 % 7 + 3)
    # malformed P6 falls back to the deterministic fake, not an exception
    fake = decode_stub(b"P6 garbage not a real header")
    assert fake == (len(b"P6 garbage not a real header") % 640 + 16,
                    len(b"P6 garbage not a real header") % 480 + 16)
    with pytest.raises(NotImplementedError):
        decode_stub(b"\xff\xd8jpeg-ish")


def test_ppm_decode_stats_operator(spark):
    rows = [(int(i), synthesize_ppm(int(i))) for i in range(25)]
    # one corrupt payload: must be skipped, not poison the batch
    rows.append((99, b"P6\n4 4\n255\ntoo-short"))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in ppm_decode_stats(df, out_w=8, out_h=6).collect()}
    assert 99 not in got and len(got) == 25
    for i in range(25):
        w, h, _m, pix = parse_ppm(synthesize_ppm(i))
        r = got[i]
        assert (r.width, r.height, r.maxval) == (w, h, 255)
        assert r.pixel_sum == int(pix.sum(dtype=np.int64))
        assert r.resized_sum == int(
            resize_nearest(pix, 8, 6).sum(dtype=np.int64)
        )
