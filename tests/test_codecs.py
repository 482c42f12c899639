"""Pure-stdlib multimodal codecs (stages/codecs.py): golden bytes,
round-trips, all PNG scanline filters, and the real-decode multimodal
stages end to end (no fake_decode anywhere)."""

import struct
import zlib

import numpy as np
import pytest

from openmldb_ray.stages import codecs as C

# 1x1 red PNG, pinned bytes (built from the spec: IHDR 1x1/8-bit/RGB,
# one filter-0 scanline b"\x00\xff\x00\x00" deflated at level 9)
GOLDEN_1PX_RED_PNG = (
    C.PNG_SIG
    + C._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
    + C._png_chunk(b"IDAT", zlib.compress(b"\x00\xff\x00\x00", 9))
    + C._png_chunk(b"IEND", b"")
)


def test_png_golden_pixel():
    img = C.decode_png(GOLDEN_1PX_RED_PNG)
    assert img.shape == (1, 1, 3)
    assert img.tolist() == [[[255, 0, 0]]]


def test_png_roundtrip_all_channel_counts():
    rng = np.random.default_rng(0)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 7, ch), dtype=np.uint8)
        out = C.decode_png(C.encode_png(img))
        np.testing.assert_array_equal(out, img)


def test_png_decodes_all_five_filters():
    """Externally-filtered PNG: encode each scanline with a different
    filter (None/Sub/Up/Average/Paeth) by hand and verify exact decode."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4, 1]):
        line = flat[y]
        enc = np.zeros(stride, np.int32)
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            pred = (0 if f == 0 else a if f == 1 else b if f == 2
                    else (a + b) >> 1 if f == 3 else C._paeth(a, b, c))
            enc[x] = (line[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (C.PNG_SIG + C._png_chunk(b"IHDR", ihdr)
           + C._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
           + C._png_chunk(b"IEND", b""))
    np.testing.assert_array_equal(C.decode_png(png), img)


def test_png_palette():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])     # R, G, B entries
    idx = bytes([0, 1, 2, 1])                           # 2x2 image
    raw = b"\x00" + idx[:2] + b"\x00" + idx[2:]
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    png = (C.PNG_SIG + C._png_chunk(b"IHDR", ihdr)
           + C._png_chunk(b"PLTE", plte)
           + C._png_chunk(b"IDAT", zlib.compress(raw))
           + C._png_chunk(b"IEND", b""))
    img = C.decode_png(png)
    assert img.tolist() == [[[255, 0, 0], [0, 255, 0]],
                            [[0, 0, 255], [0, 255, 0]]]


def test_png_rejects_bad_crc_and_interlace():
    bad = bytearray(GOLDEN_1PX_RED_PNG)
    bad[-5] ^= 0xFF                                      # IEND CRC byte
    with pytest.raises(ValueError, match="CRC"):
        C.decode_png(bytes(bad))
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)  # interlace=1
    png = (C.PNG_SIG + C._png_chunk(b"IHDR", ihdr)
           + C._png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
           + C._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlace"):
        C.decode_png(png)


def test_bmp_golden_and_roundtrip():
    # hand-built 2x1 24-bit BMP: bottom-up single row, pixels BGR
    # left pixel red (00 00 FF), right pixel white (FF FF FF), stride 8
    row = bytes([0, 0, 255, 255, 255, 255, 0, 0])
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(row), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0,
                         len(row), 0, 0, 0, 0))
    img = C.decode_bmp(hdr + row)
    assert img.tolist() == [[[255, 0, 0], [255, 255, 255]]]
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    np.testing.assert_array_equal(C.decode_bmp(C.encode_bmp(x)), x)


def test_ppm_roundtrip_and_comment_header():
    rng = np.random.default_rng(2)
    for ch in (1, 3):
        x = rng.integers(0, 256, size=(4, 6, ch), dtype=np.uint8)
        np.testing.assert_array_equal(C.decode_ppm(C.encode_ppm(x)), x)
    ppm = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    assert C.decode_ppm(ppm).tolist() == [[[1, 2, 3], [4, 5, 6]]]


def test_wav_roundtrip_mono_stereo():
    s = (np.sin(np.arange(1600) / 10) * 20000).astype(np.int16)
    arr, sr = C.decode_wav(C.encode_wav(s, 16_000))
    assert sr == 16_000 and arr.shape == (1600, 1)
    np.testing.assert_array_equal(arr[:, 0], s)
    st = np.stack([s, -s], axis=1)
    arr, sr = C.decode_wav(C.encode_wav(st, 8_000))
    assert sr == 8_000 and arr.shape == (1600, 2)
    np.testing.assert_array_equal(arr, st)


def test_frame_container_offsets_and_decode():
    rng = np.random.default_rng(4)
    frames = [C.encode_png(rng.integers(0, 256, size=(4, 4, 3),
                                        dtype=np.uint8)) for _ in range(5)]
    cont = C.encode_frame_container(frames)
    offs = C.frame_container_offsets(cont)
    assert len(offs) == 5
    for i, off in enumerate(offs):
        (ln,) = struct.unpack_from("<I", cont, off - 4)
        assert cont[off:off + ln] == frames[i]
    np.testing.assert_array_equal(C.decode_container_frame(cont, 3),
                                  C.decode_png(frames[3]))


def test_sniffer_dispatch_and_clear_error():
    img = np.full((2, 2, 3), 9, dtype=np.uint8)
    for enc in (C.encode_png, C.encode_bmp, C.encode_ppm):
        np.testing.assert_array_equal(C.sniff_decode_image(enc(img)), img)
    with pytest.raises(ValueError, match="decode_fn"):
        C.sniff_decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")


# ---------------------------------------------------------------------------
# real-decode stages end to end


def test_stage_real_image_decode_exact_means(ray_session):
    from openmldb_ray.stages.multimodal import (
        extract_image_features, make_multimodal_dataset)

    mm = make_multimodal_dataset(16).filter(
        lambda r: r["mm_type"] == "image")
    out = extract_image_features(mm).to_pandas()     # REAL PNG decode
    for _, r in out.iterrows():
        i = int(r["mm_id"])
        exp = [(7 * i) % 256, (13 * i) % 256, (29 * i) % 256]
        assert [int(round(float(v))) for v in r["img_mean_rgb"]] == exp


def test_stage_real_audio_decode_exact_counts(ray_session):
    from openmldb_ray.stages.multimodal import (
        make_multimodal_dataset, sample_audio_frames)

    mm = make_multimodal_dataset(16).filter(
        lambda r: r["mm_type"] == "audio")
    out = sample_audio_frames(mm, frame_ms=10).to_pandas()
    for _, r in out.iterrows():
        i = int(r["mm_id"])
        assert int(r["n_samples"]) == 800 + i
        assert int(r["sample_rate"]) == 16_000
        assert int(r["n_frames"]) == -(-(800 + i) // 160)


def test_stage_real_video_offsets(ray_session):
    from openmldb_ray.stages.multimodal import (
        make_video_dataset, sample_video_frames)

    vid = make_video_dataset(4, frames=6)
    out = sample_video_frames(vid, stride=2).to_pandas()
    assert (out["frame_offsets"].map(len) == 3).all()    # frames 0, 2, 4
    # sampled offsets decode to the known solid-gray frames
    raw = vid.to_pandas().set_index("mm_id")
    for _, r in out.iterrows():
        i = int(r["mm_id"])
        cont = raw.loc[i, "payload"]
        for k, off in enumerate(r["frame_offsets"]):
            (ln,) = struct.unpack_from("<I", cont, int(off) - 4)
            img = C.sniff_decode_image(cont[int(off):int(off) + ln])
            assert (img == (i * 31 + (2 * k) * 5) % 256).all()


def test_stage_real_resize_roundtrip(ray_session):
    from openmldb_ray.stages.multimodal import (
        make_multimodal_dataset, resize_images)

    mm = make_multimodal_dataset(8).filter(lambda r: r["mm_type"] == "image")
    out = resize_images(mm, out_hw=(4, 4)).to_pandas()   # REAL decode
    for _, r in out.iterrows():
        i = int(r["mm_id"])
        a = np.frombuffer(r["payload_resized"], np.uint8).reshape(4, 4, 3)
        assert (a[0, 0] == [(7 * i) % 256, (13 * i) % 256,
                            (29 * i) % 256]).all()


def test_stage_image_audio_stats(ray_session):
    from openmldb_ray.stages.multimodal import (
        audio_stats, image_stats, make_multimodal_dataset)

    mm = make_multimodal_dataset(12)
    fi = image_stats(mm.filter(lambda r: r["mm_type"] == "image")).to_pandas()
    for _, r in fi.iterrows():
        i = int(r["mm_id"])
        assert (r["img_w"], r["img_h"], r["img_channels"]) == (8, 8, 3)
        exp = ((7 * i) % 256 + (13 * i) % 256 + (29 * i) % 256) / 3.0
        assert abs(r["img_mean"] - exp) < 1e-9
    fa = audio_stats(mm.filter(lambda r: r["mm_type"] == "audio")).to_pandas()
    for _, r in fa.iterrows():
        i = int(r["mm_id"])
        assert abs(r["duration_ms"] - (800 + i) / 16.0) < 1e-9
        assert r["rms"] > 0 and r["zero_crossings"] >= 1
