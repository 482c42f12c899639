"""Codec round-trip + oracle fuzzing (VERDICT r4 task #4).

Three families, each >= 25 seeds:
- image/audio encode -> decode == identity over random sizes, channel
  counts, palettes, and ALL FIVE PNG row filters on the decode side
  (the encoder only emits filter 0, so filtered PNGs are built here
  with an independent numpy reference filterer);
- corrupted-byte inputs must RAISE, never garbage-decode (PNG is fully
  CRC-covered so any flipped byte raises; the CRC-less formats are
  corrupted in their headers);
- random HTML through html_to_text vs the DuckDB replay of the op's own
  HTML_STRIP_STEPS table — exact string equality (the html_extract
  oracle contract, on adversarial inputs instead of the fixture shell).
"""

import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from openmldb_ray.stages.codecs import (PNG_SIG, _png_chunk, decode_bmp,
                                        decode_png, decode_ppm, decode_wav,
                                        encode_bmp, encode_png, encode_ppm,
                                        encode_wav)

SEEDS = list(range(30))


def _rand_img(rng, ch):
    h = int(rng.integers(1, 33))
    w = int(rng.integers(1, 33))
    a = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    return a[:, :, 0] if ch == 1 and rng.integers(2) else a


def _ref_filter_row(f, line, prev, ch):
    """Independent numpy reference PNG row FILTERER (encoder side of the
    spec) — used to build inputs the decoder must invert exactly."""
    line = line.astype(np.int64)
    prev = prev.astype(np.int64)
    a = np.zeros(len(line), np.int64)
    a[ch:] = line[:-ch]
    c = np.zeros(len(line), np.int64)
    c[ch:] = prev[:-ch]
    if f == 0:
        enc = line
    elif f == 1:
        enc = line - a
    elif f == 2:
        enc = line - prev
    elif f == 3:
        enc = line - ((a + prev) >> 1)
    else:
        p = a + prev - c
        pa_, pb_, pc_ = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
        pred = np.where((pa_ <= pb_) & (pa_ <= pc_), a,
                        np.where(pb_ <= pc_, prev, c))
        enc = line - pred
    return (enc % 256).astype(np.uint8)


def _build_png(img, filters, color=None, palette=None):
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if color is None:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    prev = np.zeros(stride, np.uint8)
    raws = []
    for y in range(h):
        line = img[y].reshape(stride)
        f = int(filters[y % len(filters)])
        raws.append(bytes([f]) + _ref_filter_row(f, line, prev, ch).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    chunks = PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        chunks += _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return chunks + _png_chunk(b"IDAT", zlib.compress(b"".join(raws))) \
        + _png_chunk(b"IEND", b"")


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_image_audio_roundtrip(seed):
    rng = np.random.default_rng(seed)
    # PNG round-trip: every encoder-supported channel count
    ch = int(rng.choice([1, 2, 3, 4]))
    img = _rand_img(rng, ch)
    out = decode_png(encode_png(img))
    ref = img if img.ndim == 3 else img[:, :, None]
    assert (out == ref).all()
    # BMP (the encoder writes 24-bit RGB only) and PPM/PGM (1/3ch)
    bimg = rng.integers(0, 256, (int(rng.integers(1, 33)),
                                 int(rng.integers(1, 33)), 3),
                        dtype=np.uint8)
    assert (decode_bmp(encode_bmp(bimg)) == bimg).all()
    pimg = _rand_img(rng, int(rng.choice([1, 3])))
    pref = pimg if pimg.ndim == 3 else pimg[:, :, None]
    assert (decode_ppm(encode_ppm(pimg)) == pref).all()
    # WAV PCM-16, 1-4 channels
    nch = int(rng.integers(1, 5))
    n = int(rng.integers(1, 2000))
    samples = rng.integers(-32768, 32768, (n, nch)).astype(np.int16)
    sr = int(rng.choice([8000, 16000, 44100]))
    got, got_sr = decode_wav(encode_wav(samples, sr))
    assert got_sr == sr and (got == samples).all()


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_png_all_filters_decode(seed):
    """Random per-row filter bytes (all 5 types) over random channel
    counts — and palette (color type 3) images — must decode exactly."""
    rng = np.random.default_rng(1000 + seed)
    ch = int(rng.choice([1, 2, 3, 4]))
    h = int(rng.integers(1, 24))
    w = int(rng.integers(1, 24))
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    filters = rng.integers(0, 5, h)
    assert (decode_png(_build_png(img, filters)) == img).all()
    # palette image: indices -> PLTE rows
    palette = rng.integers(0, 256, (int(rng.integers(1, 256)), 3),
                           dtype=np.uint8)
    idx = rng.integers(0, len(palette), (h, w, 1)).astype(np.uint8)
    png = _build_png(idx, rng.integers(0, 5, h), color=3, palette=palette)
    assert (decode_png(png) == palette[idx[:, :, 0]]).all()


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_corrupted_inputs_raise(seed):
    rng = np.random.default_rng(2000 + seed)
    img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    # PNG: every byte after the signature is CRC-covered -> must raise
    png = bytearray(encode_png(img))
    pos = int(rng.integers(0, len(png)))
    png[pos] ^= int(rng.integers(1, 256))
    with pytest.raises(Exception):
        decode_png(bytes(png))
    # CRC-less formats: corrupt the HEADER (magic/dims) -> must raise,
    # with the one benign exception of a dimension byte flip that still
    # yields a self-consistent smaller geometry
    for enc, dec, hdr in [(encode_bmp(img), decode_bmp, 2),
                          (encode_ppm(img), decode_ppm, 2)]:
        b = bytearray(enc)
        b[int(rng.integers(0, hdr))] ^= int(rng.integers(1, 256))
        with pytest.raises(Exception):
            dec(bytes(b))
    wav = bytearray(encode_wav(np.zeros(16, np.int16), 8000))
    wav[int(rng.integers(0, 4))] ^= int(rng.integers(1, 256))
    with pytest.raises(Exception):
        decode_wav(bytes(wav))


def _rand_html(rng) -> str:
    tags = ["div", "p", "span", "a href='x'", "b", "h1", "table", "td"]
    ents = ["&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;", "&amp;",
            "&amp;lt;", "&amp;amp;"]
    words = ["alpha", "beta", "Gamma", "DELTA", "42", "x<y", "a&b", '"q"']
    parts = []
    for _ in range(int(rng.integers(1, 25))):
        k = int(rng.integers(0, 7))
        if k == 0:
            t = tags[int(rng.integers(len(tags)))]
            parts.append(f"<{t}>")
        elif k == 1:
            t = tags[int(rng.integers(len(tags)))].split()[0]
            parts.append(f"</{t}>")
        elif k == 2:
            parts.append(ents[int(rng.integers(len(ents)))])
        elif k == 3:
            parts.append(words[int(rng.integers(len(words)))])
        elif k == 4:
            parts.append("<script type='t'>var x = '<p>' + 1;</script>")
        elif k == 5:
            parts.append("<style>.c { color: red; }</style>")
        else:
            parts.append("<!-- note <b> &amp; -->")
        if rng.integers(3) == 0:
            parts.append(" \t\n"[int(rng.integers(3))] * int(rng.integers(1, 4)))
    return "".join(parts)


def test_fuzz_html_to_text_vs_duckdb_oracle(ray_session):
    """>= 25 random adversarial HTML docs: html_to_text must equal the
    DuckDB regexp_replace/replace replay of HTML_STRIP_STEPS exactly."""
    import duckdb
    import ray.data as rd

    from openmldb_ray.stages.textstats import HTML_STRIP_STEPS, html_to_text

    rng = np.random.default_rng(7)
    docs = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [_rand_html(rng) for _ in range(40)],
    })
    got = html_to_text(rd.from_arrow(
        pa.Table.from_pandas(docs, preserve_index=False))) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    def q(s: str) -> str:
        return s.replace("'", "''")

    expr = "text"
    for pat, rep, is_re in HTML_STRIP_STEPS:
        if is_re:
            expr = f"regexp_replace({expr}, '{q(pat)}', '{q(rep)}', 'g')"
        else:
            expr = f"replace({expr}, '{q(pat)}', '{q(rep)}')"
    con = duckdb.connect()
    con.register("docs", docs)
    want = con.execute(
        f"SELECT doc_id, trim({expr}) AS text FROM docs ORDER BY doc_id"
    ).df()
    assert list(got["text"]) == list(want["text"])
