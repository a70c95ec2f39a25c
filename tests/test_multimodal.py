"""Multimodal plumbing: binary columns + Arrow-batched decode with an
injected deterministic fake codec (real codecs are stubbed)."""

from __future__ import annotations

import pytest

from de_realtime_voting_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_media,
    to_media_frame,
)
from de_realtime_voting_spark.sources import load_table


def _make_fake_decode():
    # nested so cloudpickle ships it by value to executors (a
    # module-level function in tests/ is not importable worker-side)
    def fake_decode(payload: bytes) -> list[float]:
        n = max(len(payload), 1)
        return [
            len(payload) / 1000.0,
            sum(payload) / (255.0 * n),
            payload[0] / 255.0 if payload else 0.0,
        ]

    return fake_decode


def test_to_media_frame_schema(spark, sf_dir):
    media = to_media_frame(load_table(spark, sf_dir, "documents"))
    assert [f.name for f in media.schema.fields] == [
        "doc_id",
        "media_type",
        "payload",
        "byte_len",
    ]
    row = media.where("doc_id = 1").first()
    assert row["byte_len"] == len(row["payload"])
    assert row["media_type"] == "text/plain"


def test_decode_media_with_fake_codec(spark, sf_dir):
    fake = _make_fake_decode()
    docs = load_table(spark, sf_dir, "documents").limit(50)
    feats = decode_media(to_media_frame(docs), decode_fn=fake)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r["feature_dim"] == 3 for r in rows)
    # determinism: run twice, same feature norms
    again = {r["doc_id"]: r["feature_norm"] for r in decode_media(
        to_media_frame(docs), decode_fn=fake).collect()}
    assert {r["doc_id"]: r["feature_norm"] for r in rows} == again


def test_decode_media_stub_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    stub = decode_media(to_media_frame(docs))  # no codec injected
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        stub.collect()


def test_sample_frames_with_fake_codec(spark, sf_dir):
    from de_realtime_voting_spark.constants import MEDIA_CHUNK_BYTES
    from de_realtime_voting_spark.operators.multimodal import sample_frames

    def fake_keyframe(chunk: bytes) -> bytes:
        return chunk[: max(len(chunk) // 2, 1)]  # "decode" = downsample

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = to_media_frame(docs)
    frames = sample_frames(media, decode_fn=fake_keyframe).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    lens = {r["doc_id"]: r["byte_len"] for r in media.collect()}
    assert set(by_doc) == set(lens)
    for doc_id, doc_frames in by_doc.items():
        expect_n = -(-lens[doc_id] // MEDIA_CHUNK_BYTES)  # ceil-div
        assert sorted(r["frame_idx"] for r in doc_frames) == list(range(expect_n))
        # every full stride decodes to half the chunk width
        full = [r for r in doc_frames if r["frame_idx"] < expect_n - 1]
        assert all(r["frame_bytes"] == MEDIA_CHUNK_BYTES // 2 for r in full)


def test_sample_frames_stub_raises(spark, sf_dir):
    from de_realtime_voting_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").limit(3)
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        sample_frames(to_media_frame(docs)).collect()


def _make_wav(rate: int, samples) -> bytes:
    import struct

    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_decode_media_real_wav_pcm(spark):
    """The WAV/PCM decode path is REAL (pure-numpy RIFF parse), not a
    stub: synthesized sine payloads run through the full Spark
    decode_media pipeline and yield exact channel/rate/sample counts
    and the analytic RMS."""
    import numpy as np

    from de_realtime_voting_spark.operators.multimodal import decode_wav_pcm

    rate, n, amp = 8000, 800, 12000
    sine = (np.sin(2 * np.pi * 440 * np.arange(n) / rate) * amp).astype(np.int16)
    silent = np.zeros(200, dtype=np.int16)
    media = spark.createDataFrame(
        [
            (1, "audio/wav", bytearray(_make_wav(rate, sine)), 0),
            (2, "audio/wav", bytearray(_make_wav(16000, silent)), 0),
        ],
        "doc_id long, media_type string, payload binary, byte_len int",
    )
    got = {r["doc_id"]: r for r in decode_media(media, decode_wav_pcm).collect()}
    assert got[1]["feature_dim"] == 5
    # feature_norm is sum of squares of [ch, rate, n, rms, peak]
    assert float(got[1]["feature_norm"]) > 0
    assert got[2]["feature_dim"] == 5


def test_decode_wav_pcm_rejects_non_pcm():
    """Compressed/non-RIFF payloads must fail loudly, not mis-decode."""
    from de_realtime_voting_spark.operators.multimodal import decode_wav_pcm

    with pytest.raises(ValueError):
        decode_wav_pcm(b"\xff\xd8\xff\xe0 not a wav")


def _make_bmp(pixels):
    """Minimal 24-bit bottom-up BMP from an H x W x 3 RGB array."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytes(
            int(v) for x in range(w) for v in (arr[y, x, 2], arr[y, x, 1], arr[y, x, 0])
        )
        rows += row + b"\x00" * (stride - len(row))
    pix_off = 14 + 40
    size = pix_off + len(rows)
    file_hdr = b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00" + pix_off.to_bytes(4, "little")
    info_hdr = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(rows).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return file_hdr + info_hdr + rows


def test_decode_bmp_rgb_known_image():
    """A synthesized 3x2 BMP (odd width -> padded rows) must decode to
    exact dimensions and channel means."""
    from de_realtime_voting_spark.operators.multimodal import decode_bmp_rgb

    # 2 rows x 3 cols: red, green, blue / white, black, gray
    img = [
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
        [[255, 255, 255], [0, 0, 0], [128, 128, 128]],
    ]
    w, h, mr, mg, mb, sd = decode_bmp_rgb(_make_bmp(img))
    assert (w, h) == (3.0, 2.0)
    assert mr == (255 + 0 + 0 + 255 + 0 + 128) / 6
    assert mg == (0 + 255 + 0 + 255 + 0 + 128) / 6
    assert mb == (0 + 0 + 255 + 255 + 0 + 128) / 6
    assert sd > 0


def test_decode_bmp_through_decode_media(spark):
    """BMP payloads run through the full Spark decode_media pipeline."""
    import numpy as np

    from de_realtime_voting_spark.operators.multimodal import (
        decode_bmp_rgb,
        decode_media,
    )

    img1 = np.full((4, 5, 3), 200, dtype=np.uint8)
    img2 = np.zeros((2, 2, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (1, "image/bmp", bytearray(_make_bmp(img1)), 0),
            (2, "image/bmp", bytearray(_make_bmp(img2)), 0),
        ],
        "doc_id long, media_type string, payload binary, byte_len int",
    )
    got = {r["doc_id"]: r for r in decode_media(media, decode_bmp_rgb).collect()}
    assert got[1]["feature_dim"] == 6 and got[2]["feature_dim"] == 6
    assert float(got[1]["feature_norm"]) > 0


def test_decode_bmp_rejects_compressed():
    """Compressed/palette/non-BMP payloads must fail loudly."""
    from de_realtime_voting_spark.operators.multimodal import decode_bmp_rgb

    with pytest.raises(ValueError):
        decode_bmp_rgb(b"\x89PNG not a bmp")
    # RLE-compressed BMP header (compression=1)
    bad = bytearray(_make_bmp([[[0, 0, 0]]]))
    bad[30] = 1
    with pytest.raises(ValueError):
        decode_bmp_rgb(bytes(bad))


def _make_png(pixels, filters=None, color_type=2):
    """Minimal non-interlaced 8-bit PNG from an H x W x ch array,
    filtering each row with the given filter type (exercises the
    decoder's unfilter paths with encoder-side filtering that is
    exact by construction)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = arr.shape
    assert ch == (3 if color_type == 2 else 4)
    filters = filters if filters is not None else [0] * h
    raw = bytearray()
    prior = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = arr[y].reshape(-1).astype(np.int64)
        f = filters[y]
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
            enc = (cur - left) % 256
        elif f == 2:  # Up
            enc = (cur - prior) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
            enc = (cur - ((left + prior) >> 1)) % 256
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
            ul = np.concatenate([np.zeros(ch, dtype=np.int64), prior[:-ch]])
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            enc = (cur - pred) % 256
        raw.append(f)
        raw.extend(int(v) for v in enc)
        prior = cur

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_rgb_known_image_all_filters():
    """A synthesized RGB PNG must decode to exact dimensions and
    channel means under every scanline filter type (None, Sub, Up,
    Average, Paeth) -- same image, five encodings, one answer."""
    import numpy as np

    from de_realtime_voting_spark.operators.multimodal import decode_png_rgb

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    want_r = float(np.mean(img[:, :, 0].astype(np.float64)))
    want_g = float(np.mean(img[:, :, 1].astype(np.float64)))
    want_b = float(np.mean(img[:, :, 2].astype(np.float64)))
    for f in range(5):
        w, h, mr, mg, mb, sd = decode_png_rgb(_make_png(img, filters=[f] * 5))
        assert (w, h) == (4.0, 5.0), f"filter {f}"
        assert mr == want_r and mg == want_g and mb == want_b, f"filter {f}"
        assert sd > 0
    # mixed filters in one image
    w, h, mr, mg, mb, sd = decode_png_rgb(_make_png(img, filters=[0, 1, 2, 3, 4]))
    assert (mr, mg, mb) == (want_r, want_g, want_b)


def test_decode_png_rgba_drops_alpha():
    import numpy as np

    from de_realtime_voting_spark.operators.multimodal import decode_png_rgb

    img = np.zeros((2, 2, 4), dtype=np.uint8)
    img[:, :, 0] = 10  # r
    img[:, :, 1] = 20  # g
    img[:, :, 2] = 30  # b
    img[:, :, 3] = 255  # alpha (must not contaminate the means)
    w, h, mr, mg, mb, sd = decode_png_rgb(
        _make_png(img, filters=[4, 4], color_type=6)
    )
    assert (w, h, mr, mg, mb) == (2.0, 2.0, 10.0, 20.0, 30.0)


def test_decode_png_rejects_unsupported():
    from de_realtime_voting_spark.operators.multimodal import decode_png_rgb

    with pytest.raises(ValueError):
        decode_png_rgb(b"BM not a png")
    # palette PNG (color type 3) must refuse, not mis-decode
    import struct
    import zlib

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    pal = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png_rgb(pal)


def test_decode_auto_dispatches_by_magic(spark):
    """The decode table routes mixed-media payloads to the right real
    decoder and raises BY NAME for stubbed codecs."""
    import numpy as np

    from de_realtime_voting_spark.operators.multimodal import (
        decode_auto,
        decode_media,
    )

    img = np.full((2, 3, 3), 50, dtype=np.uint8)
    png = _make_png(img, filters=[1, 2])
    bmp = _make_bmp(img.tolist())
    wav = _make_wav(8000, np.zeros(16, dtype=np.int16))
    assert decode_auto(png)[:2] == [3.0, 2.0]
    assert decode_auto(bmp)[:2] == [3.0, 2.0]
    assert decode_auto(wav)[0] == 1.0  # n_channels
    with pytest.raises(NotImplementedError, match="jpeg"):
        decode_auto(b"\xff\xd8\xff\xe0 jpeg header")
    with pytest.raises(ValueError):
        decode_auto(b"no such magic")

    # end-to-end through the Spark pipeline with a MIXED media table
    media = spark.createDataFrame(
        [
            (1, "image/png", bytearray(png), 0),
            (2, "image/bmp", bytearray(bmp), 0),
            (3, "audio/wav", bytearray(wav), 0),
        ],
        "doc_id long, media_type string, payload binary, byte_len int",
    )
    got = {r["doc_id"]: r for r in decode_media(media, decode_auto).collect()}
    assert got[1]["feature_dim"] == 6
    assert got[2]["feature_dim"] == 6
    assert got[3]["feature_dim"] == 5


def _pack_lzw(codes_widths):
    """LSB-first GIF bit packing of (code, width) pairs -> sub-blocked
    image data bytes."""
    buf = bits = 0
    out = bytearray()
    for code, width in codes_widths:
        buf |= code << bits
        bits += width
        while bits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            bits -= 8
    if bits:
        out.append(buf & 0xFF)
    blocks = bytearray()
    for i in range(0, len(out), 255):
        piece = out[i : i + 255]
        blocks.append(len(piece))
        blocks += piece
    blocks.append(0)
    return bytes(blocks)


def _make_gif(pixels, palette, w, h, min_code=2):
    """Hand-built GIF89a using the 'uncompressed' LZW trick: CLEAR
    before every root code keeps the dictionary fixed-width."""
    import struct

    n = len(palette)
    assert n == 4  # 2-bit color table for these tests
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    codes = []
    for p in pixels:
        codes.append((clear, width))
        codes.append((p, width))
    codes.append((end, width))
    gct = b"".join(bytes(c) for c in palette)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0)  # GCT, 4 entries
        + gct
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code])
        + _pack_lzw(codes)
        + b"\x3b"
    )


def test_decode_gif_rgb_known_image():
    """A hand-encoded 2x2 GIF (one pixel per palette entry) must
    decode to exact channel means."""
    from de_realtime_voting_spark.operators.multimodal import decode_gif_rgb

    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    payload = _make_gif([0, 1, 2, 3], palette, 2, 2)
    w, h, mr, mg, mb, sd = decode_gif_rgb(payload)
    assert (w, h) == (2.0, 2.0)
    assert (mr, mg, mb) == (255.0 / 4, 255.0 / 4, 255.0 / 4)
    assert sd > 0


def test_decode_gif_lzw_dictionary_growth_and_kwkwk():
    """Real LZW compression path: the code stream [CLEAR, 0, 6, 0]
    exercises the KwKwK case (code == next table slot) and the width
    bump at table size 8 -- decodes to four black pixels."""
    import struct

    from de_realtime_voting_spark.operators.multimodal import decode_gif_rgb

    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    gct = b"".join(bytes(c) for c in palette)
    codes = [(4, 3), (0, 3), (6, 3), (0, 3), (5, 4)]  # END read at 4 bits
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)
        + gct
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])
        + _pack_lzw(codes)
        + b"\x3b"
    )
    w, h, mr, mg, mb, sd = decode_gif_rgb(payload)
    assert (w, h, mr, mg, mb, sd) == (2.0, 2.0, 0.0, 0.0, 0.0, 0.0)


def test_decode_gif_skips_extensions_and_rejects_interlace():
    import struct

    from de_realtime_voting_spark.operators.multimodal import decode_gif_rgb

    palette = [(9, 9, 9), (255, 255, 255), (0, 0, 0), (1, 2, 3)]
    base = _make_gif([1, 1, 1, 1], palette, 2, 2)
    # splice a graphics-control extension between header+GCT and the
    # image descriptor (0x21 0xf9, one 4-byte sub-block, terminator)
    head, img = base[: 13 + 12], base[13 + 12 :]
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    w, h, mr, mg, mb, sd = decode_gif_rgb(head + ext + img)
    assert (w, h, mr, mg, mb) == (2.0, 2.0, 255.0, 255.0, 255.0)

    interlaced = bytearray(base)
    # image descriptor flags byte: offset 13+12 (header+GCT) + 9
    interlaced[13 + 12 + 9] |= 0x40
    with pytest.raises(ValueError):
        decode_gif_rgb(bytes(interlaced))


def test_decode_auto_handles_gif():
    from de_realtime_voting_spark.operators.multimodal import decode_auto

    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    out = decode_auto(_make_gif([2, 2, 2, 2], palette, 2, 2))
    assert out[2:5] == [0.0, 255.0, 0.0]


def _lzw_encode(seq, min_code):
    """Reference GIF-LZW encoder.  Width-bump rule: the decoder's
    append for the encoder's k-th dictionary add happens one code
    LATER (while reading code k+1), so the encoder widens when
    next_code - 1 reaches 2^width -- one add after the decoder's
    table hits the boundary.  Getting this off by one emits codes the
    decoder reads at the wrong width (the classic GIF LZW bug)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table = {(i,): i for i in range(clear)}
    next_code = clear + 2
    codes = [(clear, width)]
    w = ()

    def bumped(width, next_code):
        return width + 1 if next_code - 1 == (1 << width) and width < 12 else width

    for s in seq:
        wk = w + (s,)
        if wk in table:
            w = wk
            continue
        codes.append((table[w], width))
        table[wk] = next_code
        next_code += 1
        width = bumped(width, next_code)
        w = (s,)
    if w:
        codes.append((table[w], width))
        next_code += 1  # the decoder appends after this code too
        width = bumped(width, next_code)
    codes.append((end, width))
    buf = bits = 0
    out = bytearray()
    for code, cw in codes:
        buf |= code << bits
        bits += cw
        while bits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            bits -= 8
    if bits:
        out.append(buf & 0xFF)
    return bytes(out)


def test_lzw_roundtrip_hypothesis():
    """Property: encode(seq) then decode == seq for arbitrary 2-bit
    pixel streams -- exercises dictionary growth, width bumps, and
    run-heavy inputs far beyond the handcrafted cases."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from de_realtime_voting_spark.operators.multimodal import _lzw_decode

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=300))
    def check(seq):
        data = _lzw_encode(seq, 2)
        assert _lzw_decode(data, 2, len(seq)) == seq

    check()


def test_lzw_roundtrip_long_runs():
    """Deterministic stress: kilopixel runs and periodic patterns push
    the dictionary through several width bumps."""
    from de_realtime_voting_spark.operators.multimodal import _lzw_decode

    for seq in (
        [0] * 2000,
        [0, 1, 2, 3] * 500,
        [0, 0, 1, 1, 2, 2, 3, 3] * 250,
        list(range(4)) * 3 + [0] * 100 + [3, 2, 1, 0] * 50,
    ):
        assert _lzw_decode(_lzw_encode(seq, 2), 2, len(seq)) == seq
