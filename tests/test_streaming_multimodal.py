"""Streaming watch job + multimodal decode plumbing."""

import hashlib
import struct
import zlib

from knowledgebase_processor_spark.operators.multimodal import (
    audio_features, decode_image_dims, decode_wav_meta, frame_sample,
    image_features,
)
from pyspark.sql import functions as F

from knowledgebase_processor_spark.streaming.jobs import (
    watch_documents, windowed_event_counts,
)


def _png_bytes(w: int, h: int) -> bytes:
    """A minimal REAL 1-bit grayscale PNG (valid chunks + CRCs)."""
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00" * ((w + 7) // 8) for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _jpeg_bytes(w: int, h: int) -> bytes:
    """A REAL JPEG header prefix through SOF0 (marker walk must skip the
    APP0 and quantization segments before the frame header)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00")
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def _wav_bytes(rate: int, channels: int, seconds: float) -> bytes:
    """A REAL little PCM16 WAV file."""
    bps = 2
    byte_rate = rate * channels * bps
    n_data = int(byte_rate * seconds)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate,
                      channels * bps, 16)
    data = b"\x00" * n_data
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _media(spark):
    return spark.createDataFrame(
        [("img1", "image", _png_bytes(320, 200), "image/png", None, None, None),
         ("img2", "image", b"not-an-image", "image/png", None, None, None),
         ("img3", "image", _jpeg_bytes(640, 480), "image/jpeg", None, None, None),
         ("vid1", "video", b"mp4bytes", "video/mp4", None, None, 3.5),
         ("aud1", "audio", _wav_bytes(8000, 1, 2.0), "audio/wav", None, None, None)],
        "media_id string, kind string, payload binary, mime string, "
        "meta_width long, meta_height long, meta_duration_s double")


def test_header_decoders_on_real_bytes():
    """The container-header kernels parse REAL file bytes (not stubs)."""
    assert decode_image_dims(_png_bytes(320, 200)) == ("png", 320, 200)
    assert decode_image_dims(_jpeg_bytes(640, 480)) == ("jpeg", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 6
    assert decode_image_dims(gif) == ("gif", 12, 34)
    assert decode_image_dims(b"junk") is None
    assert decode_image_dims(b"") is None
    assert decode_wav_meta(_wav_bytes(44100, 2, 1.5)) == (44100, 2, 1.5)
    assert decode_wav_meta(b"RIFFxxxxNOPE") is None
    # truncated headers must not raise
    assert decode_image_dims(_png_bytes(1, 1)[:20]) is None
    assert decode_wav_meta(_wav_bytes(8000, 1, 1.0)[:16]) is None


def test_header_decoders_hostile_bytes_fuzz():
    """Adversarial-probe lane (round-1 discipline): random and
    structure-adjacent hostile byte strings must never raise, never loop,
    and finish fast — including truncations at every prefix length of
    valid files and forged chunk/segment lengths."""
    import random
    import time

    rnd = random.Random(99)
    png, jpg, wav = _png_bytes(5, 7), _jpeg_bytes(9, 3), _wav_bytes(8000, 1, 0.5)
    cases = [bytes(rnd.randrange(256) for _ in range(n))
             for n in (0, 1, 7, 64, 4096) for _ in range(20)]
    cases += [png[:i] for i in range(len(png))]
    cases += [jpg[:i] for i in range(len(jpg))]
    cases += [wav[:i] for i in range(0, len(wav), 97)]
    # forged lengths: JPEG segment len 0 (must still terminate), WAV
    # chunk size 0 and 0xFFFFFFFF (must not loop / overread)
    cases.append(b"\xff\xd8\xff\xe0\x00\x00" + b"\xff" * 64)
    cases.append(b"RIFF\x10\x00\x00\x00WAVE" + b"junk\x00\x00\x00\x00" * 50)
    cases.append(b"RIFF\x10\x00\x00\x00WAVE" + b"fmt \xff\xff\xff\xff" + b"x" * 64)
    t0 = time.perf_counter()
    for b in cases:
        decode_image_dims(b)
        decode_wav_meta(b)
    assert time.perf_counter() - t0 < 5


def test_image_features_real_dims_and_stub_fallback(spark):
    feats = {r["media_id"]: r for r in image_features(_media(spark)).collect()}
    assert set(feats) == {"img1", "img2", "img3"}
    assert (feats["img1"]["format"], feats["img1"]["width"],
            feats["img1"]["height"]) == ("png", 320, 200)
    assert (feats["img3"]["format"], feats["img3"]["width"],
            feats["img3"]["height"]) == ("jpeg", 640, 480)
    # unparseable payload falls back to the disclosed hash stub
    h = hashlib.sha256(b"not-an-image").digest()
    assert feats["img2"]["format"] == "unknown"
    assert feats["img2"]["width"] == 64 + h[0]
    assert len(feats["img1"]["embedding"]) == 8


def test_frame_sampling_fanout(spark):
    frames = frame_sample(_media(spark), every_s=1.0).collect()
    assert len(frames) == 3          # 3.5s video @1fps -> 3 frames
    assert [f["frame_idx"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2]


def test_audio_features_real_wav_meta(spark):
    out = audio_features(_media(spark)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["format"], r["sample_rate"], r["channels"], r["duration_s"]) == \
        ("wav", 8000, 1, 2.0)
    assert len(r["embedding"]) == 16


def test_watch_documents_streaming(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.md").write_text("# Title\n- [ ] task one\n")
    out_dir = str(tmp_path / "triples")
    q = watch_documents(spark, str(src), out_dir, str(tmp_path / "ckpt")).start()
    q.awaitTermination(120)
    t = spark.read.parquet(out_dir)
    assert t.filter("pred like '%isCompleted'").count() == 1

    # second batch: new file appears -> incremental processing
    (src / "b.md").write_text("- [x] done task\n")
    q2 = watch_documents(spark, str(src), out_dir, str(tmp_path / "ckpt")).start()
    q2.awaitTermination(120)
    t2 = spark.read.parquet(out_dir)
    assert t2.filter("pred like '%isCompleted'").count() == 2


def test_windowed_event_counts_batch_parity(spark):
    events = spark.createDataFrame(
        [("2024-01-01 10:05:00", "click", 1.0),
         ("2024-01-01 10:55:00", "click", 2.0),
         ("2024-01-01 11:05:00", "click", 4.0)],
        "ts string, event_type string, value double",
    ).selectExpr("cast(ts as timestamp) ts", "event_type", "value")
    out = {(str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
           for r in windowed_event_counts(events).collect()}
    assert out[("2024-01-01 10:00:00", "click")] == (2, 3.0)
    assert out[("2024-01-01 11:00:00", "click")] == (1, 4.0)


def test_dedup_crawl_stream(spark, tmp_path):
    """Streaming fingerprint-dedup with bounded (watermarked) state: three
    crawls of one url where two carry identical content keep 2 rows."""
    import datetime as dt

    from knowledgebase_processor_spark.streaming.jobs import dedup_crawl_stream

    t = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [("https://a", t, b"", "same content", "en"),
            ("https://a", t + dt.timedelta(hours=1), b"", "same content", "en"),
            ("https://a", t + dt.timedelta(hours=2), b"", "changed content", "en")]
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"

    # batch degeneration: plain dropDuplicates on (url, fingerprint)
    batch = dedup_crawl_stream(spark.createDataFrame(rows, schema))
    assert batch.count() == 2

    # streaming path: file source -> availableNow -> memory sink
    src = tmp_path / "crawl_in"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite") \
        .parquet(str(src / "batch0"))
    stream = spark.readStream.schema(schema).parquet(str(src / "batch0"))
    q = (dedup_crawl_stream(stream).writeStream.format("memory")
         .queryName("dedup_out").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT text FROM dedup_out").collect()
    assert sorted(r.text for r in got) == ["changed content", "same content"]


# ---------------------------------------------------------------------------
# REAL pixel / PCM decode kernels
# ---------------------------------------------------------------------------

def _chunk(tag, data):
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data)))


def _png_with_filters(raster, color_type, filters, palette=b""):
    """Encode a ground-truth raster applying the GIVEN per-row filter
    types (the forward transforms of PNG spec §9) so every decode filter
    path is exercised against known pixels."""
    import numpy as np
    a = np.asarray(raster, dtype=np.int64)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    flat = a.reshape(h, w * ch)
    raw = bytearray()
    prev = [0] * (w * ch)
    for y in range(h):
        f = filters[y % len(filters)]
        recon = [int(v) for v in flat[y]]
        line = []
        for k in range(w * ch):
            left = recon[k - ch] if k >= ch else 0
            up = prev[k]
            ul = prev[k - ch] if k >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            line.append((recon[k] - pred) & 255)
        raw.append(f)
        raw.extend(line)
        prev = recon
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = _chunk(b"IHDR", ihdr)
    if palette:
        body += _chunk(b"PLTE", palette)
    return (b"\x89PNG\r\n\x1a\n" + body
            + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b""))


def test_png_pixel_decode_all_filters_exact():
    """Every scanline filter (None/Sub/Up/Average/Paeth) and every color
    type (gray, RGB, palette, gray+alpha, RGBA) decodes back to the
    exact source raster — REAL pixels, not a stub."""
    import random

    import numpy as np

    from knowledgebase_processor_spark.operators.multimodal import (
        decode_png_pixels)

    rnd = random.Random(7)
    for color_type, ch in [(0, 1), (2, 3), (4, 2), (6, 4)]:
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            h, w = rnd.randrange(1, 9), rnd.randrange(1, 9)
            src = np.array([[ [rnd.randrange(256) for _ in range(ch)]
                              for _ in range(w)] for _ in range(h)],
                           dtype=np.uint8)
            png = _png_with_filters(src, color_type, filters)
            dec = decode_png_pixels(png)
            assert dec is not None, (color_type, filters)
            dw, dh, dch, raster = dec
            assert (dw, dh, dch) == (w, h, ch)
            assert np.array_equal(raster, src), (color_type, filters)
    # indexed color maps through PLTE to RGB
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    png = _png_with_filters(idx, 3, [0, 1], palette=pal)
    dec = decode_png_pixels(png)
    assert dec is not None
    _, _, dch, raster = dec
    assert dch == 3
    assert raster[0, 0].tolist() == [255, 0, 0]
    assert raster[0, 1].tolist() == [0, 255, 0]
    assert raster[1, 0].tolist() == [0, 0, 255]


def test_png_pixel_embedding_known_values():
    """Hand-computed pooled embedding on a 2x2 RGB image."""
    import numpy as np

    from knowledgebase_processor_spark.operators.multimodal import (
        png_pixel_embedding)

    src = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    emb = png_pixel_embedding(_png_with_filters(src, 2, [0]))
    # channel means: r=(255+0+0+255)/4, g=(0+255+0+255)/4, b=(0+0+255+255)/4
    assert emb[:3] == [round(127.5 / 255, 6)] * 3
    # luma per pixel = 85, 85, 85, 255 -> quadrants are the 4 pixels
    assert emb[4:] == [round(85 / 255, 6)] * 3 + [1.0]
    lumas = np.array([85.0, 85, 85, 255])
    assert emb[3] == round(float(lumas.std()) / 255, 6)


def test_png_decode_guards_and_unsupported():
    """Adversarial bounds: huge-dimension headers refuse BEFORE
    allocating, decompression output is capped at the admitted raster
    size, corrupt/interlaced/1-bit streams return None (stub fallback)."""
    import time

    import numpy as np

    from knowledgebase_processor_spark.operators.multimodal import (
        decode_png_pixels)

    ok = _png_with_filters(np.zeros((4, 4), dtype=np.uint8), 0, [0])

    # forged 100k x 100k IHDR: must return None fast, no allocation
    huge = bytearray(ok)
    huge[16:24] = struct.pack(">II", 100_000, 100_000)
    t0 = time.perf_counter()
    assert decode_png_pixels(bytes(huge)) is None
    assert time.perf_counter() - t0 < 0.1

    # zlib bomb: 64MB of zeros claiming to be a 4x4 gray image — inflate
    # is capped at the 20-byte raster, never materializes the bomb
    bomb_idat = zlib.compress(b"\x00" * (64 << 20), 9)
    bomb = (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", bomb_idat) + _chunk(b"IEND", b""))
    t0 = time.perf_counter()
    assert decode_png_pixels(bomb) is None  # len(raw) != expected
    assert time.perf_counter() - t0 < 1.0

    # interlaced / non-8-bit / bad filter byte / short stream / OOB palette
    inter = bytearray(ok); inter[28] = 1           # interlace flag
    assert decode_png_pixels(bytes(inter)) is None
    depth1 = _png_bytes(16, 16)                    # 1-bit fixture above
    assert decode_png_pixels(depth1) is None
    badf = (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(b"\x09\x00"))
            + _chunk(b"IEND", b""))
    assert decode_png_pixels(badf) is None
    assert decode_png_pixels(ok[:40]) is None
    oob = _png_with_filters(np.array([[5]], dtype=np.uint8), 3, [0],
                            palette=bytes([1, 2, 3]))
    assert decode_png_pixels(oob) is None


def test_encode_png_roundtrip_and_frame_reality(spark):
    """encode_png output is a genuine PNG (our decoder and the header
    parser both read it), and frame_sample frames are now real PNGs."""
    import numpy as np

    from knowledgebase_processor_spark.operators.multimodal import (
        decode_image_dims, decode_png_pixels, encode_png, frame_sample)

    rng = np.random.default_rng(3)
    for ch in (1, 3, 4):
        src = rng.integers(0, 256, size=(5, 7, ch), dtype=np.uint8)
        png = encode_png(src)
        assert decode_image_dims(png) == ("png", 7, 5)
        dec = decode_png_pixels(png)
        assert dec is not None and np.array_equal(dec[3], src.reshape(5, 7, ch))

    frames = frame_sample(_media(spark), every_s=1.0).collect()
    assert len(frames) == 3
    for f in frames:
        dec = decode_png_pixels(bytes(f["frame_png"]))
        assert dec is not None and dec[:3] == (8, 8, 3)


def test_wav_pcm_embedding_real_samples():
    """RMS/ZCR computed from the ACTUAL PCM stream: a full-scale square
    wave has RMS ~1 and the expected crossing rate; silence is all
    zeros; stereo channels mix by mean; 8-bit decodes too."""
    import numpy as np

    from knowledgebase_processor_spark.operators.multimodal import (
        decode_wav_samples, wav_pcm_embedding)

    rate, n = 8000, 8000
    # square wave, period 16 samples -> sign change every 8 samples
    sq = np.where(np.arange(n) % 16 < 8, 30000, -30000).astype("<i2")
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", n * 2) + sq.tobytes())
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    emb = wav_pcm_embedding(wav)
    assert len(emb) == 16
    rms, zcr = emb[0], emb[1]
    assert abs(rms - 30000 / 32768) < 1e-6
    assert abs(zcr - 1 / 8) < 0.01
    # silence fixture from above
    sil = wav_pcm_embedding(_wav_bytes(8000, 1, 1.0))
    assert sil == [0.0] * 16
    # stereo: L = +16384, R = -16384 -> mono mean = 0 everywhere
    st = np.empty(2 * 1000, dtype="<i2")
    st[0::2], st[1::2] = 16384, -16384
    fmt2 = struct.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
    body2 = (b"WAVEfmt " + struct.pack("<I", len(fmt2)) + fmt2
             + b"data" + struct.pack("<I", st.nbytes) + st.tobytes())
    s = decode_wav_samples(b"RIFF" + struct.pack("<I", len(body2)) + body2)
    assert s is not None and np.all(s == 0.0)
    # 8-bit unsigned: constant 192 -> (192-128)/128 = 0.5
    fmt3 = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    body3 = (b"WAVEfmt " + struct.pack("<I", len(fmt3)) + fmt3
             + b"data" + struct.pack("<I", 100) + bytes([192] * 100))
    s8 = decode_wav_samples(b"RIFF" + struct.pack("<I", len(body3)) + body3)
    assert s8 is not None and np.allclose(s8, 0.5)
    # non-PCM (format 3 = IEEE float) -> None (stub fallback)
    fmtf = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    bodyf = (b"WAVEfmt " + struct.pack("<I", len(fmtf)) + fmtf
             + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    assert wav_pcm_embedding(b"RIFF" + struct.pack("<I", len(bodyf)) + bodyf) is None
    # forged data size: only bytes present are read, no big allocation
    forged = (b"RIFF\x24\x00\x00\x00WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", 0xFFFFFFF0) + b"\x00\x00" * 4)
    s4 = decode_wav_samples(forged)
    assert s4 is not None and len(s4) == 4


def test_feature_udfs_report_embedding_kind(spark):
    """The mapInPandas operators route decodable payloads through the
    REAL kernels and only fall back to the disclosed stub otherwise."""
    import numpy as np

    from knowledgebase_processor_spark.operators.multimodal import (
        encode_png, image_features, audio_features, png_pixel_embedding,
        wav_pcm_embedding)

    rng = np.random.default_rng(11)
    png8 = encode_png(rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8))
    wav = _wav_bytes(8000, 1, 0.5)
    media = spark.createDataFrame(
        [("p8", "image", png8, "image/png", None, None, None),
         ("p1", "image", _png_bytes(16, 16), "image/png", None, None, None),
         ("j1", "image", _jpeg_bytes(32, 32), "image/jpeg", None, None, None),
         ("a1", "audio", wav, "audio/wav", None, None, None)],
        "media_id string, kind string, payload binary, mime string, "
        "meta_width long, meta_height long, meta_duration_s double")
    imgs = {r["media_id"]: r for r in image_features(media).collect()}
    assert imgs["p8"]["embedding_kind"] == "pixels"
    assert imgs["p8"]["embedding"] == png_pixel_embedding(png8)
    assert imgs["p1"]["embedding_kind"] == "hash-stub"   # 1-bit depth
    assert imgs["j1"]["embedding_kind"] == "hash-stub"   # JPEG: disclosed
    auds = {r["media_id"]: r for r in audio_features(media).collect()}
    assert auds["a1"]["embedding_kind"] == "pcm"
    assert auds["a1"]["embedding"] == wav_pcm_embedding(wav)


def test_frame_sample_forged_duration_cap(spark):
    """A crawled row with a forged multi-year duration must not expand
    into an unbounded in-memory frame list (review fix): the fan-out is
    capped at max_frames."""
    vid = spark.createDataFrame(
        [("v", "video", b"x", "video/mp4", None, None, 1.0e12)],
        "media_id string, kind string, payload binary, mime string, "
        "meta_width long, meta_height long, meta_duration_s double")
    assert frame_sample(vid, every_s=1.0, max_frames=50).count() == 50


def test_screen_crawl_stream_against_index(spark, tmp_path):
    """Streaming incremental dedup: a micro-batched crawl feed is probed
    against a static corpus LSH index; re-crawls land in matches, novel
    pages in the novel sink."""
    from knowledgebase_processor_spark.operators.dedup import lsh_index
    from knowledgebase_processor_spark.streaming.jobs import (
        screen_crawl_stream)

    corpus = spark.createDataFrame(
        [("c1", "the quick brown fox jumps over the lazy dog near the "
                "river bank at dawn every single day"),
         ("c2", "spark structured streaming joins a static index frame "
                "inside each micro batch without drift")],
        "doc_id string, text string")
    idx = lsh_index(corpus)

    src = tmp_path / "feed"
    src.mkdir()
    batch = spark.createDataFrame(
        [("n1", "the quick brown fox jumps over the lazy dog near the "
                "river bank at dawn every single day"),       # re-crawl
         ("n2", "a completely new page about winnowed fingerprints and "
                "containment scoring over shared hashes")],   # novel
        "doc_id string, text string")
    batch.coalesce(1).write.parquet(str(src / "b0"))
    stream = spark.readStream.schema("doc_id string, text string") \
                  .parquet(str(src / "b0"))
    q = screen_crawl_stream(stream, idx, str(tmp_path / "matches"),
                            str(tmp_path / "novel"),
                            str(tmp_path / "ckpt")).start()
    q.awaitTermination(120)
    matches = spark.read.parquet(str(tmp_path / "matches")).collect()
    novel = spark.read.parquet(str(tmp_path / "novel")).collect()
    assert [(r.doc_id, r.dup_of) for r in matches] == [("n1", "c1")]
    assert [r.doc_id for r in novel] == ["n2"]


def test_gif_lzw_roundtrip_and_features(spark):
    import numpy as np
    from knowledgebase_processor_spark.operators.multimodal import (
        decode_gif_pixels, encode_gif, gif_pixel_embedding,
        png_pixel_embedding, encode_png, image_features)
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.randint(0, 256, (23, 17)).astype(np.uint8)
    gif = encode_gif(idx, pal)
    dec = decode_gif_pixels(gif)
    assert dec is not None
    w, h, ch, raster = dec
    assert (w, h, ch) == (17, 23, 3)
    assert np.array_equal(raster, pal[idx])

    # large image: multiple 255-byte sub-blocks + code-width growth + the
    # mid-stream clear reset (4096-entry dictionary rolls over)
    big = rng.randint(0, 256, (80, 80)).astype(np.uint8)
    dec2 = decode_gif_pixels(encode_gif(big, pal))
    assert dec2 is not None and np.array_equal(dec2[3], pal[big])

    # the pooled embedding matches PNG's on the identical raster
    rgb = pal[idx]
    assert gif_pixel_embedding(gif) == png_pixel_embedding(encode_png(rgb))

    # interlaced: write rows in interlace order and set the flag
    order = [r for f, s in ((0, 8), (4, 8), (2, 4), (1, 2))
             for r in range(f, 23, s)]
    ilaced = bytearray(encode_gif(idx[order], pal))
    desc_at = ilaced.index(0x2C, 13 + 768)          # descriptor after GCT
    ilaced[desc_at + 9] |= 0x40                     # interlace flag
    dec3 = decode_gif_pixels(bytes(ilaced))
    assert dec3 is not None and np.array_equal(dec3[3], pal[idx])

    # hostile: truncation, index past palette, pixel bomb all -> None
    assert decode_gif_pixels(gif[:40]) is None
    small_pal = np.zeros((2, 3), np.uint8)
    bad = encode_gif(np.full((4, 4), 7, np.uint8), small_pal)
    assert decode_gif_pixels(bad) is None
    assert decode_gif_pixels(encode_gif(idx, pal), max_pixels=10) is None

    # image_features routes gif payloads through the REAL decode path
    m = spark.createDataFrame(
        [("g1", "image", gif, "image/gif", None, None, None)],
        "media_id string, kind string, payload binary, mime string, "
        "meta_width long, meta_height long, meta_duration_s double")
    row = image_features(m).collect()[0]
    assert (row["format"], row["width"], row["height"],
            row["embedding_kind"]) == ("gif", 17, 23, "pixels")


def test_frame_sample_real_mjpeg_avi(spark):
    """MJPEG-in-AVI videos take the REAL decode path: RIFF meta (not the
    metadata column — it is NULL here) drives the sampling grid, and each
    emitted PNG re-encodes the ACTUAL decoded JPEG frame raster
    (frame_kind 'pixels'); non-AVI payloads keep the disclosed stub."""
    import numpy as np

    from knowledgebase_processor_spark.operators.multimodal import (
        decode_avi_meta, decode_png_pixels, encode_avi_mjpeg, frame_sample)

    # smooth horizontal ramps compress near-losslessly -> tight bound
    rasters = [np.tile((np.arange(16) * 8 + k * 10).astype(np.uint8)
                       .reshape(1, 16, 1), (16, 1, 3)) for k in range(8)]
    avi = encode_avi_mjpeg(rasters, fps=2.0)        # 8 frames @2fps = 4s
    assert decode_avi_meta(avi) == (2.0, 8, 16, 16)

    media = spark.createDataFrame(
        [("v", "video", avi, "video/x-msvideo", None, None, None),
         ("s", "video", b"mp4bytes", "video/mp4", None, None, 2.0)],
        "media_id string, kind string, payload binary, mime string, "
        "meta_width long, meta_height long, meta_duration_s double")
    rows = {(r["media_id"], r["frame_idx"]): r
            for r in frame_sample(media, every_s=1.0).collect()}

    # 4s sampled every 1s -> 4 rows, mapped to source frames 0,2,4,6
    vid_rows = [rows[("v", i)] for i in range(4)]
    assert all(r["frame_kind"] == "pixels" for r in vid_rows)
    for i, r in enumerate(vid_rows):
        dec = decode_png_pixels(bytes(r["frame_png"]))
        assert dec is not None and dec[:3] == (16, 16, 3)
        src = rasters[2 * i].astype(int)
        assert np.abs(dec[3].astype(int) - src).mean() < 8.0

    stub = [rows[("s", i)] for i in range(2)]
    assert all(r["frame_kind"] == "hash-stub" for r in stub)


def test_decontaminate_crawl_stream(spark, tmp_path):
    from knowledgebase_processor_spark.streaming.jobs import (
        decontaminate_crawl_stream)
    src = tmp_path / "feed"
    src.mkdir()
    leak = "the quick brown fox jumps over the lazy dog tonight"
    (src / "dirty.txt").write_text(f"intro words then {leak} and a tail")
    (src / "clean.txt").write_text(
        "a completely unrelated page about spark shuffles and joins here")
    bench = spark.createDataFrame([(f"eval question: {leak}?",)],
                                  "text string")
    stream = (spark.readStream.format("text").option("wholetext", "true")
              .load(str(src))
              .select(F.input_file_name().alias("doc_id"),
                      F.col("value").alias("text")))
    clean_dir, flagged_dir = str(tmp_path / "clean"), str(tmp_path / "flag")
    q = decontaminate_crawl_stream(
        stream, bench, clean_dir, flagged_dir, str(tmp_path / "ck"),
        n=8).start()
    q.awaitTermination(120)
    flagged = spark.read.parquet(flagged_dir).collect()
    assert len(flagged) == 1 and "dirty" in flagged[0]["doc_id"]
    assert flagged[0]["n_hits"] >= 1
    clean = spark.read.parquet(clean_dir).collect()
    assert len(clean) == 1 and "clean" in clean[0]["doc_id"]


def test_mp4_header_roundtrip():
    """decode_mp4_meta reads REAL ISO-BMFF moov boxes: duration, fps,
    frame count, 16.16 display size, and sample-entry codec fourcc —
    pure stdlib struct, no codec work.  encode_mp4_stub is the
    header-only inverse fixture (valid box tree, empty mdat)."""
    from knowledgebase_processor_spark.operators.multimodal import (
        decode_mp4_meta, encode_mp4_stub)

    meta = decode_mp4_meta(encode_mp4_stub(640, 360, 25.0, 250, b"avc1"))
    assert meta == (10.0, 25.0, 250, 640, 360, "avc1")
    meta = decode_mp4_meta(encode_mp4_stub(1280, 720, 30.0, 60, b"av01"))
    assert meta == (2.0, 30.0, 60, 1280, 720, "av01")

    # robustness: not-BMFF, empty, truncated mid-box, forged huge size
    assert decode_mp4_meta(b"junkjunkjunkjunkjunk") is None
    assert decode_mp4_meta(b"") is None
    assert decode_mp4_meta(encode_mp4_stub(640, 360, 25.0, 250)[:40]) is None
    forged = bytearray(encode_mp4_stub(64, 64, 10.0, 5))
    forged[0:4] = (2 ** 31).to_bytes(4, "big")     # ftyp claims 2 GiB
    # the forged size walks past the buffer end: no hang, no parse
    assert decode_mp4_meta(bytes(forged)) is None

    # multi-track file: the FIRST video trak's metadata wins (ffprobe
    # convention), not the last-scanned one
    one = encode_mp4_stub(640, 360, 25.0, 250, b"avc1")
    two = encode_mp4_stub(1280, 720, 30.0, 60, b"av01")
    # splice trak #2 of file two into file one's moov: rebuild moov with
    # both traks (mvhd + trak1 + trak2), fixing the box length
    import struct as _s

    def _moov(buf):
        i = 0
        while i + 8 <= len(buf):
            ln, = _s.unpack_from(">I", buf, i)
            if buf[i + 4:i + 8] == b"moov":
                return i, ln
            i += max(ln, 8)
        raise AssertionError("no moov")

    o1, l1 = _moov(one)
    o2, l2 = _moov(two)
    trak2 = None
    j = o2 + 8
    while j + 8 <= o2 + l2:
        ln, = _s.unpack_from(">I", two, j)
        if two[j + 4:j + 8] == b"trak":
            trak2 = two[j:j + ln]
            break
        j += max(ln, 8)
    assert trak2 is not None
    moov_body = one[o1 + 8:o1 + l1] + trak2
    spliced = (one[:o1] + _s.pack(">I", 8 + len(moov_body)) + b"moov"
               + moov_body + one[o1 + l1:])
    assert decode_mp4_meta(spliced) == (10.0, 25.0, 250, 640, 360, "avc1")


def test_video_container_features(spark):
    """One mapInPandas pass reports REAL container properties for both
    RIFF AVI and ISO-BMFF payloads; unparseable bytes keep catalog
    metadata flagged meta_kind='opaque' (no fabricated numbers)."""
    import numpy as np

    from knowledgebase_processor_spark.operators.multimodal import (
        encode_avi_mjpeg, encode_mp4_stub, video_container_features)

    rasters = [np.full((8, 8, 3), k * 20, np.uint8) for k in range(6)]
    avi = encode_avi_mjpeg(rasters, fps=3.0)
    mp4 = encode_mp4_stub(320, 240, 24.0, 48, b"hvc1")
    media = spark.createDataFrame(
        [("a", "video", avi, "video/x-msvideo", None, None, None),
         ("m", "video", mp4, "video/mp4", None, None, None),
         ("x", "video", b"opaque-bytes", "video/webm", None, None, 7.5),
         ("i", "image", b"\x89PNG", "image/png", None, None, None)],
        "media_id string, kind string, payload binary, mime string, "
        "meta_width long, meta_height long, meta_duration_s double")
    rows = {r["media_id"]: r
            for r in video_container_features(media).collect()}
    assert set(rows) == {"a", "m", "x"}          # images filtered out
    a = rows["a"]
    assert (a["container"], a["codec"], a["n_frames"], a["width"],
            a["height"], a["meta_kind"]) == ("avi", "MJPG", 6, 8, 8,
                                             "headers")
    assert abs(a["fps"] - 3.0) < 1e-6 and abs(a["duration_s"] - 2.0) < 1e-6
    m = rows["m"]
    assert (m["container"], m["codec"], m["fps"], m["n_frames"],
            m["width"], m["height"], m["duration_s"], m["meta_kind"]) == \
        ("mp4", "hvc1", 24.0, 48, 320, 240, 2.0, "headers")
    x = rows["x"]
    assert (x["container"], x["codec"], x["meta_kind"],
            x["duration_s"]) == ("unknown", None, "opaque", 7.5)


def test_frame_sample_mp4_duration(spark):
    """frame_sample cannot decode inter-frame codecs (disclosed stub),
    but an MP4 payload's REAL moov duration still drives the stub
    sampling grid — 4 s at every_s=1 -> 4 stub frames, even though the
    catalog metadata column is NULL."""
    from knowledgebase_processor_spark.operators.multimodal import (
        encode_mp4_stub, frame_sample)

    mp4 = encode_mp4_stub(640, 360, 25.0, 100, b"avc1")   # 4 s
    media = spark.createDataFrame(
        [("m", "video", mp4, "video/mp4", None, None, None)],
        "media_id string, kind string, payload binary, mime string, "
        "meta_width long, meta_height long, meta_duration_s double")
    rows = frame_sample(media, every_s=1.0).collect()
    assert len(rows) == 4
    assert all(r["frame_kind"] == "hash-stub" for r in rows)
