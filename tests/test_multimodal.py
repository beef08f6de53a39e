"""Multimodal plumbing tests: schema, Arrow-batch UDF signatures,
determinism, and 1→N frame explode — with stubbed codecs."""

from __future__ import annotations

import hashlib

import pytest

from curator_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.media_fixture(spark, n=64)


def test_image_features_schema_and_determinism(media):
    out = mm.image_features(media.filter("modality = 'image'"))
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 22
    for r in rows.values():
        assert r.n_bytes > 0 and len(r.sha256) == 64
        # incompressible random blobs can exceed 1.0 (zlib framing overhead)
        assert 0 < r.entropy_proxy <= 2.0
        assert r.feature is not None and len(r.feature) == mm.FEATURE_DIM
        assert r.thumb_w is not None and r.thumb_w <= mm.THUMB_MAX
    rows2 = {r.media_id: r for r in mm.image_features(
        media.filter("modality = 'image'")).collect()}
    assert {k: v.sha256 for k, v in rows.items()} == \
        {k: v.sha256 for k, v in rows2.items()}
    assert {k: tuple(v.feature) for k, v in rows.items()} == \
        {k: tuple(v.feature) for k, v in rows2.items()}


def test_feature_matches_local_stub(media):
    r = (mm.image_features(media.filter("media_id = 'm-00000'"))
         .collect()[0])
    blob = bytes(media.filter("media_id = 'm-00000'").collect()[0].content)
    assert r.sha256 == hashlib.sha256(blob).hexdigest()
    assert r.entropy_proxy == mm._entropy_proxy(blob)


def test_frame_sampling_explodes(media):
    frames = mm.sample_frames(media, every_ms=1000, max_frames=16).collect()
    assert frames, "expected sampled frames"
    by_media: dict[str, list] = {}
    for f in frames:
        by_media.setdefault(f.media_id, []).append(f)
    vids = {r.media_id: r for r in media.filter("modality = 'video'").collect()}
    for mid, fs in by_media.items():
        dur = vids[mid].duration_ms
        assert len(fs) == min(16, dur // 1000)
        idxs = sorted(f.frame_idx for f in fs)
        assert idxs == list(range(len(fs)))
        assert all(f.frame_ts_ms == f.frame_idx * 1000 for f in fs)


def test_blob_pruned_from_feature_output(media):
    out = mm.image_features(media)
    assert "content" not in out.columns  # blobs never flow downstream


def test_audio_features_deterministic(spark):
    from curator_spark.operators.multimodal import audio_features, media_fixture
    media = media_fixture(spark, n=24)
    out = audio_features(media).toPandas().sort_values("media_id")
    assert len(out) == 8  # every 3rd fixture row is audio
    assert out["n_samples"].notna().all()
    assert ((out["rms"] >= 0) & (out["rms"] <= 1)).all()
    assert ((out["zero_cross_rate"] >= 0) & (out["zero_cross_rate"] <= 1)).all()
    # pure function of the payload: re-run identical
    again = audio_features(media).toPandas().sort_values("media_id")
    assert out.reset_index(drop=True).equals(again.reset_index(drop=True))


def test_resize_images_shape_and_determinism(spark):
    from curator_spark.operators.multimodal import media_fixture, resize_images
    media = media_fixture(spark, n=24)
    out = resize_images(media, out_w=8, out_h=4).toPandas().sort_values("media_id")
    assert len(out) == 8
    assert (out["out_w"] == 8).all() and (out["out_h"] == 4).all()
    assert all(len(p) == 8 * 4 * 3 for p in out["pixels"])
    again = resize_images(media, out_w=8, out_h=4).toPandas().sort_values("media_id")
    assert [bytes(p) for p in out["pixels"]] == [bytes(p) for p in again["pixels"]]


def test_error_rows_null_out_never_fail(spark):
    """The error-row contract across all three per-row kernels: an
    empty payload yields a null row, never a task failure."""
    import pyspark.sql.types as T

    from curator_spark.operators.multimodal import (
        MEDIA_SCHEMA, audio_features, image_features, resize_images)
    rows = [("bad-img", "image", "image/png", bytearray(b""), 8, 8, None),
            ("bad-aud", "audio", "audio/wav", None, None, None, 1000)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    img = image_features(media.filter("modality = 'image'")).collect()
    assert len(img) == 1 and img[0].feature is None and img[0].n_bytes == 0
    rz = resize_images(media).collect()
    assert len(rz) == 1 and rz[0].pixels is None and rz[0].src_w is None
    aud = audio_features(media).collect()
    assert len(aud) == 1 and aud[0].rms is None


def test_real_wav_payload_decodes_for_real(spark):
    """A genuine RIFF/WAVE payload takes the stdlib-wave codec path:
    n_samples and rms must match numpy computed on the source signal —
    not the hash-stub's fabricated waveform."""
    import io
    import wave as wavemod

    import numpy as np

    from curator_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                    audio_features)

    sr, n = 8000, 1600
    t = np.arange(n) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    pcm = (sig * 32767).astype("<i2")
    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    payload = buf.getvalue()

    media = spark.createDataFrame(
        [("wav-1", "audio", "audio/wav", bytearray(payload),
          None, None, 200)], MEDIA_SCHEMA)
    row = audio_features(media).collect()[0]
    assert row.n_samples == n
    expect_rms = float(np.sqrt(np.mean((pcm.astype(np.float32) / 32768.0) ** 2)))
    assert abs(row.rms - expect_rms) < 1e-6


def test_real_image_payload_without_codec_yields_null_row(spark):
    """A real PNG payload with Pillow absent must become a null feature
    row (error-row contract), never a task failure; with Pillow present
    it must decode. Either way the job completes."""
    from curator_spark.operators import multimodal as mm

    png_stub = b"\x89PNG\r\n\x1a\n" + b"not-actually-a-full-png"
    media = spark.createDataFrame(
        [("png-1", "image", "image/png", bytearray(png_stub), 16, 16, None)],
        mm.MEDIA_SCHEMA)
    row = mm.image_features(media).collect()[0]
    assert row.n_bytes == len(png_stub)
    if mm._PILImage is None:
        assert row.feature is None and row.thumb_w is None
    # (with Pillow installed this truncated PNG is undecodable too →
    # still a null row; a full round-trip decode test would require a
    # valid encoder, i.e. Pillow itself)


def test_synthetic_payloads_never_hit_real_codec_paths():
    """Fixture payloads are hash-derived; none may accidentally carry a
    real container signature (which would re-route them to the codec
    path and destabilize goldens)."""
    import hashlib

    from curator_spark.operators.multimodal import (_is_real_image,
                                                    _is_real_wav)
    for seed in (5,):
        for i in range(256):
            h = hashlib.sha256(f"media-{seed}-{i}".encode()).digest()
            blob = bytes(h * (1 + i % 7))
            assert not _is_real_image(blob) and not _is_real_wav(blob)


def test_truncated_wav_payload_yields_null_row(spark):
    """RIFF/WAVE payloads that fail mid-parse (truncated header, odd
    data length) must honor the error-row contract — null stats, never
    a task failure."""
    from curator_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                    audio_features)

    truncated = b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00"
    media = spark.createDataFrame(
        [("bad-wav", "audio", "audio/wav", bytearray(truncated),
          None, None, 100)], MEDIA_SCHEMA)
    row = audio_features(media).collect()[0]
    assert row.n_bytes == len(truncated)
    assert row.n_samples is None and row.rms is None


def test_phash_kernel_properties(media):
    """aHash: deterministic per payload, 64-bit packed, error-row
    contract for undecodable payloads; pixel-level sensitivity — a
    small perturbation moves few bits, an inversion moves most."""
    import numpy as np
    out = {r.media_id: r for r in mm.image_phash(media).collect()}
    out2 = {r.media_id: r for r in mm.image_phash(media).collect()}
    assert out.keys() == out2.keys() and len(out) == 22
    for k, r in out.items():
        assert r.ok and r.phash is not None
        assert out2[k].phash == r.phash
        assert -(1 << 63) <= r.phash < (1 << 63)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    near = px.copy()
    near[:2, :2] = 255 - near[:2, :2]          # one 8×8 cell region
    far = (255 - px).astype(np.uint8)
    h0, h1, h2 = (mm._ahash_pixels(p) for p in (px, near, far))
    assert ham(h0, h1) <= 4 and ham(h0, h2) >= 32


def test_phash_neardup_pairs_match_bruteforce(spark):
    """Exact-recall claim checked against brute force: with
    n_bands = max_hamming + 1 the banded equi-join surfaces EVERY pair
    within the threshold, and the bit_count verify passes exactly the
    right ones."""
    import itertools
    import random
    rnd = random.Random(13)
    hashes = {}
    for i in range(40):
        hashes[f"r-{i:03d}"] = rnd.getrandbits(64)
    base = rnd.getrandbits(64)
    hashes["p-base"] = base
    for d in (1, 2, 3, 4):                      # planted at hamming d
        v = base
        for bit in rnd.sample(range(64), d):
            v ^= 1 << bit
        hashes[f"p-ham{d}"] = v
    hashes["p-dup"] = base                      # exact duplicate

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    df = spark.createDataFrame(
        [(k, signed(v), True) for k, v in hashes.items()],
        schema=mm.AHASH_SCHEMA)
    got = {(r.id_a, r.id_b): r.hamming
           for r in mm.phash_neardup_pairs(df, max_hamming=3).collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    want = {tuple(sorted((x, y))): ham(hashes[x], hashes[y])
            for x, y in itertools.combinations(hashes, 2)
            if ham(hashes[x], hashes[y]) <= 3}
    assert got == want
    assert ("p-base", "p-dup") in got and got[("p-base", "p-dup")] == 0
    assert ("p-base", "p-ham3") in got
    assert ("p-base", "p-ham4") not in got      # beyond threshold

    with pytest.raises(ValueError, match="pigeonhole"):
        mm.phash_neardup_pairs(df, max_hamming=3, n_bands=3)


# ------------------------------------------------- audio fingerprinting

def _wav_bytes(samples, rate=8000):
    import io as _io
    import wave as _wave
    import numpy as _np
    pcm = (_np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm)
    return buf.getvalue()


def _tone(freq, n=8000, rate=8000, noise=0.0, seed=0):
    import numpy as _np
    t = _np.arange(n) / rate
    x = _np.sin(2 * _np.pi * freq * t)
    if noise:
        x = x + noise * _np.random.RandomState(seed).randn(n)
    return x * 0.8


def test_audio_fingerprint_similarity_structure(spark):
    """Same tone ± small noise → small Hamming distance; different
    frequencies → large; amplitude scaling → identical fingerprint."""
    from curator_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                    audio_fingerprint,
                                                    phash_neardup_pairs)
    rows = [
        ("a-base", "audio", "audio/wav",
         bytearray(_wav_bytes(_tone(440))), None, None, 1000),
        ("a-noisy", "audio", "audio/wav",
         bytearray(_wav_bytes(_tone(440, noise=0.01))), None, None, 1000),
        ("a-half", "audio", "audio/wav",
         bytearray(_wav_bytes(_tone(440) * 0.5)), None, None, 1000),
        ("a-other", "audio", "audio/wav",
         bytearray(_wav_bytes(_tone(1800))), None, None, 1000),
        ("a-bad", "audio", "audio/wav", bytearray(b""), None, None, 1000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    fp = {r["media_id"]: r for r in audio_fingerprint(media).collect()}
    assert not fp["a-bad"]["ok"]
    assert fp["a-base"]["ok"]
    ham = lambda a, b: bin((fp[a]["phash"] ^ fp[b]["phash"])
                           & ((1 << 64) - 1)).count("1")
    assert ham("a-base", "a-half") == 0          # scale-invariant
    assert ham("a-base", "a-noisy") <= 6         # near-dup
    assert ham("a-base", "a-other") > 10         # different content
    # the shared banded joiner surfaces the planted near-dup pair
    pairs = phash_neardup_pairs(audio_fingerprint(media),
                                max_hamming=6, n_bands=8).toPandas()
    got = {tuple(sorted((r.id_a, r.id_b))) for r in pairs.itertuples()}
    assert ("a-base", "a-half") in got
    assert ("a-base", "a-noisy") in got
    assert ("a-base", "a-other") not in got


def test_audio_fingerprint_deterministic(spark):
    from curator_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                    audio_fingerprint)
    rows = [("a-0", "audio", "audio/wav",
             bytearray(_wav_bytes(_tone(600))), None, None, 1000)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    a = audio_fingerprint(media).collect()[0]["phash"]
    b = audio_fingerprint(media.repartition(3)).collect()[0]["phash"]
    assert a == b


def test_video_neardup_pairs(spark):
    """Byte-identical payloads (the stub codec's collision class) pair
    with full overlap; distinct footage doesn't; a degenerate frame
    shared everywhere is droppable via the fan-out cap."""
    from curator_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                    sample_frames,
                                                    video_neardup_pairs)
    blob_a = bytearray(b"\x01" * 400)
    rows = [
        ("v-a1", "video", "video/mp4", blob_a, None, None, 8000),
        ("v-a2", "video", "video/mp4", bytearray(blob_a), None, None, 8000),
        ("v-b", "video", "video/mp4", bytearray(b"\x02" * 400),
         None, None, 8000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sample_frames(media, every_ms=1000, max_frames=8)
    pairs = video_neardup_pairs(frames, min_shared=3).toPandas()
    assert len(pairs) == 1
    r = pairs.iloc[0]
    assert (r["id_a"], r["id_b"]) == ("v-a1", "v-a2")
    assert r["n_shared"] == 8 and r["overlap_pm"] == 1000
    # fan-out cap: dropping hashes shared by >1 video kills the pair
    assert len(video_neardup_pairs(frames, min_shared=1,
                                   max_frame_count=1).toPandas()) == 0


def _png_with_filters(px, filters):
    """Test-local PNG writer that exercises CHOSEN per-row filter
    types (the package encoder always writes filter 0): encodes HxWxC
    uint8 with the spec's filter math so decode must reverse it."""
    import struct
    import zlib as _z

    import numpy as _np
    h, w, c = px.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]
    rows = []
    prev = _np.zeros(w * c, dtype=_np.int32)
    for y in range(h):
        cur = px[y].reshape(-1).astype(_np.int32)
        f = filters[y % len(filters)]
        left = _np.concatenate([_np.zeros(c, _np.int32), cur[:-c]])
        upleft = _np.concatenate([_np.zeros(c, _np.int32), prev[:-c]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = (abs(p - left), abs(p - prev), abs(p - upleft))
            pred = _np.where((pa <= pb) & (pa <= pc), left,
                             _np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        rows.append(bytes([f]) + (enc & 0xFF).astype(_np.uint8).tobytes())
        prev = cur

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", _z.crc32(t + d)))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype,
                                         0, 0, 0))
            + chunk(b"IDAT", _z.compress(b"".join(rows)))
            + chunk(b"IEND", b""))


def test_pure_png_roundtrip_all_filters():
    """decode_png must reverse every spec filter type (None/Sub/Up/
    Average/Paeth) for RGB and RGBA, and expand grayscale — byte-exact
    pixels with NO Pillow anywhere on the path."""
    import numpy as np

    from curator_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (11, 9, 3), dtype=np.uint8)
    # package encoder (filter 0) round-trips
    assert (decode_png(encode_png(rgb)) == rgb).all()
    # every filter type round-trips
    for filts in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert (decode_png(_png_with_filters(rgb, filts)) == rgb).all()
    # RGBA: alpha dropped (Pillow convert('RGB') behavior)
    rgba = rng.randint(0, 256, (6, 8, 4), dtype=np.uint8)
    assert (decode_png(_png_with_filters(rgba, [4])) == rgba[:, :, :3]).all()
    # grayscale expands to RGB
    gray = rng.randint(0, 256, (5, 7, 1), dtype=np.uint8)
    out = decode_png(_png_with_filters(gray, [2]))
    assert (out == np.repeat(gray, 3, axis=2)).all()


def test_real_png_payload_decodes_without_pillow(spark):
    """The round-4 gap: a VALID real PNG payload must decode for real
    in this sandbox (no Pillow) — image_features reports the true
    dimensions, not a null row, and resize produces real pixels."""
    import numpy as np

    from curator_spark.operators import multimodal as mm

    rng = np.random.RandomState(13)
    px = rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
    payload = mm.encode_png(px)
    media = spark.createDataFrame(
        [("png-real", "image", "image/png", bytearray(payload),
          None, None, None)], mm.MEDIA_SCHEMA)
    row = mm.image_features(media).collect()[0]
    assert row.n_bytes == len(payload)
    assert (row.thumb_w, row.thumb_h) != (None, None)
    assert row.feature is not None and len(row.feature) == mm.FEATURE_DIM
    rz = mm.resize_images(media, 8, 8).collect()[0]
    assert (rz.src_w, rz.src_h) == (32, 24)
    assert rz.out_w == 8 and rz.out_h == 8 and len(rz.pixels) == 8 * 8 * 3


def test_unsupported_png_shapes_null_row_not_crash(spark):
    """Palette / 16-bit / interlaced PNGs stay outside the pure lane —
    error-row contract (null features), never a task failure."""
    import struct
    import zlib as _z

    from curator_spark.operators import multimodal as mm

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", _z.crc32(t + d)))

    palette = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3,
                                            0, 0, 0))
               + chunk(b"PLTE", b"\x00\x00\x00\xff\xff\xff")
               + chunk(b"IDAT", _z.compress(b"\x00\x00\x00\x00\x00" * 4))
               + chunk(b"IEND", b""))
    media = spark.createDataFrame(
        [("png-pal", "image", "image/png", bytearray(palette),
          None, None, None)], mm.MEDIA_SCHEMA)
    row = mm.image_features(media).collect()[0]
    assert row.n_bytes == len(palette)
    if mm._PILImage is None:
        assert row.feature is None  # unsupported shape → null row
