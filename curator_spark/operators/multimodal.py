"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched pandas UDFs via
mapInPandas.

Decode kernels dispatch on the PAYLOAD, not on configuration: a real
container signature (PNG/JPEG/GIF/BMP magic; RIFF/WAVE header) routes
to a real codec — Pillow when importable for images, stdlib `wave` +
numpy for PCM WAV audio (always available) — while synthetic payloads
take the deterministic stub, so tests and goldens are stable whether or
not Pillow is installed. A real image payload with no Pillow present
raises NotImplementedError inside the kernel, which the shared
error-row contract turns into a null row, never a task failure. The
Spark-side plumbing — schema, batch iteration, partition behavior, UDF
signatures — is identical on both paths.

All operators share ONE scaffold (`_map_rows`): batch loop, column
iteration, and output-frame assembly live in a single place, so the
error-row contract ("errors become null rows, never task failures" —
reference retry-to-error-row semantics,
base_online_request_processor.py:446-462) cannot silently fork between
modalities; each kernel holds only its decode/compute logic.

Scale shape: media bytes are the dominant I/O at 100 TB — the pipeline
keeps them in one `content` column that is column-pruned away from every
metadata-only query, processes them in bounded Arrow batches (batch
memory = maxRecordsPerBatch × avg blob size — size accordingly), and
emits compact fixed-width outputs so downstream stages never reshuffle
the blobs.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("modality", T.StringType(), False),   # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("content", T.BinaryType(), True),      # opaque payload
    T.StructField("width", T.IntegerType(), True),       # typed metadata
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("sha256", T.StringType(), False),
    T.StructField("entropy_proxy", T.DoubleType(), False),
    T.StructField("thumb_w", T.IntegerType(), True),
    T.StructField("thumb_h", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("sha256", T.StringType(), False),
    T.StructField("n_samples", T.IntegerType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("zero_cross_rate", T.DoubleType(), True),
])

FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_ts_ms", T.LongType(), False),
    T.StructField("frame_sha256", T.StringType(), False),
])

RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("src_w", T.IntegerType(), True),
    T.StructField("src_h", T.IntegerType(), True),
    T.StructField("out_w", T.IntegerType(), True),
    T.StructField("out_h", T.IntegerType(), True),
    T.StructField("pixels", T.BinaryType(), True),   # raw RGB, out_h*out_w*3
])

FEATURE_DIM = 16
THUMB_MAX = 64


def _map_rows(media: DataFrame, cols: list[str], schema: T.StructType,
              row_fn: Callable, modality: str | None = None) -> DataFrame:
    """The shared Arrow-batched per-row scaffold: optional modality
    filter, column-pruned select, batch loop, and declared-column-order
    frame assembly. row_fn(*row values) returns one output dict or a
    list of dicts (flatMap kernels like frame sampling)."""
    df = media if modality is None else media.filter(
        F.col("modality") == modality)
    names = [f.name for f in schema]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for vals in zip(*[pdf[c] for c in cols]):
                r = row_fn(*vals)
                out.extend(r if isinstance(r, list) else [r])
            yield pd.DataFrame(out, columns=names)

    return df.select(*cols).mapInPandas(run, schema=schema)


try:  # real image codec — optional, guard-imported once per worker
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

_IMAGE_MAGICS = (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF87a",
                 b"GIF89a", b"BM")


def _is_real_image(content: bytes) -> bool:
    return any(content.startswith(m) for m in _IMAGE_MAGICS)


def _is_real_wav(content: bytes) -> bool:
    return content[:4] == b"RIFF" and content[8:12] == b"WAVE"


def _png_unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse PNG's per-row byte filters (spec §9: None/Sub/Up/
    Average/Paeth) over the decompressed IDAT stream. Returns the
    (h, w*bpp) filtered-out scanline bytes."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = int(raw[pos])
        row = raw[pos + 1: pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(
            stride, dtype=np.int32)
        if ftype == 0:                       # None
            cur = row
        elif ftype == 2:                     # Up
            cur = (row + prev) & 0xFF
        else:                                # Sub/Average/Paeth scan
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0      # left
                b = prev[x]                              # up
                if ftype == 1:               # Sub
                    v = row[x] + a
                elif ftype == 3:             # Average
                    v = row[x] + ((a + b) >> 1)
                elif ftype == 4:             # Paeth
                    c = prev[x - bpp] if x >= bpp else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) \
                        else (b if pb <= pc else c)
                    v = row[x] + pred
                else:
                    raise NotImplementedError(
                        f"unknown PNG filter type {ftype}")
                cur[x] = v & 0xFF
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(content: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (zlib inflate + spec §9 unfilter) →
    HxWx3 uint8 pixels. Covers the dominant lossless web shapes:
    8-bit-depth grayscale (expanded to RGB), RGB, and RGBA (alpha
    dropped, matching Pillow's convert('RGB')), non-interlaced.
    Anything else (palette, 16-bit, Adam7) raises NotImplementedError
    into the error-row contract. This is the no-dependency codec lane:
    a real PNG payload decodes for real even where Pillow cannot be
    installed."""
    import struct
    if not content.startswith(b"\x89PNG\r\n\x1a\n"):
        raise NotImplementedError("not a PNG")
    pos, idat, hdr = 8, [], None
    try:
        while pos + 8 <= len(content):
            clen, ctype = struct.unpack(">I4s", content[pos:pos + 8])
            data = content[pos + 8: pos + 8 + clen]
            if len(data) != clen:
                raise ValueError("truncated chunk")
            if ctype == b"IHDR":
                hdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + clen  # len + type + data + crc
        if hdr is None or not idat:
            raise ValueError("missing IHDR/IDAT")
        w, h, depth, ctype_, comp, filt, interlace = hdr
        if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
            raise NotImplementedError(
                f"unsupported PNG shape: depth={depth} "
                f"interlace={interlace}")
        channels = {0: 1, 2: 3, 6: 4}.get(ctype_)
        if channels is None:
            raise NotImplementedError(
                f"unsupported PNG color type {ctype_}")
        raw = np.frombuffer(zlib.decompress(b"".join(idat)),
                            dtype=np.uint8)
        if len(raw) != h * (1 + w * channels):
            raise ValueError("IDAT length mismatch")
        px = _png_unfilter(raw, h, w, channels).reshape(h, w, channels)
        if channels == 1:
            return np.repeat(px, 3, axis=2).copy()
        return px[:, :, :3].copy()
    except NotImplementedError:
        raise
    except Exception as e:  # corrupt container → error-row contract
        raise NotImplementedError(f"undecodable PNG: {e}") from e


def encode_png(pixels: np.ndarray) -> bytes:
    """Pure-stdlib PNG encode (filter 0 + zlib) of HxWx3 uint8 pixels
    — the write half of the no-dependency codec lane (resized thumbs /
    sampled frames exported as real containers any tool opens)."""
    import struct
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_png expects HxWx3 uint8")
    h, w = px.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    scan = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(scan, 6))
            + chunk(b"IEND", b""))


def _decode_image(content: bytes) -> np.ndarray:
    """bytes → HxWx3 uint8 pixels.

    Payload-dispatched: a real container signature decodes with a real
    codec — Pillow when importable (all formats), else the pure-stdlib
    PNG lane (decode_png) for PNGs; a real non-PNG payload with no
    Pillow raises NotImplementedError → null row. Both real lanes
    produce IDENTICAL pixels for the shapes both support (PNG is
    lossless), so features are hash-stable across installs. Synthetic
    payloads take the deterministic hash-derived stub, keeping fixture
    and golden outputs identical everywhere."""
    if content is None or len(content) == 0:
        raise NotImplementedError("empty payload")
    if _is_real_image(content):
        if _PILImage is not None:
            import io
            try:
                img = _PILImage.open(io.BytesIO(content)).convert("RGB")
            except Exception as e:  # corrupt → error-row contract
                raise NotImplementedError(f"undecodable image: {e}") from e
            return np.asarray(img, dtype=np.uint8)
        if content.startswith(b"\x89PNG\r\n\x1a\n"):
            return decode_png(content)
        raise NotImplementedError(
            "real non-PNG image payload and Pillow is not installed")
    h = hashlib.sha256(content).digest()
    side = 8 + h[0] % 8
    rng = np.frombuffer((h * ((side * side * 3) // len(h) + 1))[: side * side * 3],
                        dtype=np.uint8)
    return rng.reshape(side, side, 3).copy()


def _decode_audio(content: bytes) -> np.ndarray:
    """bytes → float32 mono samples in [-1, 1].

    Payload-dispatched: RIFF/WAVE containers decode for real via stdlib
    `wave` (8/16-bit PCM, multi-channel averaged to mono — no optional
    dependency needed); synthetic payloads take the deterministic
    hash-derived stub."""
    if content is None or len(content) == 0:
        raise NotImplementedError("empty payload")
    if _is_real_wav(content):
        import io
        import wave
        # catch-all around the whole parse: a truncated header raises
        # EOFError (not wave.Error) and an odd-length data chunk makes
        # frombuffer raise ValueError — every malformed container must
        # land in the error-row contract, never crash the task
        try:
            with wave.open(io.BytesIO(content)) as w:
                sw, nch = w.getsampwidth(), w.getnchannels()
                raw = w.readframes(w.getnframes())
            if sw == 2:
                raw = raw[: len(raw) - len(raw) % 2]
                x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
            elif sw == 1:
                x = (np.frombuffer(raw, dtype=np.uint8)
                     .astype(np.float32) - 128.0) / 128.0
            else:
                raise NotImplementedError(f"unsupported WAV sample width {sw}")
            if nch > 1:
                x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
            return x
        except NotImplementedError:
            raise
        except Exception as e:
            raise NotImplementedError(f"undecodable WAV: {e}") from e
    h = hashlib.sha256(content).digest()
    n = 256 + h[0] * 4
    raw = np.frombuffer((h * (n // len(h) + 1))[:n], dtype=np.uint8)
    return (raw.astype(np.float32) - 127.5) / 127.5


def _entropy_proxy(content: bytes) -> float:
    """Compressibility as an entropy stand-in (pure stdlib, no codec)."""
    if not content:
        return 0.0
    return round(len(zlib.compress(content, 1)) / len(content), 6)


def image_features(media: DataFrame,
                   batch_hint: int = 256) -> DataFrame:
    """Decode → thumbnail dims → mean-pool embedding, one Arrow batch at
    a time. The blob column is pruned immediately after feature
    extraction; only fixed-width features flow on."""
    def kernel(mid, content, w, h):
        blob = bytes(content) if content is not None else b""
        try:
            px = _decode_image(blob)
            tw = min(int(w) if pd.notna(w) else px.shape[1], THUMB_MAX)
            th = min(int(h) if pd.notna(h) else px.shape[0], THUMB_MAX)
            # mean-pool "embedding" over pixel blocks (stub model)
            flat = px.astype(np.float32).ravel()
            pads = -len(flat) % FEATURE_DIM
            feat = np.pad(flat, (0, pads)).reshape(FEATURE_DIM, -1).mean(axis=1)
            feat = (feat / 255.0).astype(np.float32).tolist()
        except NotImplementedError:
            tw = th = None
            feat = None
        return {"media_id": mid, "n_bytes": len(blob),
                "sha256": hashlib.sha256(blob).hexdigest(),
                "entropy_proxy": _entropy_proxy(blob),
                "thumb_w": tw, "thumb_h": th, "feature": feat}

    return _map_rows(media, ["media_id", "content", "width", "height"],
                     IMAGE_FEATURES_SCHEMA, kernel)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode → waveform stats — the audio face of image_features."""
    def kernel(mid, content):
        blob = bytes(content) if content is not None else b""
        try:
            w = _decode_audio(blob)
            n = int(w.shape[0])
            rms = round(float(np.sqrt(np.mean(w * w))), 6)
            zcr = round(float(np.mean(np.signbit(w[1:])
                                      != np.signbit(w[:-1]))), 6)
        except NotImplementedError:
            n, rms, zcr = None, None, None
        return {"media_id": mid, "n_bytes": len(blob),
                "sha256": hashlib.sha256(blob).hexdigest(),
                "n_samples": n, "rms": rms, "zero_cross_rate": zcr}

    return _map_rows(media, ["media_id", "content"],
                     AUDIO_FEATURES_SCHEMA, kernel, modality="audio")


def _resize_pixels(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize on the decoded array — pure numpy so the
    stub pipeline stays deterministic; a real build swaps in
    PIL.Image.resize with a proper filter. Contract: HxWx3 uint8 in,
    out_h x out_w x 3 uint8 out."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ys][:, xs]


def resize_images(media: DataFrame, out_w: int = 16,
                  out_h: int = 16) -> DataFrame:
    """Decode → resize → raw-RGB bytes: the resize stage of the
    multimodal pipeline (decode / feature / RESIZE / frame-sample).
    Output pixels are a fixed out_h·out_w·3 bytes per row — downstream
    stages shuffle small fixed-width blobs, never the source payloads."""
    def kernel(mid, content):
        blob = bytes(content) if content is not None else b""
        try:
            px = _decode_image(blob)
            rz = _resize_pixels(px, out_w, out_h)
            return {"media_id": mid,
                    "src_w": int(px.shape[1]), "src_h": int(px.shape[0]),
                    "out_w": out_w, "out_h": out_h, "pixels": rz.tobytes()}
        except NotImplementedError:
            return {"media_id": mid, "src_w": None, "src_h": None,
                    "out_w": None, "out_h": None, "pixels": None}

    return _map_rows(media, ["media_id", "content"],
                     RESIZED_SCHEMA, kernel, modality="image")


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 16) -> DataFrame:
    """Video frame sampling (stub): one output row per sampled frame —
    a flatMap (1→N) over binary rows, the multimodal analogue of the
    reference's parse-func explode (base_request_processor.py:357-393)."""
    def kernel(mid, content, dur):
        blob = bytes(content) if content is not None else b""
        n = int(min(max_frames,
                    max((int(dur) if pd.notna(dur) else 0) // every_ms, 0)))
        return [
            {"media_id": mid, "frame_idx": i, "frame_ts_ms": i * every_ms,
             "frame_sha256": hashlib.sha256(
                 blob + i.to_bytes(4, "big")).hexdigest()}
            for i in range(n)
        ]

    return _map_rows(media, ["media_id", "content", "duration_ms"],
                     FRAME_SAMPLE_SCHEMA, kernel, modality="video")


AHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("phash", T.LongType(), True),   # 64-bit aHash, signed
    T.StructField("ok", T.BooleanType(), False),
])


def _ahash_pixels(px: np.ndarray) -> int:
    """64-bit average hash (aHash) of decoded pixels: resize to 8×8,
    grayscale by channel mean, bit = (pixel > image mean), packed
    big-endian row-major into a SIGNED int64 (Spark LongType). Strict
    `>` makes ties deterministic (a uniform image hashes to 0)."""
    g = _resize_pixels(px, 8, 8).mean(axis=2)
    bits = (g > g.mean()).flatten()
    return int.from_bytes(np.packbits(bits).tobytes(), "big", signed=True)


def image_phash(media: DataFrame) -> DataFrame:
    """Perceptual hash per image: decode → 8×8 aHash. One narrow
    Arrow-batched map (the blob never survives past it); undecodable
    payloads become ok=False null rows per the shared error-row
    contract."""
    def kernel(mid, content):
        blob = bytes(content) if content is not None else b""
        try:
            return {"media_id": mid,
                    "phash": _ahash_pixels(_decode_image(blob)),
                    "ok": True}
        except NotImplementedError:
            return {"media_id": mid, "phash": None, "ok": False}

    return _map_rows(media, ["media_id", "content"],
                     AHASH_SCHEMA, kernel, modality="image")


def phash_neardup_pairs(hashes: DataFrame, max_hamming: int = 3,
                        n_bands: int | None = None,
                        max_band_count: int | None = None) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance —
    the multimodal face of the dedup stack (same banding idea as the
    MinHash LSH in operators/dedup.py, here with an EXACT recall
    guarantee): split the 64-bit hash into n_bands bit-bands; two
    hashes within max_hamming differ in at most max_hamming bands, so
    with n_bands = max_hamming + 1 (the default) the pigeonhole
    principle forces at least one IDENTICAL band — every qualifying
    pair surfaces through the band equi-join, none through a product.
    Candidates are then verified exactly with bit_count(a ^ b), all
    JVM-side.

    Scale shape: one narrow hash map (image_phash), one explode to
    n_bands small rows per image (the blob long gone), one equi-join on
    (band_idx, band_val). Degenerate bands (e.g. uniform thumbnails all
    hashing to 0) quadratically blow up their bucket alone —
    max_band_count drops bands shared by more than that many images,
    trading bounded recall for a hard fan-out cap, exactly like the
    LSH `max_bucket` knob.

    Returns (id_a, id_b, hamming) with id_a < id_b."""
    if n_bands is None:
        n_bands = max_hamming + 1
    if n_bands <= max_hamming:
        raise ValueError(
            f"n_bands={n_bands} <= max_hamming={max_hamming}: the "
            "pigeonhole recall guarantee needs max_hamming + 1 bands")
    if n_bands > 64:
        raise ValueError("at most 64 one-bit bands in a 64-bit hash")
    w = 64 // n_bands
    h = hashes.filter(F.col("ok") & F.col("phash").isNotNull())
    bands = []
    for i in range(n_bands):
        width = w if i < n_bands - 1 else 64 - w * (n_bands - 1)
        mask = (1 << width) - 1
        bands.append(F.struct(
            F.lit(i).alias("band_idx"),
            F.expr(f"(phash >> {w * i}) & {mask}").alias("band_val")))
    banded = h.select("media_id", "phash",
                      F.explode(F.array(*bands)).alias("b")) \
        .select("media_id", "phash", "b.band_idx", "b.band_val")
    if max_band_count is not None:
        counts = (banded.groupBy("band_idx", "band_val")
                  .agg(F.count(F.lit(1)).alias("c")))
        banded = (banded.join(counts, ["band_idx", "band_val"])
                  .filter(F.col("c") <= max_band_count).drop("c"))
    a = banded.select(F.col("media_id").alias("id_a"),
                      F.col("phash").alias("pa"),
                      "band_idx", "band_val")
    b = banded.select(F.col("media_id").alias("id_b"),
                      F.col("phash").alias("pb"),
                      "band_idx", "band_val")
    cand = (a.join(b, ["band_idx", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "pa", "pb").distinct())
    return (cand.withColumn("hamming",
                            F.expr("bit_count(pa ^ pb)").cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def media_fixture(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table for tests (fake payloads)."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"media-{seed}-{i}".encode()).digest()
        modality = ("image", "audio", "video")[i % 3]
        rows.append((
            f"m-{i:05d}", modality,
            {"image": "image/png", "audio": "audio/wav",
             "video": "video/mp4"}[modality],
            bytearray(h * (1 + i % 7)),
            32 + i % 64 if modality == "image" else None,
            32 + (i * 7) % 64 if modality == "image" else None,
            (1000 * (i % 20)) if modality != "image" else None,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _audio_fp_samples(x: np.ndarray, n_t: int = 8, n_f: int = 8) -> int:
    """64-bit spectral fingerprint of a mono waveform: split into n_t
    equal time windows; per window, FFT magnitude binned into n_f
    log-spaced frequency bands; bit = band energy above that window's
    MEAN band energy (strict >, so a silent window contributes 0s).
    The mean — not the median — is the threshold deliberately: in a
    sparse spectrum the median lands in the quantization-noise floor
    and noise-vs-noise comparisons flip with amplitude, while the mean
    is dominated by the bands that actually carry signal.
    Robust to amplitude scaling (threshold is per-window) and to small
    additive noise; shifted/different content diverges. Packed
    big-endian (t-major) into a SIGNED int64 — the SAME (media_id,
    phash, ok) shape image_phash emits, so `phash_neardup_pairs`
    serves both modalities unchanged."""
    n = len(x)
    if n < n_t * 2:
        raise NotImplementedError(f"too few samples for fingerprint: {n}")
    win = n // n_t
    bits = np.zeros(n_t * n_f, dtype=bool)
    for t in range(n_t):
        seg = x[t * win:(t + 1) * win]
        mag = np.abs(np.fft.rfft(seg))[1:]  # drop DC
        if len(mag) < n_f:
            mag = np.pad(mag, (0, n_f - len(mag)))
        # log-spaced band edges over the positive spectrum
        edges = np.unique(np.geomspace(1, len(mag), n_f + 1)
                          .astype(int))
        while len(edges) < n_f + 1:  # tiny windows: pad linearly
            edges = np.append(edges, edges[-1] + 1)
        energy = np.array([
            float((mag[edges[i]-1:edges[i+1]] ** 2).sum())
            for i in range(n_f)])
        bits[t * n_f:(t + 1) * n_f] = energy > energy.mean()
    return int.from_bytes(np.packbits(bits).tobytes(), "big", signed=True)


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Chromaprint-style spectral fingerprint per audio payload: decode
    → 8×8 time-frequency energy signature → 64-bit hash. One narrow
    Arrow-batched map; undecodable payloads → ok=False rows. Output is
    hash-shape-compatible with image_phash, so near-dup pairing is
    `phash_neardup_pairs(audio_fingerprint(media))` — one banded
    Hamming joiner for every 64-bit perceptual hash."""
    def kernel(mid, content):
        blob = bytes(content) if content is not None else b""
        try:
            return {"media_id": mid,
                    "phash": _audio_fp_samples(_decode_audio(blob)),
                    "ok": True}
        except NotImplementedError:
            return {"media_id": mid, "phash": None, "ok": False}

    return _map_rows(media, ["media_id", "content"],
                     AHASH_SCHEMA, kernel, modality="audio")


def video_neardup_pairs(frames: DataFrame, min_shared: int = 3,
                        max_frame_count: int | None = None) -> DataFrame:
    """Video near-duplicate pairs by shared sampled-frame hashes — the
    video face of the dedup stack, completing the modality triple
    (image: aHash bands; audio: spectral fingerprint; video: frame-set
    overlap). Input is `sample_frames` output; with a real codec the
    frame hash is a content hash of the decoded frame, so re-encodes
    and container changes still collide while different footage does
    not (the stub codec hashes blob+idx — byte-identical payloads
    collide, which is what the synthetic fixtures exercise).

    Shape: equi-join on frame_sha256 (never a product), map-side
    combined pair counting, per-video frame counts joined back to
    report overlap_pm = shared·1000 div min(|A|,|B|) in exact integer
    permille. A degenerate frame shared by many videos (black frames,
    intros) blows up its bucket alone — max_frame_count drops frame
    hashes appearing in more than that many videos, the same fan-out
    cap as the LSH/phash joins.

    Returns (id_a, id_b, n_shared, overlap_pm), id_a < id_b."""
    f = frames.select("media_id", "frame_sha256").distinct()
    if max_frame_count is not None:
        c = (f.groupBy("frame_sha256")
             .agg(F.count(F.lit(1)).alias("c")))
        f = (f.join(c, "frame_sha256")
             .filter(F.col("c") <= max_frame_count).drop("c"))
    per_video = f.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"))
    a = f.select(F.col("media_id").alias("id_a"), "frame_sha256")
    b = f.select(F.col("media_id").alias("id_b"), "frame_sha256")
    shared = (a.join(b, "frame_sha256")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b")
              .agg(F.count(F.lit(1)).alias("n_shared"))
              .filter(F.col("n_shared") >= min_shared))
    na = per_video.select(F.col("media_id").alias("id_a"),
                          F.col("n_frames").alias("n_a"))
    nb = per_video.select(F.col("media_id").alias("id_b"),
                          F.col("n_frames").alias("n_b"))
    return (shared.join(na, "id_a").join(nb, "id_b")
            .withColumn("overlap_pm",
                        F.expr("(n_shared * 1000) div least(n_a, n_b)"))
            .select("id_a", "id_b", "n_shared", "overlap_pm"))
