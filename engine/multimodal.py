"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

Decode is REAL for the container formats expressible without external
libraries (round 5): P5/P6 Netpbm and 24-bit uncompressed BMP images
(pure-numpy parsers), and PCM WAV audio (stdlib ``wave`` + numpy),
including a real linear resampler and real spectral features (RMS,
zero-crossing rate, FFT spectral centroid). Compressed codecs
(PNG/JPEG for images, MP3/AAC for audio, any video) still raise
NotImplementedError unless ``fake=True`` — PIL/cv2/ffmpeg are absent
from this environment and a from-scratch JPEG/H.264 decoder is out of
scope; the format sniffing is by magic bytes, so real and stubbed
payloads can share a column. Everything Ray-side — schema, batch
sizing for large binary payloads, actor signatures, output layout —
is identical on both paths and tested (tests/test_multimodal.py).

Scale notes: binary payloads make rows wide; stages here use small
``batch_size`` and ``batch_format="pyarrow"`` (binary columns don't
round-trip pandas cleanly); block size should be raised via
DataContext.target_max_block_size for very large payloads so blocks
aren't split absurdly small (ray_guide pitfalls).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pyarrow as pa


# --- real, dependency-free codecs ------------------------------------


def encode_ppm(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 Netpbm."""
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def decode_netpbm(payload: bytes) -> np.ndarray:
    """P6 (RGB) / P5 (gray) binary Netpbm -> (h, w, 3) uint8. Header
    tokens may be separated by any whitespace and '#' comments."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary netpbm payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch,
                       offset=pos).reshape(h, w, ch)
    return np.repeat(px, 3, axis=2) if ch == 1 else px.copy()


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up rows,
    BGR byte order, 4-byte row padding — the classic BITMAPINFOHEADER
    layout)."""
    h, w = px.shape[:2]
    row = w * 3
    pad = (-row) % 4
    data = bytearray()
    bgr = px[:, :, ::-1].astype(np.uint8)
    for y in range(h - 1, -1, -1):
        data += bgr[y].tobytes() + b"\0" * pad
    off = 14 + 40
    return (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                          len(data), 2835, 2835, 0, 0) + bytes(data))


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB. Handles
    bottom-up and top-down (negative height) row order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, comp = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)[:, : w * 3]
    px = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return px.copy() if top_down else px[::-1].copy()


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float [-1, 1] mono -> 16-bit PCM WAV bytes (stdlib wave)."""
    pcm = np.clip(np.asarray(samples, np.float64), -1, 1)
    pcm = np.round(pcm * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as fh:
        fh.setnchannels(1)
        fh.setsampwidth(2)
        fh.setframerate(rate)
        fh.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (float64 mono in [-1, 1], sample_rate). 8/16/32-bit
    integer PCM; multi-channel is mean-downmixed."""
    with wave.open(io.BytesIO(payload), "rb") as fh:
        nch = fh.getnchannels()
        width = fh.getsampwidth()
        rate = fh.getframerate()
        raw = fh.readframes(fh.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def linear_resample(x: np.ndarray, rate: int, target: int) -> np.ndarray:
    """Deterministic linear-interpolation resample (the honest
    no-DSP-library kernel; a production stage swaps in polyphase)."""
    if rate == target or len(x) == 0:
        return np.asarray(x, np.float64)
    n_out = max(1, int(round(len(x) * target / rate)))
    src = np.linspace(0, len(x) - 1, n_out)
    return np.interp(src, np.arange(len(x)), x)


def _sniff_image(payload: bytes) -> np.ndarray | None:
    if payload[:2] in (b"P6", b"P5"):
        return decode_netpbm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    return None

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("mime", pa.string()),
        ("width", pa.int32()),        # images/video
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),  # audio
        ("payload", pa.binary()),
    ]
)


def synth_media_table(n: int, seed: int = 42, real: bool = False) -> pa.Table:
    """Deterministic media corpus. ``real=False``: payloads are seeded
    opaque bytes (the stub path). ``real=True``: image rows carry REAL
    encoded PPM/BMP payloads (alternating) and audio rows REAL 16-bit
    PCM WAV (seeded sine + noise), so the native decode path is
    exercised end to end; video rows stay opaque (no in-env codec)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if real and kind == "image":
            px = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
            payload = encode_ppm(px) if (i // 3) % 2 == 0 else encode_bmp(px)
            mime = "image/x-portable-pixmap" if (i // 3) % 2 == 0 \
                else "image/bmp"
        elif real and kind == "audio":
            t = np.arange(1600) / 16000.0
            f = 200.0 + 50.0 * (i % 7)
            sig = (0.5 * np.sin(2 * np.pi * f * t)
                   + 0.05 * rng.standard_normal(len(t)))
            payload = encode_wav(sig, 16000)
            mime = "audio/wav"
        else:
            payload = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                                   dtype=np.uint8).tobytes()
            mime = {"image": "image/png", "audio": "audio/wav",
                    "video": "video/mp4"}[kind]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": mime,
                "width": 32 if kind != "audio" else 0,
                "height": 24 if kind != "audio" else 0,
                "sample_rate": 16000 if kind == "audio" else 0,
                "payload": payload,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class DecodeImage:
    """Actor stage: binary payload -> decoded pixel features. REAL
    decode for Netpbm (P5/P6) and 24-bit BMP payloads (magic-byte
    sniff, pure numpy); compressed formats (PNG/JPEG) raise unless
    ``fake=True``, which substitutes the deterministic stub pixels."""

    def __init__(self, fake: bool = False) -> None:
        self.fake = fake

    def _pixels(self, payload: bytes, w: int, h: int) -> np.ndarray:
        px = _sniff_image(payload)
        if px is not None:
            return px
        if not self.fake:
            raise NotImplementedError(
                "compressed image decode (PNG/JPEG) requires PIL/cv2 "
                "(not in this environment); PPM/BMP decode natively, "
                "or construct with fake=True for the stub")
        return _fake_pixels(payload, max(w, 1), max(h, 1))

    def __call__(self, t: pa.Table) -> pa.Table:
        means, stds = [], []
        for payload, w, h in zip(t["payload"].to_pylist(),
                                 t["width"].to_pylist(),
                                 t["height"].to_pylist()):
            px = self._pixels(payload, w, h)
            means.append(float(px.mean()))
            stds.append(float(px.std()))
        return pa.table(
            {
                "media_id": t["media_id"],
                "pix_mean": pa.array(means, pa.float64()),
                "pix_std": pa.array(stds, pa.float64()),
            }
        )


class ResampleAudio:
    """Actor stage: audio payload -> fixed-rate features. REAL for PCM
    WAV (stdlib decode, linear resample to target_rate, then RMS
    energy, zero-crossing rate, and FFT spectral centroid — the
    speech/music/noise quality triad). Non-RIFF payloads raise unless
    ``fake=True`` (byte-stream stub, rms only)."""

    def __init__(self, target_rate: int = 8000, fake: bool = False) -> None:
        self.target_rate = target_rate
        self.fake = fake

    def _features(self, payload: bytes) -> tuple[float, float, float]:
        if payload[:4] == b"RIFF":
            x, rate = decode_wav(payload)
            x = linear_resample(x, rate, self.target_rate)
            if len(x) == 0:
                return 0.0, 0.0, 0.0
            rms = float(np.sqrt((x ** 2).mean()))
            zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            # POWER-weighted centroid: rectangular-window leakage tails
            # fall ~1/df^2 in magnitude, slowly enough to bias a
            # magnitude-weighted mean by >100 Hz on a pure tone; power
            # weighting (1/df^4 tails) recovers the tone frequency
            spec = np.abs(np.fft.rfft(x)) ** 2
            freqs = np.fft.rfftfreq(len(x), d=1.0 / self.target_rate)
            denom = float(spec.sum())
            cent = float((freqs * spec).sum() / denom) if denom else 0.0
            return rms, zcr, cent
        if not self.fake:
            raise NotImplementedError(
                "compressed audio decode (MP3/AAC) requires soundfile/"
                "librosa (not in this environment); PCM WAV decodes "
                "natively, or construct with fake=True for the stub")
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
        rms = float(np.sqrt((arr ** 2).mean())) if len(arr) else 0.0
        return rms, 0.0, 0.0

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = [self._features(p) for p in t["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": t["media_id"],
                "rms_energy": pa.array([r[0] for r in rows], pa.float64()),
                "zcr": pa.array([r[1] for r in rows], pa.float64()),
                "spectral_centroid": pa.array([r[2] for r in rows],
                                              pa.float64()),
                "rate": pa.array([self.target_rate] * t.num_rows,
                                 pa.int32()),
            }
        )


def decode_images(ds, fake: bool = True, concurrency: int = 2,
                  batch_size: int = 32):
    """Small batch_size on purpose: batch bytes = payload size x rows."""
    return ds.map_batches(
        DecodeImage, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def resample_audio(ds, fake: bool = True, concurrency: int = 2,
                   batch_size: int = 32):
    return ds.map_batches(
        ResampleAudio, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


class SampleFrames:
    """Actor stage: video payload -> every-k-th frame features (stub
    frame decode; real impl would use pyav/ffmpeg in __call__). Output
    carries a list<float> per-frame feature column — the layout a
    downstream embedding/inference stage consumes."""

    def __init__(self, every_k: int = 4, fake: bool = False) -> None:
        self.every_k = every_k
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video decode requires pyav/ffmpeg (not in this "
                "environment); construct with fake=True for the stub"
            )
        n_frames_out, feats = [], []
        for payload, w, h in zip(t["payload"].to_pylist(),
                                 t["width"].to_pylist(),
                                 t["height"].to_pylist()):
            n_frames = max(1, len(payload) // 64)
            sampled = range(0, n_frames, self.every_k)
            fr = [
                float(_fake_pixels(payload[i:] + payload[:i],
                                   max(w, 1), max(h, 1)).mean())
                for i in sampled
            ]
            n_frames_out.append(len(fr))
            feats.append(fr)
        return pa.table(
            {
                "media_id": t["media_id"],
                "n_frames": pa.array(n_frames_out, pa.int64()),
                "frame_means": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def sample_frames(ds, every_k: int = 4, fake: bool = True,
                  concurrency: int = 2, batch_size: int = 16):
    """batch_size smaller still: video rows are the widest payloads."""
    return ds.map_batches(
        SampleFrames, fn_constructor_kwargs={"every_k": every_k, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


class ResizeImage:
    """Actor stage: image payload -> resized pixel block (stub decode;
    the real impl swaps _fake_pixels for PIL decode + Lanczos resize in
    __call__, nothing else changes). Output keeps payload-free rows:
    resized planes go out as fixed-length list<uint8-as-int> features,
    the layout a training shard writer consumes."""

    def __init__(self, out_w: int = 8, out_h: int = 8,
                 fake: bool = False) -> None:
        self.out_w = out_w
        self.out_h = out_h
        self.fake = fake

    def _pixels(self, payload: bytes, w: int, h: int) -> np.ndarray:
        px = _sniff_image(payload)
        if px is not None:
            return px
        if not self.fake:
            raise NotImplementedError(
                "compressed image decode (PNG/JPEG) requires PIL/cv2 "
                "(not in this environment); PPM/BMP decode natively, "
                "or construct with fake=True for the stub")
        return _fake_pixels(payload, max(w, 1), max(h, 1))

    def __call__(self, t: pa.Table) -> pa.Table:
        planes = []
        for payload, w, h in zip(t["payload"].to_pylist(),
                                 t["width"].to_pylist(),
                                 t["height"].to_pylist()):
            px = self._pixels(payload, w, h)
            # box-filter resize via integer block means (numpy, no libs)
            ys = np.linspace(0, px.shape[0], self.out_h + 1).astype(int)
            xs = np.linspace(0, px.shape[1], self.out_w + 1).astype(int)
            small = np.array([
                [int(px[ys[i]:max(ys[i + 1], ys[i] + 1),
                        xs[j]:max(xs[j + 1], xs[j] + 1)].mean())
                 for j in range(self.out_w)]
                for i in range(self.out_h)
            ], dtype=np.int64)
            planes.append(small.ravel().tolist())
        return pa.table(
            {
                "media_id": t["media_id"],
                "resized": pa.array(planes, pa.list_(pa.int64())),
                "out_w": pa.array([self.out_w] * t.num_rows, pa.int32()),
                "out_h": pa.array([self.out_h] * t.num_rows, pa.int32()),
            }
        )


def resize_images(ds, out_w: int = 8, out_h: int = 8, fake: bool = True,
                  concurrency: int = 2, batch_size: int = 32):
    return ds.map_batches(
        ResizeImage,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h, "fake": fake},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
