"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment): ``DecodeImage``/``ResampleAudio`` raise
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (seeded from the payload bytes) produces fixed-shape
arrays. Everything Ray-side — schema, batch sizing for large binary
payloads, actor signatures, output layout — is real and tested
(tests/test_multimodal.py and
tests/test_dedup_textstats.py::test_multimodal_stub_plumbing).

Scale notes: binary payloads make rows wide; stages here use small
``batch_size`` and ``batch_format="pyarrow"`` (binary columns don't
round-trip pandas cleanly); block size should be raised via
DataContext.target_max_block_size for very large payloads so blocks
aren't split absurdly small (ray_guide pitfalls).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                               dtype=np.uint8).tobytes()
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav",
                         "video": "video/mp4"}[kind],
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
    """Actor stage: binary payload -> decoded pixel features.
    Real decode would use PIL/cv2 in __init__/__call__; stubbed here."""

    def __init__(self, fake: bool = False) -> None:
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/cv2 (not in this environment); "
                "construct with fake=True for the deterministic stub"
            )
        means, stds = [], []
        for payload, w, h in zip(t["payload"].to_pylist(),
                                 t["width"].to_pylist(),
                                 t["height"].to_pylist()):
            px = _fake_pixels(payload, max(w, 1), max(h, 1))
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
    """Actor stage: audio payload -> fixed-rate feature vector (stub)."""

    def __init__(self, target_rate: int = 8000, fake: bool = False) -> None:
        self.target_rate = target_rate
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio decode requires soundfile/librosa (not in this "
                "environment); construct with fake=True for the stub"
            )
        energies = []
        for payload in t["payload"].to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
            energies.append(float(np.sqrt((arr ** 2).mean())) if len(arr) else 0.0)
        return pa.table(
            {
                "media_id": t["media_id"],
                "rms_energy": pa.array(energies, pa.float64()),
                "rate": pa.array([self.target_rate] * t.num_rows, pa.int32()),
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

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/cv2 (not in this environment); "
                "construct with fake=True for the deterministic stub"
            )
        planes = []
        for payload, w, h in zip(t["payload"].to_pylist(),
                                 t["width"].to_pylist(),
                                 t["height"].to_pylist()):
            px = _fake_pixels(payload, max(w, 1), max(h, 1))
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
