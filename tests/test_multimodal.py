"""Multimodal binary-column stages: schema, actor signatures, batch
routing, the REAL dependency-free codecs (Netpbm/BMP/PCM-WAV, round 5)
and the deterministic fake path for the formats that genuinely need
absent libraries (the NotImplementedError gate is part of the
contract)."""

import math

import numpy as np
import pyarrow.compute as pc
import pytest
import ray.data as rd


def test_ppm_bmp_roundtrip_exact():
    from engine.multimodal import (decode_bmp, decode_netpbm, encode_bmp,
                                   encode_ppm)

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_netpbm(encode_ppm(px)), px)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(px)), px)
    # P5 grayscale expands to 3 identical channels
    g = b"P5\n4 2\n255\n" + bytes(range(8))
    out = decode_netpbm(g)
    assert out.shape == (2, 4, 3)
    np.testing.assert_array_equal(out[:, :, 0], out[:, :, 2])
    # header comments and multi-whitespace are legal netpbm
    c = b"P6\n# a comment\n 2\t1\n255\n" + bytes(6)
    assert decode_netpbm(c).shape == (1, 2, 3)


def test_wav_roundtrip_and_features():
    from engine.multimodal import (ResampleAudio, decode_wav, encode_wav,
                                   linear_resample)

    t = np.arange(16000) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    x, rate = decode_wav(encode_wav(sig, 16000))
    assert rate == 16000
    # 16-bit quantization + the conventional /32768 decode scale
    np.testing.assert_allclose(x, sig, atol=1.0 / 16000)
    # resample halves the length, preserves amplitude
    y = linear_resample(x, 16000, 8000)
    assert abs(len(y) - 8000) <= 1
    # real features on a pure tone: rms = A/sqrt(2), centroid ~ f
    st = ResampleAudio(target_rate=8000, fake=False)
    rms, zcr, cent = st._features(encode_wav(sig, 16000))
    assert abs(rms - 0.5 / math.sqrt(2)) < 0.01
    assert abs(cent - 440.0) < 20.0
    assert abs(zcr - 2 * 440.0 / 8000.0) < 0.01


def test_native_decode_through_actor_stages(ray_session):
    """fake=False works END TO END for PPM/BMP images and WAV audio —
    the formats with native decoders; determinism across runs."""
    from engine.multimodal import (decode_images, resample_audio,
                                   synth_media_table)

    media = rd.from_arrow(synth_media_table(60, real=True))
    img = decode_images(media.filter(expr="kind == 'image'"),
                        fake=False).to_pandas()
    assert len(img) == 20 and np.isfinite(img["pix_mean"]).all()
    aud = resample_audio(media.filter(expr="kind == 'audio'"),
                         fake=False).to_pandas()
    assert len(aud) == 20
    # seeded sine tones at 200 + 50*(i%7) Hz: centroids near the tones
    assert aud["spectral_centroid"].between(150, 600).all()
    aud2 = resample_audio(rd.from_arrow(synth_media_table(60, real=True))
                          .filter(expr="kind == 'audio'"),
                          fake=False).to_pandas()
    a = aud.sort_values("media_id").reset_index(drop=True)
    b = aud2.sort_values("media_id").reset_index(drop=True)
    assert (a["rms_energy"] == b["rms_energy"]).all()


def test_compressed_gate_still_raises(ray_session):
    """Opaque (non-sniffable) payloads with fake=False must raise —
    the honest boundary for formats that need absent libraries."""
    from engine.multimodal import DecodeImage, ResampleAudio, synth_media_table

    t = synth_media_table(6)  # opaque payloads
    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)(t.filter(pc.equal(t["kind"], "image")))
    with pytest.raises(NotImplementedError):
        ResampleAudio(fake=False)(t.filter(pc.equal(t["kind"], "audio")))


def test_sample_frames_stub(ray_session):
    from engine.multimodal import sample_frames, synth_media_table

    media = rd.from_arrow(synth_media_table(60))
    vids = media.filter(expr="kind == 'video'")
    out = sample_frames(vids, every_k=4, fake=True).to_pandas()
    assert len(out) == vids.count()
    assert (out["n_frames"] >= 1).all()
    # frame features are per-frame lists, deterministic across runs
    out2 = sample_frames(vids, every_k=4, fake=True).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert all(list(x) == list(y) for x, y in zip(a["frame_means"],
                                                  b["frame_means"]))


def test_real_decode_gate_raises(ray_session):
    from engine.multimodal import SampleFrames, synth_media_table

    t = synth_media_table(3)
    with pytest.raises(NotImplementedError):
        SampleFrames(fake=False)(t)


def test_multimodal_features_query(ray_session):
    from engine.queries import multimodal_features

    df = multimodal_features("/root/testdata/sf0.001")
    assert list(df["kind"]) == ["audio", "image", "video"]
    assert (df["n_items"] == 40).all()  # 120 items round-robin 3 kinds
    assert np.isfinite(df["feat_mean"]).all()


def test_resize_images_stub(ray_session):
    from engine.multimodal import resize_images, synth_media_table

    media = rd.from_arrow(synth_media_table(30))
    imgs = media.filter(expr="kind == 'image'")
    out = resize_images(imgs, out_w=4, out_h=3, fake=True).to_pandas()
    assert len(out) == imgs.count()
    assert all(len(v) == 12 for v in out["resized"])
    assert (out["out_w"] == 4).all() and (out["out_h"] == 3).all()
