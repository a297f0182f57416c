"""Multimodal binary-column stages: schema, actor signatures, batch
routing and the deterministic fake-decode path (real codecs absent in
this environment by design — the NotImplementedError gate is part of
the contract)."""

import numpy as np
import pytest
import ray.data as rd


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
