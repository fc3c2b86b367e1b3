"""Multimodal plumbing: image decode/resize, audio features, frame
sampling — stubbed codecs, real Ray-side schema/batching/actor plumbing."""

import ray.data

from unravel_ray.multimodal import (
    decode_images,
    extract_audio_features,
    sample_frames,
    synth_blobs,
)


def _blobs(n=12):
    return ray.data.from_arrow(synth_blobs([f"m{i}" for i in range(n)]))


def test_image_decode_features(ray_session):
    rows = decode_images(_blobs()).take_all()
    assert len(rows) == 12
    for r in rows:
        assert r["width"] == 32 and r["height"] == 32
        assert 0 <= r["pixel_mean"] <= 255
    # deterministic across runs
    again = decode_images(_blobs()).take_all()
    assert sorted(r["pixel_mean"] for r in rows) == sorted(r["pixel_mean"] for r in again)


def test_audio_features(ray_session):
    rows = extract_audio_features(_blobs(6)).take_all()
    assert len(rows) == 6
    for r in rows:
        assert 1.0 <= r["duration_s"] <= 5.0
        assert r["rms_energy"] > 0


def test_frame_sampling_explodes(ray_session):
    rows = sample_frames(_blobs(5), n_frames=3).take_all()
    assert len(rows) == 15
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_no"])
    assert all(sorted(v) == [0, 1, 2] for v in by_media.values())
