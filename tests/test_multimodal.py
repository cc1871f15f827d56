"""Multimodal stage tests — the decode kernel is a deterministic stub
(stages/multimodal.py DecoderStub); what's under test is the REAL Ray
plumbing: actor-pool stages, schema/layout, frame explosion, payload
projection, and feature determinism across workers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from duplicate_finder_ray.stages import multimodal as mm


@pytest.fixture(scope="module")
def media_df() -> pd.DataFrame:
    rows = []
    for i in range(30):
        mtype = ("image", "audio", "video")[i % 3]
        payload = bytes([i % 251]) * (100 + i * 512)
        rows.append({"media_id": i, "media_type": mtype, "payload": payload})
    return pd.DataFrame(rows)


def test_media_meta_schema_and_values(ray_session, media_df):
    out = mm.media_meta(ray_session.data.from_pandas(media_df)).to_pandas()
    assert set(out.columns) >= {
        "media_id", "media_type", "n_bytes", "width", "height",
        "n_channels", "n_frames", "payload_sha",
    }
    img = out[out["media_type"] == "image"].iloc[0]
    n = int(img["n_bytes"])
    assert img["width"] == 16 + n % 624 and img["height"] == 16 + (n * 7) % 464
    aud = out[out["media_type"] == "audio"].iloc[0]
    assert aud["n_frames"] == int(aud["n_bytes"]) // 2 and aud["n_channels"] == 1
    vid = out[out["media_type"] == "video"].iloc[0]
    assert vid["n_frames"] == 1 + int(vid["n_bytes"]) // 1024


def test_media_features_deterministic_and_payload_dropped(ray_session, media_df):
    ds = ray_session.data.from_pandas(media_df)
    a = mm.media_features(ds, dim=32).to_pandas().sort_values("media_id")
    b = mm.media_features(ds, dim=32).to_pandas().sort_values("media_id")
    assert "payload" not in a.columns  # bytes never pass the feature stage
    fa = np.stack(a["features"].to_numpy())
    fb = np.stack(b["features"].to_numpy())
    assert fa.shape == (len(media_df), 32)
    np.testing.assert_array_equal(fa, fb)  # same payload ⇒ same vector, any worker
    # distinct payloads ⇒ distinct vectors
    assert len({tuple(v) for v in fa}) == len(fa)


def test_frame_sample_stride_and_slices(ray_session, media_df):
    out = mm.sample_frames(
        ray_session.data.from_pandas(media_df), stride=10
    ).to_pandas()
    assert set(out.columns) == {"media_id", "frame_idx", "frame_payload"}
    videos = media_df[media_df["media_type"] == "video"]
    for row in videos.itertuples():
        n_frames = 1 + len(row.payload) // 1024
        want_idx = list(range(0, n_frames, 10))
        got = out[out["media_id"] == row.media_id].sort_values("frame_idx")
        assert list(got["frame_idx"]) == want_idx
        # each fake frame is its 1 KiB payload slice
        for _, fr in got.iterrows():
            f = int(fr["frame_idx"])
            assert bytes(fr["frame_payload"]) == row.payload[f * 1024 : (f + 1) * 1024]
    # only video rows explode
    assert set(out["media_id"]) == set(videos["media_id"])


def test_unknown_media_type_raises():
    with pytest.raises(NotImplementedError):
        mm.DecoderStub().decode_meta("hologram", b"x")
