"""Pure-python PNG/WAV codecs + the decoder="real" multimodal seam."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from org_rdkit_lucene_ray.functions.media_codec import (audio_feature,
                                                        image_feature,
                                                        png_decode,
                                                        png_encode,
                                                        resize_nearest,
                                                        wav_decode,
                                                        wav_encode)


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(channels, filter_type):
    rng = np.random.default_rng(7 * channels + filter_type)
    px = rng.integers(0, 256, (13, 9, channels), dtype=np.uint8)
    got = png_decode(png_encode(px, filter_type=filter_type))
    assert got.shape == (13, 9, channels)
    assert np.array_equal(got, px)


def test_png_decode_rejects_unsupported():
    with pytest.raises(ValueError):
        png_decode(b"notapng" * 4)
    # 16-bit depth: patch the IHDR of a valid file
    raw = bytearray(png_encode(np.zeros((2, 2), np.uint8)))
    raw[24] = 16                       # bit depth byte inside IHDR
    with pytest.raises((NotImplementedError, ValueError)):
        png_decode(bytes(raw))


def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(11)
    mono = rng.integers(-30000, 30000, 500, dtype=np.int16)
    got, rate = wav_decode(wav_encode(mono, sample_rate=8000))
    assert rate == 8000 and np.array_equal(got[:, 0], mono)
    stereo = rng.integers(-30000, 30000, (200, 2), dtype=np.int16)
    got2, rate2 = wav_decode(wav_encode(stereo, sample_rate=44100))
    assert rate2 == 44100 and np.array_equal(got2, stereo)


def test_resize_nearest_shapes_and_channels():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (10, 20, 3), dtype=np.uint8)
    out = resize_nearest(px, width=5, height=4, channels=3)
    assert out.shape == (4, 5, 3)
    # upscale replicates nearest pixels exactly
    up = resize_nearest(px, width=40, height=20, channels=3)
    assert np.array_equal(up[::2, ::2], px)
    # grey -> 3 channels replicates; RGBA -> RGB truncates; RGB -> RGBA
    g = rng.integers(0, 256, (4, 4, 1), dtype=np.uint8)
    g3 = resize_nearest(g, 4, 4, 3)
    assert np.array_equal(g3[:, :, 0], g3[:, :, 2])
    rgba = resize_nearest(px, 4, 4, 4)
    assert (rgba[:, :, 3] == 255).all()


def test_content_features_differ_by_content():
    a = image_feature(np.zeros((8, 8, 3), np.uint8), 32)
    b = image_feature(np.full((8, 8, 3), 200, np.uint8), 32)
    assert a.shape == (32,) and not np.array_equal(a, b)
    assert np.isclose(np.linalg.norm(a), 1.0)
    s = audio_feature(np.zeros((100, 1), np.int16), 32)
    t = audio_feature(np.full((100, 1), 20000, np.int16), 32)
    assert not np.array_equal(s, t)


def _media_table():
    rng = np.random.default_rng(42)
    pngs = [png_encode(rng.integers(0, 256, (6, 5, 3), dtype=np.uint8))
            for _ in range(3)]
    wavs = [wav_encode(rng.integers(-3000, 3000, 64, dtype=np.int16))
            for _ in range(2)]
    payloads = pngs + wavs
    return pa.table({
        "media_id": pa.array(range(5), pa.int64()),
        "mime": pa.array(["image/png"] * 3 + ["audio/wav"] * 2),
        "payload": pa.array(payloads, pa.binary()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    })


def test_media_feature_stage_real(ray_session):
    """decoder='real' end-to-end over a mixed PNG/WAV dataset: unit-norm
    content features, deterministic across runs, mime-dispatched."""
    from org_rdkit_lucene_ray.stages.multimodal import MediaFeatureStage

    tbl = _media_table()
    ds = rd.from_arrow(tbl)
    out = ds.map_batches(MediaFeatureStage(decoder="real"),
                         batch_format="pyarrow", batch_size=2).to_pandas()
    assert len(out) == 5
    feats = np.stack(out.sort_values("media_id")["feature"].to_numpy())
    assert feats.shape == (5, 32)
    assert np.allclose(np.linalg.norm(feats, axis=1), 1.0)
    # deterministic: driver-side single decode matches the pool's output
    stage = MediaFeatureStage(decoder="real")
    again = stage(tbl)
    assert np.allclose(
        np.stack(again.to_pandas()["feature"].to_numpy()), feats)
    # unknown mime fails loudly, never fakes
    bad = pa.table({"media_id": pa.array([9], pa.int64()),
                    "mime": pa.array(["video/mp4"]),
                    "payload": pa.array([b"xx"], pa.binary()),
                    "n_bytes": pa.array([2], pa.int64())})
    with pytest.raises(NotImplementedError, match="video/mp4"):
        stage(bad)


def test_resize_stage_real(ray_session):
    """decoder='real' decode->resize->re-encode: output payloads are valid
    PNGs of exactly the target shape."""
    from org_rdkit_lucene_ray.stages.multimodal import ResizeStage

    tbl = _media_table().slice(0, 3)       # PNG rows only
    out = ResizeStage(width=8, height=7, channels=3, decoder="real")(tbl)
    assert out["width"].to_pylist() == [8, 8, 8]
    for p in out["payload"].to_pylist():
        px = png_decode(p)
        assert px.shape == (7, 8, 3)
    with pytest.raises(NotImplementedError):
        ResizeStage(decoder="real")(_media_table().slice(3, 1))
