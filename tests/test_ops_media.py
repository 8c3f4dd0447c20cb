"""Multimodal binary-column stages (ops/media.py) — decode, resize,
frame-sample, and the stats aggregate vs a pure-Python recompute."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from swarm_ray import fixtures
from swarm_ray.ops.media import (AudioFrameSampleStage, ImageResizeStage,
                                 MediaDecodeStage, q_media_stats)


def _img(w, h, seed=0):
    px = np.random.default_rng(seed).integers(0, 256, size=w * h, dtype=np.uint8)
    return fixtures.MEDIA_MAGIC_IMAGE + struct.pack("<HH", w, h) + px.tobytes(), px


def _aud(sr, ns, seed=0):
    s = np.random.default_rng(seed).integers(-32768, 32768, size=ns, dtype=np.int16)
    return fixtures.MEDIA_MAGIC_AUDIO + struct.pack("<II", sr, ns) + s.tobytes(), s


def _batch(payloads):
    return pa.table({
        "doc_id": [f"d{i}" for i in range(len(payloads))],
        "media_type": ["?"] * len(payloads),
        "payload": pa.array(payloads, type=pa.binary()),
    })


def test_decode_image_and_audio():
    img, px = _img(4, 3, seed=1)
    aud, s = _aud(16000, 100, seed=2)
    out = MediaDecodeStage()(_batch([img, aud]))
    assert out["dec_ok"].to_pylist() == [True, True]
    assert out["dec_width"].to_pylist() == [4, 0]
    assert out["dec_height"].to_pylist() == [3, 0]
    assert out["dec_sample_rate"].to_pylist() == [0, 16000]
    assert out["dec_n_samples"].to_pylist() == [0, 100]
    assert out["feat_mean"].to_pylist()[0] == pytest.approx(px.mean())
    assert out["feat_mean"].to_pylist()[1] == pytest.approx(np.abs(s.astype(np.int32)).mean())
    assert "payload" not in out.column_names


def test_decode_bad_payloads_nonstrict_vs_strict():
    bad = [b"", b"XXXX1234", b"RA"]
    out = MediaDecodeStage()(_batch(bad))
    assert out["dec_ok"].to_pylist() == [False, False, False]
    with pytest.raises(ValueError):
        MediaDecodeStage(strict=True)(_batch(bad))


def test_real_codec_path_is_stubbed():
    with pytest.raises(NotImplementedError):
        MediaDecodeStage._decode_real_codec(memoryview(b"\xff\xd8\xff\xe0jpeg"))


def test_resize_nearest_neighbour_golden():
    img, px = _img(4, 4, seed=3)
    out = ImageResizeStage(out_w=2, out_h=2)(_batch([img]))
    raster = np.frombuffer(out["payload"].to_pylist()[0], dtype=np.uint8, offset=8)
    # nearest-neighbour grid for 4x4 -> 2x2 picks (0,0),(0,2),(2,0),(2,2)
    g = px.reshape(4, 4)
    assert raster.tolist() == [g[0, 0], g[0, 2], g[2, 0], g[2, 2]]
    assert out["pixel_sum"].to_pylist() == [int(raster.sum())]
    # audio rows are filtered out
    aud, _ = _aud(8000, 10)
    assert len(ImageResizeStage()(_batch([aud]))) == 0


def test_frame_sample():
    aud, s = _aud(8000, 1000, seed=4)
    out = AudioFrameSampleStage(stride=100, n_keep=5)(_batch([aud]))
    assert out["preview"].to_pylist() == [s[::100][:5].astype(np.int32).tolist()]


def test_media_stats_matches_fixture_metadata(ray_session):
    import pyarrow.parquet as pq
    got = {r["media_type"]: r for r in q_media_stats("/tmp/whatever/sf0.001").take_all()}
    want = {}
    n_corrupt = 0
    for f in fixtures.media_files("sf0.001"):
        t = pq.read_table(f)
        for mt, w, h, ns, bad in zip(
                t["media_type"].to_pylist(), t["width"].to_pylist(),
                t["height"].to_pylist(), t["n_samples"].to_pylist(),
                t["corrupt"].to_pylist()):
            d = want.setdefault(mt, {"n": 0, "ok": 0, "px": 0, "samples": 0})
            d["n"] += 1
            n_corrupt += bad
            if not bad:                          # corrupt payloads fail decode
                d["ok"] += 1
                d["px"] += w * h
                d["samples"] += ns
    assert n_corrupt > 0                         # the fixture plants failures
    for mt, d in want.items():
        assert got[mt]["n"] == d["n"]
        assert got[mt]["decoded"] == d["ok"]     # clean payloads all decode
        assert got[mt]["px"] == d["px"]          # decoded dims == metadata
        assert got[mt]["samples"] == d["samples"]


def _vid(w, h, nf, seed=0):
    frames = np.random.default_rng(seed).integers(0, 256, size=w * h * nf, dtype=np.uint8)
    return (fixtures.MEDIA_MAGIC_VIDEO + struct.pack("<HHH", w, h, nf)
            + frames.tobytes()), frames.reshape(nf, w * h)


def test_decode_video():
    vid, frames = _vid(4, 4, 6, seed=5)
    out = MediaDecodeStage()(_batch([vid]))
    assert out["dec_ok"].to_pylist() == [True]
    assert out["dec_width"].to_pylist() == [4]
    assert out["dec_n_frames"].to_pylist() == [6]
    assert out["feat_mean"].to_pylist()[0] == pytest.approx(frames.mean())


def test_video_frame_sample():
    from swarm_ray.ops.media import VideoFrameSampleStage
    vid, frames = _vid(4, 4, 10, seed=6)
    out = VideoFrameSampleStage(stride=3, n_keep=3)(_batch([vid]))
    assert out["frame_no"].to_pylist() == [0, 3, 6]
    assert out["mean_milli"].to_pylist() == [
        int(frames[f].mean() * 1000) for f in (0, 3, 6)]
    # image payloads are skipped
    img, _ = _img(4, 4)
    assert len(VideoFrameSampleStage()(_batch([img]))) == 0
