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


def _wav_bytes(sr=8000, ns=64, nch=1, seed=3):
    import io
    import wave
    s = np.random.default_rng(seed).integers(-32768, 32768,
                                             size=ns * nch, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(s.tobytes())
    return buf.getvalue(), s


def test_decode_real_wav():
    """WAV self-upgrade: a genuine RIFF/WAVE payload decodes through
    the stdlib `wave` path — real codec, no toy container, no optional
    deps (VERDICT r3 item 8)."""
    blob, s = _wav_bytes(sr=16000, ns=100)
    out = MediaDecodeStage()(_batch([blob]))
    assert out["dec_ok"].to_pylist() == [True]
    assert out["dec_sample_rate"].to_pylist() == [16000]
    assert out["dec_n_samples"].to_pylist() == [100]
    want = float(np.abs(s.astype(np.int32)).mean())
    assert out["feat_mean"].to_pylist()[0] == pytest.approx(want)


def test_decode_real_wav_stereo_first_channel():
    blob, s = _wav_bytes(sr=8000, ns=50, nch=2)
    out = MediaDecodeStage()(_batch([blob]))
    assert out["dec_ok"].to_pylist() == [True]
    assert out["dec_n_samples"].to_pylist() == [50]
    want = float(np.abs(s[::2].astype(np.int32)).mean())
    assert out["feat_mean"].to_pylist()[0] == pytest.approx(want)


def test_png_without_pil_skips_nonstrict_raises_strict():
    """PNG payloads in a PIL-less environment: non-strict marks them
    undecoded; strict raises NotImplementedError naming the missing
    library (not the unknown-magic ValueError)."""
    stage = MediaDecodeStage()
    if stage._pil is not None:
        pytest.skip("PIL present — covered by test_decode_real_png")
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    out = stage(_batch([png]))
    assert out["dec_ok"].to_pylist() == [False]
    with pytest.raises(NotImplementedError):
        MediaDecodeStage(strict=True)(_batch([png]))


def test_decode_real_png():
    """PNG self-upgrade — runs only where PIL is installed."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io
    px = np.random.default_rng(5).integers(0, 256, size=(4, 6),
                                           dtype=np.uint8)
    buf = io.BytesIO()
    PIL_Image.fromarray(px, mode="L").save(buf, format="PNG")
    out = MediaDecodeStage()(_batch([buf.getvalue()]))
    assert out["dec_ok"].to_pylist() == [True]
    assert out["dec_width"].to_pylist() == [6]
    assert out["dec_height"].to_pylist() == [4]
    assert out["feat_mean"].to_pylist()[0] == pytest.approx(float(px.mean()))


def test_embed_model_hook_loads_torch_weights(tmp_path, monkeypatch):
    """EmbedStage real-model hook — runs only where torch is installed;
    the seeded-stub default is pinned by the doc_embed oracle."""
    torch = pytest.importorskip("torch")
    from swarm_ray.ops.embed import EMBED_DIM, EmbedStage
    from swarm_ray.ops.text import TOKENIZE_VOCAB
    w = torch.ones((TOKENIZE_VOCAB, EMBED_DIM))
    p = tmp_path / "weights.pt"
    torch.save(w, p)
    monkeypatch.setenv("SWARM_EMBED_MODEL", str(p))
    m = EmbedStage._load_model(EMBED_DIM)
    assert m.shape == (TOKENIZE_VOCAB, EMBED_DIM)
    assert (m == 1.0).all()


def test_embed_model_hook_falls_back_without_torch(tmp_path, monkeypatch):
    """With $SWARM_EMBED_MODEL set but torch absent, the stage must
    fall back to the deterministic stub rather than fail."""
    try:
        import torch  # noqa: F401
        pytest.skip("torch present — fallback path not reachable")
    except ImportError:
        pass
    from swarm_ray.ops.embed import EMBED_DIM, EmbedStage
    monkeypatch.setenv("SWARM_EMBED_MODEL", str(tmp_path / "nope.pt"))
    a = EmbedStage._load_model(EMBED_DIM)
    monkeypatch.delenv("SWARM_EMBED_MODEL")
    b = EmbedStage._load_model(EMBED_DIM)
    assert (a == b).all()


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


def test_media_dedup_planted_duplicates(ray_session, tmp_path, monkeypatch):
    """Payload dedup must count byte-identical blobs exactly: planted
    3×A + 2×B + 1×C images and 2×D audio give n=6/4 distinct image
    rows and max_group 3, independent of layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from swarm_ray import fixtures
    from swarm_ray.ops.media import q_media_dedup

    blobs = [(b"img-A" * 10, "image")] * 3 + [(b"img-B" * 9, "image")] * 2 \
        + [(b"img-C" * 8, "image")] + [(b"aud-D" * 7, "audio")] * 2
    t = pa.table({
        "doc_id": pa.array([f"m/{i}" for i in range(len(blobs))]),
        "media_type": pa.array([k for _, k in blobs]),
        "payload": pa.array([b for b, _ in blobs], type=pa.binary()),
    })
    media_dir = tmp_path / "sfX" / "media"
    media_dir.mkdir(parents=True)
    pq.write_table(t.slice(0, 4), media_dir / "part-00000.parquet")
    pq.write_table(t.slice(4, 4), media_dir / "part-00001.parquet")
    monkeypatch.setattr(
        fixtures, "media_files",
        lambda sf: sorted(str(p) for p in media_dir.glob("*.parquet")))

    got = (q_media_dedup("ignored").to_pandas()
           .sort_values("media_type").reset_index(drop=True))
    assert got["media_type"].tolist() == ["audio", "image"]
    assert got["n_payloads"].tolist() == [2, 6]
    assert got["n_distinct"].tolist() == [1, 3]
    assert got["dup_payloads"].tolist() == [2, 5]   # 3×A + 2×B
    assert got["max_group"].tolist() == [2, 3]
