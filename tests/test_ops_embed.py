"""Embed stage (stubbed model, real actor-pool inference plumbing)."""

import numpy as np
import pandas as pd

from swarm_ray.ops.embed import (EMBED_DIM, EmbedStage, doc_embeddings,
                                 q_doc_embed, q_doc_embed_knn)


def test_embed_deterministic_normalized():
    b = pd.DataFrame({"doc_id": [1, 2, 3],
                      "text": ["the cat", "the cat", "dog runs fast"]})
    out1 = EmbedStage()(b.copy())
    out2 = EmbedStage()(b.copy())
    e1 = np.stack([np.asarray(e) for e in out1["embedding"].to_pylist()])
    e2 = np.stack([np.asarray(e) for e in out2["embedding"].to_pylist()])
    assert np.array_equal(e1, e2)                      # model load is seeded
    assert np.array_equal(e1[0], e1[1])                # same text, same vector
    assert not np.array_equal(e1[0], e1[2])
    assert np.allclose(np.linalg.norm(e1, axis=1), 1.0, atol=1e-6)
    assert e1.shape[1] == EMBED_DIM


def test_embed_dataset_and_knn(ray_session):
    sf = "/root/testdata/sf0.001"
    emb = doc_embeddings(sf).to_pandas()
    assert len(emb) > 0 and len(emb["embedding"].iloc[0]) == EMBED_DIM

    knn = q_doc_embed_knn(sf, k=3, n_queries=3).to_pandas()
    assert set(knn["query_doc_id"]) == set(emb["doc_id"].sort_values()[:3])
    for _, ranks in knn.groupby("query_doc_id")["rank"]:
        assert ranks.tolist() == [1, 2, 3]
    # no self-matches
    assert (knn["query_doc_id"] != knn["neighbor_doc_id"]).all()


def test_embed_stage_bit_identical_to_fixture_recompute(ray_session):
    """The distributed stage and the fixture generator's independent
    per-doc recompute must agree BITWISE — the doc_embed oracle's
    floor-scaled checksum is exact, so 1-ulp drift means a red oracle."""
    import pyarrow.parquet as pq
    from swarm_ray import fixtures
    sf = "/root/testdata/sf0.001"
    expected = pq.read_table(
        fixtures.doc_embed_expected_dir(sf) / "expected.parquet").to_pandas()
    got = doc_embeddings(sf).to_pandas().sort_values("doc_id")
    expected = expected.sort_values("doc_id")
    e_stage = np.stack([np.asarray(e, dtype=np.float64)
                        for e in got["embedding"]])
    e_fix = np.stack([np.asarray(e) for e in expected["embedding"]])
    assert np.array_equal(e_stage, e_fix)
    # and the checksum surface equals the fixture column
    cs = q_doc_embed(sf).to_pandas().sort_values("doc_id")
    assert cs["emb_csum_e6"].tolist() == expected["emb_csum_e6"].tolist()


def test_forward_zero_length_segments_exact():
    """Zero-token docs anywhere in the batch: their embedding is zero
    and NEIGHBOR segments stay intact (the old clamp truncated the
    last non-empty doc's segment when a trailing empty doc pulled its
    reduceat boundary back)."""
    import numpy as np
    from swarm_ray.ops.embed import EmbedStage
    st = EmbedStage()
    m = st._model

    def norm(v):
        n = np.linalg.norm(v)
        return v / (n if n else 1.0)

    flat = np.array([5, 9, 11, 2, 7], dtype=np.int64)
    # trailing empty doc: doc0 = tokens[0:3], doc1 = [], doc2 = [3:5]
    out = st._forward(flat, np.array([3, 0, 2]))
    np.testing.assert_allclose(out[0], norm(m[[5, 9, 11]].sum(0)), rtol=1e-5, atol=1e-6)
    assert (out[1] == 0).all()
    np.testing.assert_allclose(out[2], norm(m[[2, 7]].sum(0)), rtol=1e-5, atol=1e-6)
    # leading + trailing empties
    out = st._forward(flat, np.array([0, 5, 0]))
    assert (out[0] == 0).all() and (out[2] == 0).all()
    np.testing.assert_allclose(out[1], norm(m[flat].sum(0)), rtol=1e-5, atol=1e-6)


# ---------------------------------------------- self-upgrade hooks (r5)

def _mk_texts():
    return pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                         "text": ["alpha beta", "beta gamma delta",
                                  "", "alpha alpha epsilon"]})


def test_embed_model_hook_fake_torch(monkeypatch, tmp_path):
    """$SWARM_EMBED_MODEL + importable torch must swap the projection
    for the loaded weights — exercised with an injected stub torch so
    the REAL load path runs deterministically in this container."""
    import sys
    import types

    from swarm_ray.ops.text import TOKENIZE_VOCAB

    w = np.arange(TOKENIZE_VOCAB * EMBED_DIM, dtype=np.float32) \
        .reshape(TOKENIZE_VOCAB, EMBED_DIM)

    class _T:
        def __init__(self, m): self._m = m
        def detach(self): return self
        def cpu(self): return self
        def numpy(self): return self._m

    fake = types.ModuleType("torch")
    fake.load = lambda path, map_location=None, weights_only=None: _T(w)
    monkeypatch.setitem(sys.modules, "torch", fake)
    monkeypatch.setenv("SWARM_EMBED_MODEL", str(tmp_path / "w.pt"))
    st = EmbedStage()
    np.testing.assert_array_equal(st._model, w)
    out = st(_mk_texts())            # interface unchanged on this path
    assert out.column_names == ["doc_id", "embedding"]
    assert len(out) == 4


def test_embed_model_hook_shape_mismatch_raises(monkeypatch, tmp_path):
    import sys
    import types

    class _T:
        def detach(self): return self
        def cpu(self): return self
        def numpy(self): return np.zeros((3, 3), dtype=np.float32)

    fake = types.ModuleType("torch")
    fake.load = lambda *a, **k: _T()
    monkeypatch.setitem(sys.modules, "torch", fake)
    monkeypatch.setenv("SWARM_EMBED_MODEL", str(tmp_path / "w.pt"))
    import pytest
    with pytest.raises(ValueError):
        EmbedStage()


def test_embed_model_hook_without_torch_falls_back(monkeypatch):
    """Env var set but torch missing → the seeded projection default,
    bit-identical to the unconfigured stage."""
    import importlib.util
    if importlib.util.find_spec("torch") is not None:
        import pytest
        pytest.skip("torch present; fallback path not reachable")
    monkeypatch.setenv("SWARM_EMBED_MODEL", "/nonexistent/w.pt")
    np.testing.assert_array_equal(EmbedStage()._model,
                                  EmbedStage._load_model(EMBED_DIM))


def test_embed_spm_hook_fake_sentencepiece(monkeypatch, tmp_path):
    """$SWARM_EMBED_SPM + importable sentencepiece must swap the
    tokenizer; stub lib, real wrapper code."""
    import sys
    import types

    class _SP:
        def __init__(self, model_file): pass
        def encode(self, texts):
            return [[len(w) * 7 + i for i, w in enumerate(t.split())]
                    for t in texts]

    fake = types.ModuleType("sentencepiece")
    fake.SentencePieceProcessor = _SP
    monkeypatch.setitem(sys.modules, "sentencepiece", fake)
    monkeypatch.setenv("SWARM_EMBED_SPM", str(tmp_path / "m.model"))
    st = EmbedStage()
    from swarm_ray.ops.embed import _SpmTokenizer
    assert isinstance(st._tok, _SpmTokenizer)
    flat, lens = st._tok.flat_ids(_mk_texts()["text"])
    assert lens.tolist() == [2, 3, 0, 3]
    assert flat.shape == (8,) and flat.max() < st._model.shape[0]
    out = st(_mk_texts())
    assert len(out) == 4             # incl. the empty doc, zero-vector
    emb = np.asarray(out["embedding"].combine_chunks().values).reshape(
        4, EMBED_DIM)
    norms = np.linalg.norm(emb, axis=1)
    np.testing.assert_allclose(norms[[0, 1, 3]], 1.0, rtol=1e-5)
    assert norms[2] == 0.0


def test_embed_spm_hook_without_lib_falls_back(monkeypatch):
    import importlib.util
    if importlib.util.find_spec("sentencepiece") is not None:
        import pytest
        pytest.skip("sentencepiece present; fallback path not reachable")
    monkeypatch.setenv("SWARM_EMBED_SPM", "/nonexistent/m.model")
    from swarm_ray.ops.text import HashTokenizer
    assert isinstance(EmbedStage()._tok, HashTokenizer)


def test_embed_real_torch_roundtrip(tmp_path, monkeypatch):
    """Real-dependency path: only runs where torch actually ships."""
    import importlib.util
    import pytest
    if importlib.util.find_spec("torch") is None:
        pytest.skip("torch not installed in this container")
    import torch
    from swarm_ray.ops.text import TOKENIZE_VOCAB
    w = torch.randn(TOKENIZE_VOCAB, EMBED_DIM)
    torch.save(w, tmp_path / "w.pt")
    monkeypatch.setenv("SWARM_EMBED_MODEL", str(tmp_path / "w.pt"))
    np.testing.assert_allclose(EmbedStage()._model, w.numpy(), rtol=1e-6)
