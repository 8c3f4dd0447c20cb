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
