"""Token-payload ops (ops/tokens.py): vocabulary top-k and packing."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from swarm_ray import fixtures
from swarm_ray.ops.tokens import PackBins, q_seq_pack, q_token_topk


def test_token_topk_matches_numpy(ray_session):
    got = q_token_topk("/tmp/x/sf0.001", k=20)
    hist = np.zeros(60000, dtype=np.int64)
    for f in fixtures.sequences_files("sf0.001"):
        t = pq.read_table(f, columns=["tokens"])
        vals = t["tokens"].combine_chunks().values.to_numpy(zero_copy_only=False)
        hist[:0] = 0
        np.add.at(hist, vals, 1)
    # recompute independently
    hist = np.zeros(60000, dtype=np.int64)
    for f in fixtures.sequences_files("sf0.001"):
        t = pq.read_table(f, columns=["tokens"])
        vals = t["tokens"].combine_chunks().values.to_numpy(zero_copy_only=False)
        np.add.at(hist, vals, 1)
    order = np.lexsort((np.arange(60000), -hist))[:20]
    assert got["token"].tolist() == order.tolist()
    assert got["n"].tolist() == hist[order].tolist()


def test_pack_bins_invariants():
    t = pa.table({
        "doc_id": [f"d{i:03d}" for i in range(20)],
        "n_tok": pa.array([600, 300, 300, 200, 200, 100] + [50] * 14,
                          type=pa.int32()),
    })
    out = PackBins(capacity=512)(t)
    used = out["used_tok"].to_pylist()
    nseq = out["n_seqs"].to_pylist()
    assert all(u <= 512 for u in used)
    assert sum(nseq) == 20
    # over-long sequence gets its own (truncated) bin
    assert 512 in used
    # greedy FFD reaches decent utilization on the rest
    assert sum(used) >= 600 * 0 + (300+300+200+200+100+50*14)


def test_seq_pack_deterministic_across_runs(ray_session):
    a = q_seq_pack("/tmp/x/sf0.001").to_pandas().sort_values("bin_id").reset_index(drop=True)
    b = q_seq_pack("/tmp/x/sf0.001").to_pandas().sort_values("bin_id").reset_index(drop=True)
    assert a.equals(b)
    assert (a["used_tok"] <= a["capacity"]).all()
    # every sequence lands in exactly one bin
    total_rows = sum(pq.read_metadata(f).num_rows
                     for f in fixtures.sequences_files("sf0.001"))
    assert a["n_seqs"].sum() == total_rows


def test_seq_pack_matches_fixture_recompute(ray_session, tmp_path, monkeypatch):
    """The engine's distributed groupby-FFD plan must produce
    BIT-IDENTICAL bins to the fixture generator's independent
    single-process recompute (the seq_pack differential oracle)."""
    monkeypatch.setattr(fixtures, "FIXTURE_ROOT", tmp_path / "fx")
    got = q_seq_pack("/tmp/x/sf0.001").to_pandas() \
        .sort_values("bin_id").reset_index(drop=True) \
        [["bin_id", "n_seqs", "used_tok", "capacity", "pack_group"]]
    exp = pq.read_table(
        fixtures.seq_pack_expected_dir("/tmp/x/sf0.001") / "expected.parquet"
    ).to_pandas().sort_values("bin_id").reset_index(drop=True)
    assert len(exp) > 0
    import pandas as pd
    pd.testing.assert_frame_equal(got, exp)
