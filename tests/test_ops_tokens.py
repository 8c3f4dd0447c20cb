"""Token-payload ops (ops/tokens.py): vocabulary top-k and packing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from swarm_ray import fixtures
from swarm_ray.ops import tokens
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

def _seq_frames():
    import pandas as pd
    frames = []
    for f in fixtures.sequences_files("sf0.001"):
        frames.append(pq.read_table(f).to_pandas())
    return pd.concat(frames, ignore_index=True)


def test_seq_mixture_matches_recompute(ray_session):
    """The weighted data-mixing sampler must keep exactly the rows an
    independent hashlib recompute of the per-source coin keeps."""
    import hashlib
    from swarm_ray.ops.tokens import MIX_RATES, MIX_SALT, q_seq_mixture
    got = q_seq_mixture("/tmp/x/sf0.001").to_pandas() \
        .sort_values("source").reset_index(drop=True)
    df = _seq_frames()
    coin = df["doc_id"].map(
        lambda d: hashlib.md5((d + MIX_SALT).encode()).hexdigest()[:4])
    def thr_of(src):
        n = min(65536, int(MIX_RATES.get(src, 1.0) * 65536))
        return "g000" if n >= 65536 else format(n, "04x")
    thr = df["source"].map(thr_of)
    kept = df[coin < thr]
    exp = kept.groupby("source").agg(
        rows_kept=("doc_id", "size"), tok_kept=("n_tok", "sum")).reset_index()
    exp = exp.sort_values("source").reset_index(drop=True)
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["rows_kept"].tolist() == exp["rows_kept"].tolist()
    assert got["tok_kept"].tolist() == exp["tok_kept"].tolist()
    # the hot source really is downweighted to ~its target rate
    tot = df.groupby("source").size()
    rate = got.set_index("source")["rows_kept"] / tot
    assert abs(rate["github_audit"] - 0.10) < 0.02
    # rate-1.0 sources keep EVERY row (the '10000' 5-char literal bug
    # silently kept only coins starting '0')
    for src, r in MIX_RATES.items():
        if r >= 1.0 and src in rate.index:
            assert rate[src] == 1.0


def test_bigram_topk_matches_numpy(ray_session):
    from swarm_ray.ops.tokens import VOCAB, q_bigram_topk
    got = q_bigram_topk("/tmp/x/sf0.001", k=25)
    # naive independent recompute
    from collections import Counter
    cnt = Counter()
    for f in fixtures.sequences_files("sf0.001"):
        for toks in pq.read_table(f, columns=["tokens"])["tokens"].to_pylist():
            for a, b in zip(toks[:-1], toks[1:]):
                cnt[(a, b)] += 1
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert list(zip(got["tok_a"], got["tok_b"])) == [k for k, _ in exp]
    assert got["n"].tolist() == [v for _, v in exp]


def test_seq_curriculum_matches_pandas(ray_session):
    from swarm_ray.ops.tokens import q_seq_curriculum
    got = q_seq_curriculum("/tmp/x/sf0.001", shard_size=1000).to_pandas() \
        .sort_values("shard").reset_index(drop=True)
    df = _seq_frames().sort_values(["n_tok", "doc_id"],
                                   ascending=[False, True],
                                   kind="stable").reset_index(drop=True)
    df["shard"] = df.index // 1000
    exp = df.groupby("shard").agg(
        n_rows=("doc_id", "size"), tok_sum=("n_tok", "sum"),
        max_tok=("n_tok", "max"), min_tok=("n_tok", "min")).reset_index()
    assert got["shard"].tolist() == exp["shard"].tolist()
    assert got["n_rows"].tolist() == exp["n_rows"].tolist()
    assert got["tok_sum"].tolist() == exp["tok_sum"].tolist()
    assert got["max_tok"].tolist() == exp["max_tok"].tolist()
    assert got["min_tok"].tolist() == exp["min_tok"].tolist()
    # shards are full except the last
    assert (got["n_rows"].iloc[:-1] == 1000).all()


def test_seq_token_budget_matches_recompute(ray_session):
    """Per-source token budget must admit exactly the windowed-cumsum
    prefix an independent pandas recompute admits."""
    from swarm_ray.ops.tokens import q_seq_token_budget
    budget = 120_000
    got = q_seq_token_budget("/tmp/x/sf0.001", budget=budget).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    df = _seq_frames()
    df["doc_idx"] = df["doc_id"].str.extract(r"doc-(\d+)").astype("int64")
    df = df.sort_values("doc_idx")
    df["run"] = df.groupby("source")["n_tok"].cumsum()
    kept = df[df["run"] <= budget]
    exp = kept.groupby("source", as_index=False).agg(
        rows_kept=("n_tok", "size"), tok_kept=("n_tok", "sum")) \
        .sort_values("source").reset_index(drop=True)
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["rows_kept"].tolist() == exp["rows_kept"].tolist()
    assert got["tok_kept"].tolist() == exp["tok_kept"].tolist()
    # the quota really binds on the hot source and never overshoots
    assert (got["tok_kept"] <= budget).all()
    assert got.set_index("source")["tok_kept"]["github_audit"] > budget * 0.95


def test_seq_token_budget_many_buckets_per_source(ray_session, monkeypatch):
    """Force a tiny bucket (many buckets per source — the prefix-sum
    broadcast really has to carry per-bucket offsets) and pin the result
    equal to the default bucketing (parallelism/bucket-size
    independence, VERDICT r3 item 6)."""
    from swarm_ray.ops import tokens as tk
    budget = 120_000
    base = tk.q_seq_token_budget("/tmp/x/sf0.001", budget=budget) \
        .to_pandas().sort_values("source").reset_index(drop=True)
    monkeypatch.setattr(tk, "budget_bucket_size", lambda n: 64)
    tiny = tk.q_seq_token_budget("/tmp/x/sf0.001", budget=budget) \
        .to_pandas().sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(tiny, base)


def test_budget_bucket_size_bounds():
    """Auto-derived bucket keeps the offsets table bounded: at ANY
    corpus size, #buckets = ceil(n / bucket) ≤ BUDGET_MAX_BUCKETS, the
    bucket never shrinks below the sandbox floor, and it is monotone in
    the corpus size."""
    from swarm_ray.ops.tokens import (BUDGET_BUCKET_MIN, BUDGET_MAX_BUCKETS,
                                      budget_bucket_size)
    prev = 0
    for n in [0, 1, 10_000, 600_000, 5_000_000, 10**9, 10**12, 10**14]:
        b = budget_bucket_size(n)
        assert b >= BUDGET_BUCKET_MIN
        assert -(-max(1, n) // b) <= BUDGET_MAX_BUCKETS
        assert b >= prev
        prev = b
    assert budget_bucket_size(600_000) == BUDGET_BUCKET_MIN  # sandbox: unchanged
    assert budget_bucket_size(10**12) >= 10**7 // 2           # docstring claim


def test_bigram_shuffle_variant_matches_dense(ray_session):
    """The generic sparse-exchange plan and the dense-slice actor plan
    must produce identical top-k (both exact)."""
    from swarm_ray.ops.tokens import q_bigram_topk, q_bigram_topk_shuffle
    a = q_bigram_topk("/tmp/x/sf0.001", k=30)
    b = q_bigram_topk_shuffle("/tmp/x/sf0.001", k=30)
    assert a.equals(b)


def test_bigram_dense_fallback_when_memory_tight(ray_session, monkeypatch):
    """When the dense reducer slices would not fit the cluster heap,
    q_bigram_topk must take the sparse exchange plan and still return
    the exact top-k (ADVICE r3: the 10 GB allocation had no guard)."""
    from swarm_ray.ops import tokens as tk
    base = tk.q_bigram_topk("/tmp/x/sf0.001", k=30)
    monkeypatch.setattr(tk, "_dense_bigram_fits", lambda: False)
    spawned = []
    monkeypatch.setattr(tk, "_BigramSlice",
                        type("Poison", (), {"options": lambda *a, **k:
                                            spawned.append(1)}))
    got = tk.q_bigram_topk("/tmp/x/sf0.001", k=30)
    assert not spawned, "dense reducers must not spawn under the guard"
    assert got.equals(base)


def test_bigram_slice_upgrades_to_uint64(monkeypatch):
    """A slice whose pair total crosses the uint32 safety line must
    upgrade its cells to uint64 with counts preserved exactly."""
    from swarm_ray.ops.tokens import _BigramSliceImpl
    s = _BigramSliceImpl(0, 100)
    monkeypatch.setattr(_BigramSliceImpl, "_UINT32_SAFE_TOTAL", 10)
    s.add(np.array([3, 3, 7], dtype=np.uint32))
    assert s.hist.dtype == np.uint32
    s.add(np.array([3] * 9, dtype=np.uint32))      # total 12 > 10 → upgrade
    assert s.hist.dtype == np.uint64
    keys, cnts = s.topk(10)
    assert keys.tolist() == [3, 7] and cnts.tolist() == [11, 1]


def test_bigram_scan_plan_splits_row_groups(tmp_path, monkeypatch):
    """A single multi-row-group file must fan out into several scan
    tasks, each bounded by the target row count, covering every row
    group exactly once (ADVICE r3: per-file scans)."""
    from swarm_ray.ops import tokens as tk
    t = pa.table({"tokens": pa.array([[1, 2, 3]] * 1000,
                                     type=pa.list_(pa.int32()))})
    f = tmp_path / "seq.parquet"
    pq.write_table(t, f, row_group_size=100)
    monkeypatch.setattr(tk, "_SCAN_TARGET_ROWS", 250)
    plan = tk._bigram_scan_plan([str(f)])
    assert len(plan) > 1
    all_rgs = [rg for _, rgs in plan for rg in rgs]
    assert sorted(all_rgs) == list(range(10))
    for _, rgs in plan:
        assert 100 * len(rgs) <= 250 + 100   # ≤ target + one row group


def test_topk_select_is_tie_safe():
    """Boundary ties must keep the SMALLEST keys — np.argpartition by
    count alone kept an arbitrary tied subset (caught by the sf0.01
    oracle at rank 50)."""
    import numpy as np
    from swarm_ray.ops.tokens import _topk_select
    keys = np.array([10, 20, 30, 40, 50, 60])
    cnt = np.array([5, 3, 3, 3, 3, 9])
    sel = _topk_select(keys, cnt, 3)
    picked = sorted(zip(-cnt[sel], keys[sel]))
    assert [k for _, k in picked] == [60, 10, 20]
    # all-tied: first k keys win
    cnt2 = np.full(6, 7)
    sel2 = _topk_select(keys, cnt2, 4)
    assert sorted(keys[sel2].tolist()) == [10, 20, 30, 40]


# ------------------------------------------------- stratified sample

def test_seq_stratified_matches_serial_recompute(ray_session):
    """Exact-quota draw == a serial pandas recompute of the same
    md5-ordered per-source head (first-principles, no engine code)."""
    import hashlib as _hl

    import pandas as pd
    import pyarrow.parquet as pq

    got = tokens.q_seq_stratified("/root/testdata/sf0.001").to_pandas() \
        .sort_values(["source", "rank"]).reset_index(drop=True)
    frames = [pq.read_table(f, columns=["doc_id", "source"]).to_pandas()
              for f in fixtures.sequences_files("sf0.001")]
    df = pd.concat(frames, ignore_index=True)
    df["skey"] = [
        _hl.md5((d + tokens.STRAT_SALT).encode()).hexdigest()
        for d in df["doc_id"]]
    exp = df.sort_values(["source", "skey"], kind="mergesort") \
        .groupby("source").head(tokens.STRAT_QUOTA)
    exp["rank"] = exp.groupby("source").cumcount() + 1
    exp = exp[["source", "rank", "doc_id"]] \
        .sort_values(["source", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # quota is EXACT: every source yields min(count, quota) rows
    counts = df.groupby("source").size()
    per = got.groupby("source").size()
    for src, n in counts.items():
        assert per.get(src, 0) == min(n, tokens.STRAT_QUOTA)


def test_seq_stratified_parallelism_independent(ray_session, monkeypatch):
    """The draw must not change with block layout: force many tiny
    blocks through the level-1 combiner and pin equality."""
    import pandas as pd

    base = tokens.q_seq_stratified("/root/testdata/sf0.001").to_pandas()

    real_read = tokens.ray.data.read_parquet

    def shredded(paths, **kw):
        return real_read(paths, override_num_blocks=37, **kw)

    monkeypatch.setattr(tokens.ray.data, "read_parquet", shredded)
    shred = tokens.q_seq_stratified("/root/testdata/sf0.001").to_pandas()
    key = ["source", "rank"]
    pd.testing.assert_frame_equal(
        base.sort_values(key).reset_index(drop=True),
        shred.sort_values(key).reset_index(drop=True))


def test_seq_mixture_temp_matches_recompute(ray_session):
    """Temperature-rebalanced mixing: rates derived from the corpus
    (p^α lift, max-normalized) must reproduce an independent
    pandas+hashlib recompute, the rarest source must keep everything,
    and the hot source must be downsampled below its raw share."""
    import hashlib
    import numpy as np
    from swarm_ray.ops.tokens import (TEMP_ALPHA, TEMP_SALT,
                                      q_seq_mixture_temp)
    got = q_seq_mixture_temp("/tmp/x/sf0.001").to_pandas() \
        .sort_values("source").reset_index(drop=True)
    df = _seq_frames()
    cnt = df.groupby("source").size()
    p = cnt / cnt.sum()
    lift = np.power(p, TEMP_ALPHA) / p
    rates = lift / lift.max()
    def thr_of(src):
        n = min(65536, int(rates[src] * 65536))
        return "g000" if n >= 65536 else format(n, "04x")
    coin = df["doc_id"].map(
        lambda d: hashlib.md5((d + TEMP_SALT).encode()).hexdigest()[:4])
    kept = df[coin < df["source"].map(thr_of)]
    exp = kept.groupby("source").agg(
        rows_kept=("doc_id", "size"), tok_kept=("n_tok", "sum")).reset_index()
    exp = exp.sort_values("source").reset_index(drop=True)
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["rows_kept"].tolist() == exp["rows_kept"].tolist()
    assert got["tok_kept"].tolist() == exp["tok_kept"].tolist()
    # rarest source keeps all rows; hottest is downsampled below its share
    kept_rate = got.set_index("source")["rows_kept"] / cnt
    assert kept_rate[cnt.idxmin()] == 1.0
    assert kept_rate[cnt.idxmax()] < 1.0
    # post-sampling shares are flatter than raw shares
    post = got.set_index("source")["rows_kept"]
    assert (post.max() / post.min()) < (cnt.max() / cnt.min())


# ---------------------------------------------------------------- HLL

def test_hll_bitlen_lut_exact():
    """The byte-lane bit_length must be EXACT on the float-hostile
    band (2^k − 1 vs 2^k for k near/above 53, where np.log2 misrounds)
    and on random 54-bit values."""
    vals = []
    for k in range(1, 54):
        vals += [(1 << k) - 1, 1 << k]
    rng = np.random.default_rng(7)
    vals += rng.integers(1, 1 << 54, size=2000).tolist() + [0]
    w = np.array(vals, dtype=np.uint64)
    lanes = w.astype(">u8").view(np.uint8).reshape(-1, 8)
    nz = lanes != 0
    first = np.argmax(nz, axis=1)
    has = nz.any(axis=1)
    bl = np.where(has, (7 - first) * 8 +
                  tokens._BITLEN8[lanes[np.arange(len(w)), first]], 0)
    assert bl.tolist() == [int(v).bit_length() for v in vals]


def test_hll_partial_matches_serial():
    """Engine register partials == a serial hashlib recompute."""
    import hashlib
    ids = [f"src/part-0/doc-{i:08d}.log" for i in range(5000)]
    srcs = ["a" if i % 3 else "b" for i in range(5000)]
    batch = pa.table({"doc_id": pa.array(ids), "source": pa.array(srcs)})
    got = tokens._hll_partial(batch).to_pandas()
    want: dict[tuple[str, int], int] = {}
    for d, s in zip(ids, srcs):
        hv = int.from_bytes(hashlib.md5(d.encode()).digest()[:8], "big")
        reg = hv >> tokens._HLL_W_BITS
        w = hv & tokens._HLL_W_MASK
        rho = min(tokens._HLL_W_BITS + 1 - w.bit_length(),
                  tokens.HLL_RHO_CAP)
        want[(s, reg)] = max(want.get((s, reg), 0), rho)
    got_map = {(r.source, r.reg): r.rho for r in got.itertuples()}
    assert got_map == want


def test_hll_lc_float_parity():
    """⌊m·ln(m/V)+0.5⌋ must agree between Python libm and DuckDB LN
    over the linear-counting branch's ENTIRE domain (V ∈ 1..m) — the
    one float expression in the estimator (ADVICE r4 precedent:
    doc_lm_score's full-domain pin)."""
    import math
    import duckdb
    m = tokens.HLL_M
    con = duckdb.connect()
    sql = con.sql(
        f"SELECT v, CAST(FLOOR({m}.0 * LN({m}.0 / v) + 0.5) AS BIGINT) "
        f"FROM (SELECT unnest(range(1, {m + 1})) AS v)").fetchall()
    for v, got in sql:
        assert got == int(math.floor(m * math.log(m / v) + 0.5)), v


def test_hll_estimate_accuracy_and_merge():
    """The estimator lands within 5σ of ground truth at two scales
    spanning the lc/raw switchover, and register merge (max) is
    order/partition independent."""
    import hashlib

    def serial_regs(n):
        regs: dict[int, int] = {}
        for i in range(n):
            hv = int.from_bytes(
                hashlib.md5(f"doc-{i}".encode()).digest()[:8], "big")
            reg, w = hv >> tokens._HLL_W_BITS, hv & tokens._HLL_W_MASK
            rho = min(tokens._HLL_W_BITS + 1 - w.bit_length(),
                      tokens.HLL_RHO_CAP)
            regs[reg] = max(regs.get(reg, 0), rho)
        return np.array(sorted(regs.values()))

    sigma = 1.04 / np.sqrt(tokens.HLL_M)
    for n, kind_want in ((800, "lc"), (60_000, "raw")):
        est, kind, _raw = tokens.hll_estimate(serial_regs(n))
        assert kind == kind_want
        assert abs(est - n) <= 5 * sigma * n + 3, (n, est)


def test_hll_query_parallelism_independent(ray_session):
    """Same estimates at a pathological block split — registers are
    associative under max, so the plan must not care."""
    a = tokens.q_seq_distinct_hll("/tmp/x/sf0.001").to_pandas()
    files = fixtures.sequences_files("sf0.001")
    from swarm_ray.util import read_parquet_clean
    from swarm_ray.ops.agg import tree_fold_max
    parts = (read_parquet_clean(files, columns=["doc_id", "source"],
                                override_num_blocks=13)
             .map_batches(tokens._hll_partial, batch_format="pyarrow",
                          batch_size=37, zero_copy_batch=True))
    regs = tree_fold_max(parts, keys=["source", "reg"], vals=["rho"])
    b = regs.to_pandas()
    merged = (b.groupby(["source", "reg"])["rho"].max().reset_index())
    rows = []
    for src in sorted(merged["source"].unique()):
        est, kind, raw = tokens.hll_estimate(
            merged.loc[merged["source"] == src, "rho"].to_numpy())
        rows.append((src, est, kind, raw))
    got = pd.DataFrame(rows, columns=["source", "distinct_est",
                                      "est_kind", "raw_est"])
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), got.reset_index(drop=True))


def _serial_gram_counts(rows: list[list[int]]) -> dict[int, int]:
    """Brute-force 5-gram poly counts for tiny inputs."""
    want: dict[int, int] = {}
    for toks in rows:
        for i in range(len(toks) - tokens.CMS_N + 1):
            x = toks[i] % tokens.CMS_P
            for k in range(1, tokens.CMS_N):
                x = (x * tokens.CMS_BASE + toks[i + k]) % tokens.CMS_P
            want[x] = want.get(x, 0) + 1
    return want


def test_cms_grams_respect_row_boundaries():
    """Windows never cross sequences, and the vectorized rolling poly
    equals the per-window serial recompute."""
    rows = [[1, 2, 3, 4, 5, 6], [7, 8], [9, 10, 11, 12, 13], []]
    batch = pa.table({"tokens": pa.array(rows, type=pa.list_(pa.int32()))})
    x, row = tokens._gram_values(batch["tokens"])
    # rows of len 6, 2, 5, 0 → 2 + 0 + 1 + 0 windows
    assert row.tolist() == [0, 0, 2]
    got: dict[int, int] = {}
    for v in x.tolist():
        got[v] = got.get(v, 0) + 1
    assert got == _serial_gram_counts(rows)


def test_cms_sketch_one_sided_and_tight_on_planted_heavy():
    """est ≥ true for EVERY gram (the CMS guarantee), and a planted
    heavy 5-gram's estimate stays within the ε·N collision bound of
    its true count on a fixed-seed background."""
    rng = np.random.default_rng(11)
    heavy = [17, 23, 29, 31, 37]
    rows = [heavy[:] for _ in range(500)]
    rows += [rng.integers(0, tokens.VOCAB, size=9).tolist()
             for _ in range(2000)]          # 2000 × 5 background windows
    batch = pa.table({"tokens": pa.array(rows, type=pa.list_(pa.int32()))})
    sk = tokens._cms_partial(batch)["sketch"][0].as_py()
    sk = np.asarray(sk, dtype=np.int64).reshape(tokens.CMS_D, tokens.CMS_W)
    want = _serial_gram_counts(rows)
    xs = np.array(list(want), dtype=np.int64)
    true = np.array([want[int(v)] for v in xs], dtype=np.int64)
    est = tokens.cms_estimates(sk, xs)
    assert (est >= true).all()
    n_total = int(true.sum())
    eps_bound = 3 * n_total / tokens.CMS_W   # e/W guarantee, slack 3/e
    hx = tokens._gram_values(
        pa.table({"tokens": pa.array([heavy],
                                     type=pa.list_(pa.int32()))})["tokens"])[0]
    heavy_est = int(tokens.cms_estimates(sk, hx)[0])
    assert 500 <= heavy_est <= 500 + eps_bound


def test_cms_partials_additive_across_batch_splits():
    """Summing per-batch sketches over ANY split of the rows yields
    the same sketch — the property the map-only fold relies on."""
    rng = np.random.default_rng(5)
    rows = [rng.integers(0, 100, size=rng.integers(0, 12)).tolist()
            for _ in range(300)]
    arr = pa.array(rows, type=pa.list_(pa.int32()))
    whole = np.asarray(
        tokens._cms_partial(pa.table({"tokens": arr}))["sketch"][0].as_py())
    summed = np.zeros_like(whole)
    for lo, hi in ((0, 7), (7, 64), (64, 300)):
        part = pa.table({"tokens": arr.slice(lo, hi - lo)})
        summed += np.asarray(tokens._cms_partial(part)["sketch"][0].as_py())
    assert (whole == summed).all()


def test_cms_query_parallelism_independent(ray_session):
    """Same probe-doc scores under a pathological block/batch split."""
    import ray as _ray
    from swarm_ray.ops.tokens import (_CmsProbe, _cms_partial,
                                      _sum_sketches)
    from swarm_ray.util import read_parquet_clean
    a = (tokens.q_seq_ngram_cms("/tmp/x/sf0.001").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    files = fixtures.sequences_files("sf0.001")
    parts = (read_parquet_clean(files, columns=["tokens"],
                                override_num_blocks=13)
             .map_batches(_cms_partial, batch_format="pyarrow",
                          batch_size=41, zero_copy_batch=True)
             .map_batches(_sum_sketches, batch_format="pyarrow",
                          batch_size=7, zero_copy_batch=True)
             .to_pandas()["sketch"])
    sk = (np.sum(np.stack([np.asarray(s) for s in parts]), axis=0)
          .reshape(tokens.CMS_D, tokens.CMS_W))
    b = (read_parquet_clean(files, columns=["doc_id", "tokens"],
                            override_num_blocks=9)
         .map_batches(_CmsProbe, batch_format="pyarrow",
                      zero_copy_batch=True, batch_size=53,
                      concurrency=2,
                      fn_constructor_kwargs={"sketch_ref": _ray.put(sk)})
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_dupfrac_matches_serial():
    """Vectorized per-row distinct-window counts equal a brute-force
    recompute, including a planted fully-degenerate looping row."""
    rows = [
        [1, 2, 3, 4, 5, 1, 2, 3, 4, 5, 1, 2, 3, 4, 5],  # loop → dups
        list(range(20)),                                  # all distinct
        [9, 9, 9, 9, 9, 9, 9, 9],                         # one gram ×4
        [1, 2, 3],                                        # too short
    ]
    batch = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
        "tokens": pa.array(rows, type=pa.list_(pa.int32())),
    })
    got = tokens._dupfrac_batch(batch).to_pandas().set_index("doc_id")
    for i, toks in enumerate(rows):
        polys = list(_serial_gram_counts([toks]).items())
        n = sum(c for _, c in polys)
        if n == 0:
            assert f"d{i}" not in got.index
            continue
        d = len(polys)
        r = got.loc[f"d{i}"]
        assert (r.n_grams, r.n_distinct, r.dup_milli) == \
            (n, d, 1000 * (n - d) // n)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(
    st.lists(st.integers(0, tokens.VOCAB - 1), max_size=24),
    max_size=30))
def test_gram_values_property(rows):
    """The vectorized window extractor agrees with the serial
    recompute on arbitrary ragged inputs (empty rows, short rows,
    slice offsets): same poly multiset, rows attributed correctly."""
    batch = pa.table({"tokens": pa.array(rows, type=pa.list_(pa.int32()))})
    x, row = tokens._gram_values(batch["tokens"])
    want_rows = {i: _serial_gram_counts([r]) for i, r in enumerate(rows)}
    got_rows: dict[int, dict[int, int]] = {}
    for v, r in zip(x.tolist(), row.tolist()):
        got_rows.setdefault(r, {})[v] = got_rows.setdefault(r, {}).get(v, 0) + 1
    assert got_rows == {i: w for i, w in want_rows.items() if w}


def test_hll_incr_after_matches_plain_hll(ray_session):
    """Merged (before ∪ incoming) registers ARE the full-corpus
    registers, so est_after must equal q_seq_distinct_hll's estimate
    per source — the associativity that makes sketch state mergeable
    across runs. The incoming split must also be a real split."""
    plain = (tokens.q_seq_distinct_hll("/tmp/x/sf0.001").to_pandas()
             .set_index("source")["distinct_est"])
    incr = (tokens.q_seq_distinct_hll_incr("/tmp/x/sf0.001").to_pandas()
            .set_index("source"))
    assert sorted(incr.index) == sorted(plain.index)
    for src, row in incr.iterrows():
        assert row["est_after"] == plain[src], src
        assert 0 < row["est_before"] < row["est_after"], src
        assert row["est_new"] == row["est_after"] - row["est_before"]
