"""Token-payload operators over the sequences corpus — the ops a
training-data pipeline runs on the ACTUAL token arrays (the
``input_hint`` table), beyond routing them.

* ``q_token_topk`` — global vocabulary frequency, top-k. The bounded
  vocab (5-digit ids, see stages/ids.py) makes the partial a fixed
  ``np.bincount`` per batch: the shuffle moves ``#blocks`` dense
  histograms (400 KB each), never 10^12 token rows. Oracle: DuckDB
  ``unnest(tokens)`` + count.
* ``q_seq_pack`` — greedy sequence packing into fixed-capacity bins
  (the classic pre-training batching step). Packing is per-PARTITION
  (each input block packs independently, bins never span blocks) —
  the documented partitioning assumption that makes it
  embarrassingly parallel; a global packer would serialize the
  corpus for ~1% utilization gain. Deterministic per group ⇒
  SQL-checked against an independent fixture recompute
  (``fixtures.seq_pack_expected_dir``); invariants also pinned by
  pytest and by the ``seq_pack_stats`` input-side oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


from .. import fixtures
from ..util import read_parquet_clean

VOCAB = 50_257          # token id upper bound (fixtures.VOCAB)
TOPK = 100


def _seq_files(sf_dir: str) -> list[str]:
    return fixtures.sequences_files(fixtures.label_for_sf_dir(sf_dir))


def _dense_hist(batch: pa.Table) -> pa.Table:
    """One row per batch: the dense token histogram as a fixed-size
    list (zero-copy from the bincount buffer)."""
    import numpy as np
    toks = batch["tokens"].combine_chunks()
    vals = toks.values.to_numpy(zero_copy_only=False)
    hist = np.bincount(vals, minlength=VOCAB).astype(np.int64)
    col = pa.FixedSizeListArray.from_arrays(pa.array(hist), VOCAB)
    return pa.table({"hist": col})


def _sum_hists(batch: pa.Table) -> pa.Table:
    import numpy as np
    arr = batch["hist"].combine_chunks()
    m = arr.values.to_numpy(zero_copy_only=False).reshape(len(arr), VOCAB)
    col = pa.FixedSizeListArray.from_arrays(pa.array(m.sum(axis=0)), VOCAB)
    return pa.table({"hist": col})


def q_token_topk(sf_dir: str, k: int = TOPK) -> pd.DataFrame:
    """Top-k most frequent token ids corpus-wide (count desc, id asc).
    Output: (token: int, n: bigint) — SQL-checked.

    Plan: per-batch dense ``np.bincount`` (the vocab is bounded) → one
    fixed-size-list row per batch → a MAP-ONLY fold level summing 64
    histograms per task → tiny driver fold. No shuffle at all — a row
    groupby of the sparse partials measured 80 s where this whole plan
    takes ~2 s; at 10^12 scale add fold levels (log₆₄) instead of
    widening the driver fold."""
    import numpy as np
    ds = (read_parquet_clean(_seq_files(sf_dir), columns=["tokens"])
          .map_batches(_dense_hist, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=32768)
          .map_batches(_sum_hists, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=64))
    parts = ds.to_pandas()["hist"]
    total = np.sum(np.stack([np.asarray(h) for h in parts]), axis=0)
    order = np.lexsort((np.arange(VOCAB), -total))[:k]
    return pd.DataFrame({"token": order.astype("int32"),
                         "n": total[order].astype("int64")})


PACK_CAPACITY = 512


class PackBins:
    """Greedy first-fit-decreasing packer over one batch: sequences
    sorted by length desc, each placed in the first bin with room.
    Bin ids are globally unique and deterministic: (first doc_idx in
    batch, local bin ordinal)."""

    def __init__(self, capacity: int = PACK_CAPACITY):
        self.capacity = capacity

    def assign(self, n_tok: "np.ndarray"):
        """First-fit-decreasing placement → (bin_idx per row, n_bins,
        rem per bin, counts per bin). The first-fit scan is VECTORIZED:
        ``rem`` holds every open bin's remaining capacity; np.argmax
        finds the lowest-index fitting bin in C (a python inner scan
        measured quadratic — 30 s for 5M rows; this is ~4 s)."""
        import numpy as np
        order = np.argsort(-n_tok, kind="stable")
        rem = np.empty(len(order), dtype=np.int64)   # upper bound on #bins
        counts = np.zeros(len(order), dtype=np.int64)
        bin_idx = np.empty(len(order), dtype=np.int64)
        n_bins = 0
        for i in order:
            L = int(n_tok[i])
            if L > self.capacity:        # over-long: own bin (truncate later)
                rem[n_bins] = 0
                counts[n_bins] = 1
                bin_idx[i] = n_bins
                n_bins += 1
                continue
            fits = rem[:n_bins] >= L
            if n_bins and fits.any():
                b = int(np.argmax(fits))
                rem[b] -= L
                counts[b] += 1
                bin_idx[i] = b
            else:
                rem[n_bins] = self.capacity - L
                counts[n_bins] = 1
                bin_idx[i] = n_bins
                n_bins += 1
        return bin_idx, n_bins, rem, counts

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tok = batch["n_tok"].to_numpy()
        doc_ids = batch["doc_id"].to_pylist()
        _bin_idx, n_bins, rem, counts = self.assign(n_tok)
        anchor = min(doc_ids) if doc_ids else ""
        used = self.capacity - rem[:n_bins]
        out = pa.table({
            "bin_id": pa.array([f"{anchor}#{b:06d}" for b in range(n_bins)]),
            "n_seqs": pa.array(counts[:n_bins], type=pa.int64()),
            "used_tok": pa.array(used, type=pa.int64()),
            "capacity": pa.array([self.capacity] * n_bins, type=pa.int64()),
        })
        if "pack_group" in batch.column_names and len(batch):
            grp = batch["pack_group"][0].as_py()
            out = out.append_column(
                "pack_group", pa.array([grp] * n_bins, type=pa.int64()))
        return out


PACK_GROUP = 8192       # sequences per packing group (stable doc_idx range)


def add_pack_group(batch: pa.Table) -> pa.Table:
    """Append the STABLE packing-group key (doc_idx // PACK_GROUP) —
    the single source of the grouping both the pack planner
    (q_seq_pack) and the shard writer (pipelines/packer.py) use, so
    they can never diverge."""
    import pyarrow.compute as pc
    from ..stages.ids import doc_index
    idx = doc_index(batch)
    return batch.append_column(
        "pack_group", pc.cast(pc.divide(idx, PACK_GROUP), pa.int64()))


def q_seq_pack(sf_dir: str, capacity: int = PACK_CAPACITY) -> ray.data.Dataset:
    """Pack sequences into fixed-capacity bins. Packing groups are
    STABLE doc_idx ranges (``doc_idx // PACK_GROUP``), not Ray batch
    boundaries, so the output is identical regardless of block
    splitting / parallelism — bins never span groups (the documented
    partitioning assumption). Returns per-bin stats (rows-only;
    invariants pinned by pytest)."""
    packer = PackBins(capacity)

    def pack_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")       # stable order within group
        t = pa.Table.from_pandas(df[["doc_id", "n_tok", "pack_group"]],
                                 preserve_index=False)
        return packer(t).to_pandas()

    return (read_parquet_clean(_seq_files(sf_dir), columns=["doc_id", "n_tok"])
            .map_batches(add_pack_group, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("pack_group")
            .map_groups(pack_group, batch_format="pandas"))


def q_seq_pack_checked(sf_dir: str) -> ray.data.Dataset:
    """Driver-facing ``seq_pack``: same engine pipeline, plus it
    materializes the generator-side expected-bins fixture so the DuckDB
    oracle (an independent single-process recompute of the whole
    deterministic FFD plan — ``fixtures.seq_pack_expected_dir``) has
    its table on disk. Stable group keys + stable sorts make the
    placement parallelism-independent, so the oracle compare is exact,
    not statistical."""
    fixtures.seq_pack_expected_dir(sf_dir)
    return q_seq_pack(sf_dir)


def q_seq_pack_stats(sf_dir: str, capacity: int = PACK_CAPACITY) -> ray.data.Dataset:
    """Conservation invariants of the packer, per packing group, routed
    THROUGH the packed output: sum of packed sequences per group must
    equal the group's row count, and sum of used tokens must equal the
    group's token mass (over-long sequences contribute exactly
    ``capacity`` — they get a dedicated bin and truncate later). The
    DuckDB oracle computes both directly from the INPUT, so the match
    holds iff packing conserved every sequence and token — this is the
    SQL-checkable shadow of the (non-SQL-expressible) first-fit
    placement in ``q_seq_pack``."""
    from ray.data.aggregate import Sum as _Sum
    packed = q_seq_pack(sf_dir, capacity)
    return (packed.groupby("pack_group")
            .aggregate(_Sum("n_seqs", alias_name="n_seqs"),
                       _Sum("used_tok", alias_name="used_tok")))


# --------------------------------------------- approximate distinct (HLL)

HLL_M = 1024            # registers (b = 10 index bits)
HLL_RHO_CAP = 40        # cap on the leading-zero run: keeps every
#                         integer below (num ≤ m·2^40 < 2^63, estimator
#                         product < 2^90 < int128) on BOTH engines; the
#                         cap only matters past ~2^40·m distinct —
#                         beyond the estimator's usable range anyway
HLL_ALPHA_MICRO = 720541   # ⌊10^6 · α_1024⌋, α_m = 0.7213/(1+1.079/m)
HLL_LC_BOUND = 5 * HLL_M // 2   # linear-counting switchover (2.5·m)
_HLL_W_BITS = 64 - 10           # rho window: hash bits below the index
_HLL_W_MASK = (1 << _HLL_W_BITS) - 1
_BITLEN8 = np.array([v.bit_length() for v in range(256)], dtype=np.int64)

_HLL_PARTIAL_SCHEMA = pa.schema([("source", pa.string()),
                                 ("reg", pa.int32()), ("rho", pa.int32())])


def _hll_partial(batch: pa.Table) -> pa.Table:
    """Per-batch HLL register partial: for every (source, register)
    the max leading-zero-run rank rho seen in this batch — ≤
    #sources × m rows out regardless of batch size, so the fold moves
    sketch registers, never doc ids. The hash is the TOP 64 bits of
    md5(doc_id) (exactly ``int(hexdigest[:16], 16)``), split 10 index
    bits / 54-bit rho window, so the DuckDB oracle reproduces every
    register bit-for-bit from the same md5. Per-doc md5 is a Python
    loop by necessity (md5-reproducibility, the ``Fingerprint``
    precedent); everything after it is vectorized. bit_length is
    computed exactly via byte-lane argmax + an 8-bit LUT — float log2
    would misround near 2^k boundaries above 2^53."""
    import hashlib
    if batch.num_rows == 0:
        return _HLL_PARTIAL_SCHEMA.empty_table()
    ids = batch["doc_id"].to_pylist()
    hv = np.fromiter(
        (int.from_bytes(hashlib.md5(d.encode()).digest()[:8], "big")
         for d in ids),
        dtype=np.uint64, count=len(ids))
    reg = (hv >> np.uint64(_HLL_W_BITS)).astype(np.int64)
    w = hv & np.uint64(_HLL_W_MASK)
    lanes = w.astype(">u8").view(np.uint8).reshape(-1, 8)  # big-endian
    nz = lanes != 0
    first = np.argmax(nz, axis=1)          # highest nonzero byte (0 if none)
    has = nz.any(axis=1)
    bl = np.where(
        has,
        (7 - first) * 8 + _BITLEN8[lanes[np.arange(len(w)), first]],
        0)
    rho = np.minimum(_HLL_W_BITS + 1 - bl, HLL_RHO_CAP).astype(np.int64)

    src = batch["source"].combine_chunks().dictionary_encode()
    codes = np.asarray(src.indices, dtype=np.int64)
    key = codes * HLL_M + reg
    order = np.lexsort((rho, key))
    k_s, r_s = key[order], rho[order]
    last = np.r_[k_s[1:] != k_s[:-1], True]  # max per key = last in order
    k_u, r_u = k_s[last], r_s[last]
    names = src.dictionary.to_pylist()
    return pa.table({
        "source": pa.array([names[c] for c in (k_u // HLL_M)],
                           type=pa.string()),
        "reg": pa.array((k_u % HLL_M).astype(np.int32)),
        "rho": pa.array(r_u.astype(np.int32)),
    })


def hll_estimate_or_zero(mj: np.ndarray) -> int:
    """``hll_estimate`` that tolerates an EMPTY register set (a source
    with no rows in scope): 1024 zero registers is the lc branch at
    V = m, which is exactly 0."""
    return hll_estimate(mj)[0] if len(mj) else 0


def hll_estimate(mj: np.ndarray) -> tuple[int, str, int]:
    """(estimate, kind, raw) from one source's NON-EMPTY register
    values. Pure-integer raw estimator — num = Σ_j 2^(m_max − M_j)
    over ALL m registers (empty ⇒ M_j = 0), single floor division —
    so any engine lands on the same integer; the linear-counting
    branch's ⌊m·ln(m/V)+0.5⌋ float is pinned against DuckDB ``LN``
    over its ENTIRE 1024-value domain by
    test_ops_tokens.test_hll_lc_float_parity."""
    import math
    mj = np.asarray(mj, dtype=np.int64)
    zero = HLL_M - len(mj)
    m_max = int(mj.max())
    num = int(np.sum(np.int64(1) << (m_max - mj))) + zero * (1 << m_max)
    raw = (HLL_ALPHA_MICRO * HLL_M * HLL_M * (1 << m_max)) \
        // (num * 1_000_000)
    if zero > 0 and raw <= HLL_LC_BOUND:
        return (int(math.floor(HLL_M * math.log(HLL_M / zero) + 0.5)),
                "lc", raw)
    return raw, "raw", raw


def q_seq_distinct_hll(sf_dir: str) -> ray.data.Dataset:
    """Approximate per-source distinct-document count via HyperLogLog
    (Flajolet 2007) — the cardinality primitive for streams too big to
    exact-count: registers are the ONLY state, additive under max, so
    the corpus crosses no exchange at all. Plan: one streaming
    ``map_batches`` pass (≤ #sources × 1024 partial rows per block) →
    ``tree_fold_max`` (bounded combine tree, no sort shuffle) → a
    one-block finish computing the estimator. At 100 TB this reads the
    two needed columns once and moves kilobytes. The estimator is
    exact-integer (see ``hll_estimate``), which buys a loss-free SQL
    oracle for a probabilistic sketch: DuckDB re-derives every
    register from the same md5 split and must land on the same
    integers. σ ≈ 1.04/√1024 ≈ 3.3% (accuracy pinned by pytest vs
    ground truth). Reference analogue: the per-source ingest counters
    (pkg/usecase/load.go:207-208) — this is their
    cardinality-not-count sibling."""
    from .agg import tree_fold_max

    partials = (read_parquet_clean(_seq_files(sf_dir),
                                   columns=["doc_id", "source"])
                .map_batches(_hll_partial, batch_format="pyarrow",
                             zero_copy_batch=True))
    regs = tree_fold_max(partials, keys=["source", "reg"], vals=["rho"])

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = []
        for src in sorted(df["source"].unique()):
            est, kind, raw = hll_estimate(
                df.loc[df["source"] == src, "rho"].to_numpy())
            rows.append((src, est, kind, raw))
        return pa.table({
            "source": pa.array([r[0] for r in rows], type=pa.string()),
            "distinct_est": pa.array([r[1] for r in rows], type=pa.int64()),
            "est_kind": pa.array([r[2] for r in rows], type=pa.string()),
            "raw_est": pa.array([r[3] for r in rows], type=pa.int64()),
        })

    return regs.map_batches(finish, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)


HLL_INCR_SALT = ":incr"      # split-coin salt (independent of the
#                              register hash so the sample can't bias
#                              rho statistics)
HLL_INCR_BOUND = "55"        # md5 2-hex-char coin < "55" ⇒ incoming
#                              (85/256 ≈ 1/3 of docs)

_HLL_TAGGED_SCHEMA = pa.schema([
    ("source", pa.string()), ("scope", pa.int32()),
    ("reg", pa.int32()), ("rho", pa.int32())])


def _hll_partial_tagged(batch: pa.Table) -> pa.Table:
    """``_hll_partial`` with a scope tag: 0 = existing corpus,
    1 = incoming batch (deterministic md5 coin on a SEPARATE salt).
    Both md5s come out of the one per-doc loop."""
    import hashlib
    if batch.num_rows == 0:
        return _HLL_TAGGED_SCHEMA.empty_table()
    ids = batch["doc_id"].to_pylist()
    n = len(ids)
    hv = np.empty(n, dtype=np.uint64)
    inc = np.empty(n, dtype=np.int64)
    for i, d in enumerate(ids):
        b = d.encode()
        hv[i] = int.from_bytes(hashlib.md5(b).digest()[:8], "big")
        inc[i] = (hashlib.md5(b + HLL_INCR_SALT.encode()).hexdigest()[:2]
                  < HLL_INCR_BOUND)
    reg = (hv >> np.uint64(_HLL_W_BITS)).astype(np.int64)
    w = hv & np.uint64(_HLL_W_MASK)
    lanes = w.astype(">u8").view(np.uint8).reshape(-1, 8)
    nz = lanes != 0
    first = np.argmax(nz, axis=1)
    has = nz.any(axis=1)
    bl = np.where(
        has,
        (7 - first) * 8 + _BITLEN8[lanes[np.arange(n), first]],
        0)
    rho = np.minimum(_HLL_W_BITS + 1 - bl, HLL_RHO_CAP).astype(np.int64)
    src = batch["source"].combine_chunks().dictionary_encode()
    codes = np.asarray(src.indices, dtype=np.int64)
    key = (codes * 2 + inc) * HLL_M + reg
    order = np.lexsort((rho, key))
    k_s, r_s = key[order], rho[order]
    last = np.r_[k_s[1:] != k_s[:-1], True]
    k_u, r_u = k_s[last], r_s[last]
    names = src.dictionary.to_pylist()
    return pa.table({
        "source": pa.array([names[c] for c in (k_u // (2 * HLL_M))],
                           type=pa.string()),
        "scope": pa.array(((k_u // HLL_M) % 2).astype(np.int32)),
        "reg": pa.array((k_u % HLL_M).astype(np.int32)),
        "rho": pa.array(r_u.astype(np.int32)),
    })


def q_seq_distinct_hll_incr(sf_dir: str) -> ray.data.Dataset:
    """Cross-run sketch state: per-source distinct-count DELTA when an
    incoming batch merges into the stored corpus registers — the
    monitoring pass an incremental ingest (``--incremental``, ≙ the
    reference's state-store redelivery plane) runs to answer "how much
    NEW content did this batch add per source?" without re-reading
    history. In production the corpus-side registers persist in the
    run manifest (≤ #sources × 1024 tiny rows — the whole cross-run
    state rides kilobytes, the reason sketches beat exact sets here);
    this query plays both runs from one table with the
    ``q_dedup_incremental`` deterministic-split convention: an
    independent md5 coin (separate salt, so the split cannot bias the
    register statistics) tags ~1/3 of docs as the incoming batch.

    Plan: the one streaming register pass now keyed (source, scope,
    reg) → bounded combine tree (≤ 2 × #sources × 1024 rows) → a
    one-block finish estimating before (corpus registers) and after
    (max-merge of both scopes — associativity is the whole point of
    sketch state). est_new = after − before (can dip ±1 at the
    lc/raw switch band; the oracle reproduces even that, since both
    engines compute the identical integers). Conservation pin:
    est_after per source MUST equal ``q_seq_distinct_hll``'s estimate
    — merged registers are the same registers
    (tests/test_ops_tokens.py)."""
    from .agg import tree_fold_max

    partials = (read_parquet_clean(_seq_files(sf_dir),
                                   columns=["doc_id", "source"])
                .map_batches(_hll_partial_tagged, batch_format="pyarrow",
                             zero_copy_batch=True))
    regs = tree_fold_max(partials, keys=["source", "scope", "reg"],
                         vals=["rho"])

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = []
        for src in sorted(df["source"].unique()):
            s = df[df["source"] == src]
            before = hll_estimate_or_zero(
                s.loc[s["scope"] == 0, "rho"].to_numpy())
            merged = s.groupby("reg")["rho"].max().to_numpy()
            after = hll_estimate_or_zero(merged)
            rows.append((src, before, after, after - before))
        return pa.table({
            "source": pa.array([r[0] for r in rows], type=pa.string()),
            "est_before": pa.array([r[1] for r in rows], type=pa.int64()),
            "est_after": pa.array([r[2] for r in rows], type=pa.int64()),
            "est_new": pa.array([r[3] for r in rows], type=pa.int64()),
        })

    return regs.map_batches(finish, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)


# ------------------------------------ approximate n-gram frequency (CMS)

CMS_N = 5                  # gram width — past the dense bigram reducer
CMS_D = 4                  # sketch rows (independent hash functions)
CMS_W = 16_384             # counters per row; memory = D·W·8 B, dense
#                            partial row = 512 KB (the _dense_hist scale)
CMS_P = 1_000_000_007      # modulus — keeps every product < 2^60, safe
#                            on int64 in BOTH numpy and DuckDB BIGINT
CMS_BASE = 50_263          # rolling-poly base: first prime > VOCAB
CMS_A = (982_451_653, 715_225_739, 611_953_199, 104_395_301)
CMS_B = (15_485_863, 32_452_843, 49_979_687, 67_867_967)
CMS_PROBE_PREFIX = "00"    # md5(doc_id) hex prefix — a stable 1/256
#                            document sample, parallelism-independent

_CMS_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("n_grams", pa.int64()),
    ("est_total", pa.int64()), ("est_max", pa.int64())])


def _gram_values(toks) -> tuple[np.ndarray, np.ndarray]:
    """(poly, row) for every in-row CMS_N-token window of a list
    column: poly = the window's rolling polynomial mod CMS_P (base
    CMS_BASE > any token id), row = the owning row's index. Windows
    never cross sequence boundaries (same offsets-mask recipe as
    ``_bigram_partial``); everything is vectorized int64 with every
    intermediate < 2^60."""
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    flat = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = flat[offs[0]:offs[-1]]
    offs = offs - offs[0]
    if flat.size < CMS_N:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    nwin = flat.size - (CMS_N - 1)
    x = flat[:nwin] % CMS_P
    for k in range(1, CMS_N):
        x = (x * CMS_BASE + flat[k:k + nwin]) % CMS_P
    row = np.repeat(np.arange(len(offs) - 1, dtype=np.int64),
                    np.diff(offs))
    valid = row[:nwin] == row[CMS_N - 1:]
    return x[valid], row[:nwin][valid]


def _cms_partial(batch: pa.Table) -> pa.Table:
    """One dense (CMS_D × CMS_W) counter block per batch — counters are
    ADDITIVE, so partials combine by element-wise sum in any order and
    the final sketch is bit-identical at every parallelism."""
    x, _ = _gram_values(batch["tokens"])
    sk = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for d in range(CMS_D):
        if x.size:
            idx = ((CMS_A[d] * x + CMS_B[d]) % CMS_P) % CMS_W
            sk[d] = np.bincount(idx, minlength=CMS_W)
    col = pa.FixedSizeListArray.from_arrays(pa.array(sk.ravel()),
                                            CMS_D * CMS_W)
    return pa.table({"sketch": col})


def _sum_sketches(batch: pa.Table) -> pa.Table:
    arr = batch["sketch"].combine_chunks()
    m = arr.values.to_numpy(zero_copy_only=False) \
        .reshape(len(arr), CMS_D * CMS_W)
    col = pa.FixedSizeListArray.from_arrays(pa.array(m.sum(axis=0)),
                                            CMS_D * CMS_W)
    return pa.table({"sketch": col})


def cms_estimates(sketch: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Point-query the (CMS_D, CMS_W) sketch for each window poly:
    min over rows of the hashed counter — the classic one-sided
    estimator (est ≥ true count, always)."""
    est = np.full(x.size, np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(CMS_D):
        idx = ((CMS_A[d] * x + CMS_B[d]) % CMS_P) % CMS_W
        est = np.minimum(est, sketch[d][idx])
    return est


class _CmsProbe:
    """Actor-pool probe stage: the folded sketch rides the object
    store once (``ray.put`` → ``ray.get`` per actor in ``__init__``,
    zero-copy numpy view), never per batch."""

    def __init__(self, sketch_ref):
        self.sk = ray.get(sketch_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.ids import md5_hex
        hexs = md5_hex(batch["doc_id"].combine_chunks())
        keep = pc.equal(pc.utf8_slice_codeunits(hexs, 0, 2),
                        pa.scalar(CMS_PROBE_PREFIX))
        sub = batch.filter(keep)
        if sub.num_rows == 0:
            return _CMS_OUT_SCHEMA.empty_table()
        x, row = _gram_values(sub["tokens"])
        if x.size == 0:
            return _CMS_OUT_SCHEMA.empty_table()
        est = cms_estimates(self.sk, x)
        n = sub.num_rows
        n_grams = np.bincount(row, minlength=n)
        est_total = np.zeros(n, dtype=np.int64)
        np.add.at(est_total, row, est)
        est_max = np.zeros(n, dtype=np.int64)
        np.maximum.at(est_max, row, est)
        m = n_grams > 0                       # drop <CMS_N-token docs
        return pa.table({
            "doc_id": sub["doc_id"].combine_chunks().take(
                pa.array(np.flatnonzero(m))),
            "n_grams": pa.array(n_grams[m]),
            "est_total": pa.array(est_total[m]),
            "est_max": pa.array(est_max[m]),
        })


def q_seq_ngram_cms(sf_dir: str) -> ray.data.Dataset:
    """Document commonness scoring via a Count-Min sketch over token
    5-grams (Cormode & Muthukrishnan 2005) — the frequency sibling of
    the HLL (distinct) and Bloom (membership) sketches, and the SCALE
    path past ``q_bigram_topk``: at n=5 the gram keyspace is
    VOCAB^5 ≈ 3·10^23, so neither a dense reducer nor a sparse
    (gram, count) exchange can hold exact counts — the CMS bounds
    memory at D·W counters regardless of corpus size, with the classic
    one-sided guarantee est ∈ [true, true + ε·N] for ε ≈ e/W.

    Plan (two passes, NO shuffle in either):
      1. sketch build — per-batch dense (D×W) counter blocks (512 KB,
         the ``q_token_topk`` dense-fold recipe) → map-only 64:1 sum
         fold → tiny driver fold. Counters are additive, so the sketch
         is bit-identical at every parallelism.
      2. probe — a STABLE 1/256 document sample (md5(doc_id) prefix,
         the coin every mixture op here uses) is scored against the
         broadcast sketch: per doc, the window count plus the sum/max
         of its grams' estimated corpus-wide frequencies. High
         est_total/n_grams flags boilerplate-heavy documents — the
         sketch-backed analogue of ``doc_common_frac``.

    At 100 TB: raise W (memory stays D·W·8 B per task) and add log₆₄
    fold levels; the probe side broadcasts the sketch once per actor.
    Every quantity is integer arithmetic mod CMS_P, so the DuckDB
    oracle re-derives EVERY counter and every per-window minimum from
    the raw table — an exact-integer check of a probabilistic sketch
    (the ``seq_distinct_hll`` discipline). Reference analogue: the
    per-source ingest counters (pkg/usecase/load.go:207-208) — this is
    their bounded-memory frequency-profile sibling."""
    parts = (read_parquet_clean(_seq_files(sf_dir), columns=["tokens"])
             .map_batches(_cms_partial, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=32768)
             .map_batches(_sum_sketches, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=64)
             .to_pandas()["sketch"])
    sketch = np.sum(np.stack([np.asarray(s) for s in parts]), axis=0) \
        .reshape(CMS_D, CMS_W)
    from ..util import autoscaling_pool
    ref = ray.put(sketch)
    return (read_parquet_clean(_seq_files(sf_dir),
                               columns=["doc_id", "tokens"])
            .map_batches(_CmsProbe, batch_format="pyarrow",
                         zero_copy_batch=True,
                         concurrency=autoscaling_pool(),
                         fn_constructor_kwargs={"sketch_ref": ref}))


_DUPFRAC_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("n_grams", pa.int64()),
    ("n_distinct", pa.int64()), ("dup_milli", pa.int64())])


def _dupfrac_batch(batch: pa.Table) -> pa.Table:
    """Per-sequence repeated-5-gram stats, fully vectorized: lexsort
    the (row, poly) pairs, count first occurrences per row."""
    x, row = _gram_values(batch["tokens"])
    if x.size == 0:
        return _DUPFRAC_SCHEMA.empty_table()
    order = np.lexsort((x, row))
    xs, rs = x[order], row[order]
    first = np.r_[True, (xs[1:] != xs[:-1]) | (rs[1:] != rs[:-1])]
    n = batch.num_rows
    n_grams = np.bincount(row, minlength=n)
    n_distinct = np.bincount(rs[first], minlength=n)
    m = n_grams > 0                            # sequences with ≥1 window
    ng, nd = n_grams[m], n_distinct[m]
    return pa.table({
        "doc_id": batch["doc_id"].combine_chunks().take(
            pa.array(np.flatnonzero(m))),
        "n_grams": pa.array(ng),
        "n_distinct": pa.array(nd),
        "dup_milli": pa.array(1000 * (ng - nd) // ng),
    })


def q_seq_gram_dupfrac(sf_dir: str) -> ray.data.Dataset:
    """Within-sequence repeated n-gram fraction — the Gopher/Dolma
    repetition filter at the token-sequence level (Rae 2021 §A1.1:
    drop documents whose duplicate-n-gram fraction exceeds a bound):
    per sequence, the number of 5-token windows, the number of
    DISTINCT windows (by the same rolling polynomial ``seq_ngram_cms``
    uses, so both ops share one vocabulary of gram identity), and the
    duplicate fraction in integer milli-units. Degenerate looping
    sequences score high and get dropped before training.

    Scale: embarrassingly parallel — one streaming pass, no shuffle,
    no state; each sequence's stats depend only on its own tokens. The
    per-batch distinct count is one lexsort + boundary scan (no Python
    loops). Output is exact integers, so the DuckDB oracle is a plain
    COUNT vs COUNT(DISTINCT) per doc over the identical window
    polynomial. Reference analogue: the per-record rule predicates
    (pkg/usecase/load.go:210-247) — this is a data-quality predicate
    the reference's vocabulary cannot express but the same map slot
    hosts."""
    return (read_parquet_clean(_seq_files(sf_dir),
                               columns=["doc_id", "tokens"])
            .map_batches(_dupfrac_batch, batch_format="pyarrow",
                         zero_copy_batch=True))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "seq_distinct_hll": q_seq_distinct_hll,
        "seq_distinct_hll_incr": q_seq_distinct_hll_incr,
        "seq_ngram_cms": q_seq_ngram_cms,
        "seq_gram_dupfrac": q_seq_gram_dupfrac,
        "seq_token_topk": q_token_topk,
        "seq_pack": q_seq_pack_checked,
        "seq_pack_stats": q_seq_pack_stats,
        "seq_sample": q_seq_sample,
        "seq_shuffle": q_seq_shuffle,
        "seq_mixture": q_seq_mixture,
        "seq_mixture_temp": q_seq_mixture_temp,
        "seq_bigram_topk": q_bigram_topk,
        "seq_curriculum": q_seq_curriculum,
        "seq_token_budget": q_seq_token_budget,
        "seq_stratified": q_seq_stratified,
    }


def oracle_sql() -> dict[str, str]:
    from ..fixtures import (FIXTURE_ROOT, label_for_sf_dir, oracle_sf_dir,
                            sequences_dir)
    glob = str(sequences_dir(label_for_sf_dir(oracle_sf_dir())) / "*.parquet")
    # seq_pack: differential oracle — the generator-side independent
    # FFD recompute (fixtures.seq_pack_expected_dir, materialized by
    # the queries() wrapper; deterministic via stable group keys and
    # sorts). Conservation invariants are additionally SQL-checked
    # from the raw INPUT via seq_pack_stats below.
    pack_glob = str(FIXTURE_ROOT / label_for_sf_dir(oracle_sf_dir())
                    / "seq_pack_expected" / "*.parquet")
    # seq_ngram_cms: the engine's rolling polynomial and hash-row
    # constants, unrolled into plain BIGINT arithmetic (every
    # intermediate < 2^60 — same bound the numpy side relies on)
    poly = f"(tokens[i]::BIGINT % {CMS_P})"
    for _k in range(1, CMS_N):
        poly = f"(({poly} * {CMS_BASE} + tokens[i+{_k}]) % {CMS_P})"
    cms_rows = ", ".join(f"({d}, {CMS_A[d]}, {CMS_B[d]})"
                         for d in range(CMS_D))

    # seq_distinct_hll_incr: the estimator CTE chain, instantiated once
    # per register scope — byte-identical arithmetic to the single-scope
    # seq_distinct_hll oracle below
    def est_ctes(p: str, regs: str) -> str:
        return f"""
            {p}_mm AS (
              SELECT source, MAX(mj) AS m_max,
                     {HLL_M} - COUNT(*) AS zero_regs
              FROM {regs} GROUP BY source
            ), {p}_nums AS (
              SELECT r.source,
                     SUM(1::BIGINT << (m.m_max - r.mj))::BIGINT
                       + ANY_VALUE(m.zero_regs)
                         * (1::BIGINT << ANY_VALUE(m.m_max)) AS num,
                     ANY_VALUE(m.m_max) AS m_max,
                     ANY_VALUE(m.zero_regs) AS zero_regs
              FROM {regs} r JOIN {p}_mm m USING (source)
              GROUP BY r.source
            ), {p}_raw AS (
              SELECT source, zero_regs,
                     CAST(({HLL_ALPHA_MICRO}::HUGEINT * {HLL_M * HLL_M}
                           * CAST(1::BIGINT << m_max AS HUGEINT))
                          // (num::HUGEINT * 1000000) AS BIGINT) AS raw_est
              FROM {p}_nums
            ), {p}_est AS (
              SELECT source,
                     CASE WHEN zero_regs > 0 AND raw_est <= {HLL_LC_BOUND}
                          THEN CAST(FLOOR({HLL_M}.0 *
                                 LN({HLL_M}.0 / zero_regs) + 0.5) AS BIGINT)
                          ELSE raw_est END AS est
              FROM {p}_raw
            )"""

    return {
        "seq_distinct_hll_incr": f"""
            WITH h AS (
              SELECT source,
                     CAST(CONCAT('0x', substr(md5(doc_id), 1, 16))
                          AS UBIGINT) AS hv,
                     CASE WHEN substr(md5(doc_id || '{HLL_INCR_SALT}'),
                                      1, 2) < '{HLL_INCR_BOUND}'
                          THEN 1 ELSE 0 END AS inc
              FROM read_parquet('{glob}')
            ), r AS (
              SELECT source, inc,
                     CAST(hv >> {_HLL_W_BITS} AS INTEGER) AS reg,
                     LEAST({_HLL_W_BITS} + 1 -
                           CASE WHEN (hv & {_HLL_W_MASK}) = 0 THEN 0
                                ELSE LENGTH(bin(hv & {_HLL_W_MASK})) END,
                           {HLL_RHO_CAP}) AS rho
              FROM h
            ), regs_b AS (
              SELECT source, reg, MAX(rho) AS mj FROM r
              WHERE inc = 0 GROUP BY source, reg
            ), regs_a AS (
              SELECT source, reg, MAX(rho) AS mj FROM r
              GROUP BY source, reg
            ), {est_ctes('b', 'regs_b')}, {est_ctes('a', 'regs_a')}
            SELECT a.source, COALESCE(b.est, 0) AS est_before,
                   a.est AS est_after,
                   a.est - COALESCE(b.est, 0) AS est_new
            FROM a_est a LEFT JOIN b_est b USING (source)
            ORDER BY a.source
        """,
        "seq_gram_dupfrac": f"""
            WITH wins AS (
              SELECT doc_id, {poly} AS x
              FROM read_parquet('{glob}'),
                   unnest(generate_series(1, n_tok - {CMS_N - 1}))
                     AS g(i)
              WHERE n_tok >= {CMS_N}
            )
            SELECT doc_id, COUNT(*)::BIGINT AS n_grams,
                   COUNT(DISTINCT x)::BIGINT AS n_distinct,
                   (1000 * (COUNT(*) - COUNT(DISTINCT x))
                    // COUNT(*))::BIGINT AS dup_milli
            FROM wins GROUP BY doc_id
        """,
        "seq_ngram_cms": f"""
            WITH wins AS (
              SELECT doc_id, i, {poly} AS x
              FROM read_parquet('{glob}'),
                   unnest(generate_series(1, n_tok - {CMS_N - 1}))
                     AS g(i)
              WHERE n_tok >= {CMS_N}
            ), h(d, a, b) AS (VALUES {cms_rows}),
            cnt AS (
              SELECT h.d, ((h.a * w.x + h.b) % {CMS_P}) % {CMS_W} AS wi,
                     COUNT(*)::BIGINT AS c
              FROM wins w CROSS JOIN h GROUP BY 1, 2
            ), est AS (
              SELECT p.doc_id, p.i, MIN(c.c) AS e
              FROM (SELECT * FROM wins
                    WHERE substr(md5(doc_id), 1, 2)
                          = '{CMS_PROBE_PREFIX}') p
              CROSS JOIN h
              JOIN cnt c ON c.d = h.d
                        AND c.wi = ((h.a * p.x + h.b) % {CMS_P})
                                   % {CMS_W}
              GROUP BY p.doc_id, p.i
            )
            SELECT doc_id, COUNT(*)::BIGINT AS n_grams,
                   SUM(e)::BIGINT AS est_total, MAX(e)::BIGINT AS est_max
            FROM est GROUP BY doc_id
        """,
        "seq_distinct_hll": f"""
            WITH h AS (
              SELECT source,
                     CAST(CONCAT('0x', substr(md5(doc_id), 1, 16))
                          AS UBIGINT) AS hv
              FROM read_parquet('{glob}')
            ), r AS (
              SELECT source, CAST(hv >> {_HLL_W_BITS} AS INTEGER) AS reg,
                     LEAST({_HLL_W_BITS} + 1 -
                           CASE WHEN (hv & {_HLL_W_MASK}) = 0 THEN 0
                                ELSE LENGTH(bin(hv & {_HLL_W_MASK})) END,
                           {HLL_RHO_CAP}) AS rho
              FROM h
            ), regs AS (
              SELECT source, reg, MAX(rho) AS mj FROM r GROUP BY source, reg
            ), mm AS (
              SELECT source, MAX(mj) AS m_max,
                     {HLL_M} - COUNT(*) AS zero_regs
              FROM regs GROUP BY source
            ), nums AS (
              SELECT regs.source,
                     SUM(1::BIGINT << (mm.m_max - regs.mj))::BIGINT
                       + ANY_VALUE(mm.zero_regs)
                         * (1::BIGINT << ANY_VALUE(mm.m_max)) AS num,
                     ANY_VALUE(mm.m_max) AS m_max,
                     ANY_VALUE(mm.zero_regs) AS zero_regs
              FROM regs JOIN mm USING (source) GROUP BY regs.source
            ), est AS (
              SELECT source, zero_regs,
                     CAST(({HLL_ALPHA_MICRO}::HUGEINT * {HLL_M * HLL_M}
                           * CAST(1::BIGINT << m_max AS HUGEINT))
                          // (num::HUGEINT * 1000000) AS BIGINT) AS raw_est
              FROM nums
            )
            SELECT source,
                   CASE WHEN zero_regs > 0 AND raw_est <= {HLL_LC_BOUND}
                        THEN CAST(FLOOR({HLL_M}.0 *
                               LN({HLL_M}.0 / zero_regs) + 0.5) AS BIGINT)
                        ELSE raw_est END AS distinct_est,
                   CASE WHEN zero_regs > 0 AND raw_est <= {HLL_LC_BOUND}
                        THEN 'lc' ELSE 'raw' END AS est_kind,
                   raw_est
            FROM est ORDER BY source
        """,
        "seq_pack": f"""
            SELECT bin_id, n_seqs, used_tok, capacity, pack_group
            FROM read_parquet('{pack_glob}')
        """,
        "seq_pack_stats": f"""
            SELECT CAST(regexp_extract(doc_id, 'doc-(\\d+)', 1) AS BIGINT)
                     // {PACK_GROUP} AS pack_group,
                   COUNT(*)::BIGINT AS n_seqs,
                   SUM(CASE WHEN n_tok > {PACK_CAPACITY} THEN {PACK_CAPACITY}
                            ELSE CAST(n_tok AS BIGINT) END)::BIGINT AS used_tok
            FROM read_parquet('{glob}')
            GROUP BY 1
        """,
        "seq_sample": f"""
            SELECT source, COUNT(*)::BIGINT AS sampled_rows
            FROM read_parquet('{glob}')
            WHERE substr(md5(doc_id), 1, 1) IN ('0', '1')
            GROUP BY source ORDER BY source
        """,
        "seq_shuffle": f"""
            WITH k AS (
              SELECT doc_id, md5(doc_id || '{SHUFFLE_SALT}') AS skey
              FROM read_parquet('{glob}')
            )
            SELECT CAST(row_number() OVER (ORDER BY skey) AS BIGINT) AS rank,
                   doc_id, skey
            FROM k ORDER BY skey LIMIT {SHUFFLE_HEAD}
        """,
        "seq_token_topk": f"""
            SELECT CAST(t AS INTEGER) AS token, COUNT(*)::BIGINT AS n
            FROM (SELECT unnest(tokens) AS t
                  FROM read_parquet('{glob}'))
            GROUP BY t
            ORDER BY n DESC, token ASC
            LIMIT {TOPK}
        """,
        "seq_mixture": f"""
            SELECT source,
                   COUNT(*)::BIGINT AS rows_kept,
                   SUM(CAST(n_tok AS BIGINT))::BIGINT AS tok_kept
            FROM read_parquet('{glob}')
            WHERE substr(md5(doc_id || '{MIX_SALT}'), 1, 4) <
                  CASE source {_mix_case_sql()} ELSE 'g000' END
            GROUP BY source ORDER BY source
        """,
        "seq_mixture_temp": f"""
            WITH cnt AS (
              SELECT source, COUNT(*)::DOUBLE AS c
              FROM read_parquet('{glob}') GROUP BY source
            ), lifted AS (
              SELECT source,
                     POW(c / SUM(c) OVER (), {TEMP_ALPHA})
                       / (c / SUM(c) OVER ()) AS lift
              FROM cnt
            ), thr AS (
              SELECT source,
                CASE WHEN lift >= MAX(lift) OVER () THEN 'g000'
                     ELSE lpad(lower(to_hex(CAST(FLOOR(
                            lift / MAX(lift) OVER () * 65536)
                            AS BIGINT))), 4, '0') END AS t4
              FROM lifted
            )
            SELECT s.source, COUNT(*)::BIGINT AS rows_kept,
                   SUM(CAST(s.n_tok AS BIGINT))::BIGINT AS tok_kept
            FROM read_parquet('{glob}') s JOIN thr USING (source)
            WHERE substr(md5(s.doc_id || '{TEMP_SALT}'), 1, 4) < thr.t4
            GROUP BY s.source ORDER BY s.source
        """,
        "seq_bigram_topk": f"""
            SELECT CAST(a AS INTEGER) AS tok_a, CAST(b AS INTEGER) AS tok_b,
                   COUNT(*)::BIGINT AS n
            FROM (SELECT unnest(tokens[1:len(tokens)-1]) AS a,
                         unnest(tokens[2:len(tokens)]) AS b
                  FROM read_parquet('{glob}')
                  WHERE len(tokens) >= 2)
            GROUP BY a, b
            ORDER BY n DESC, tok_a ASC, tok_b ASC
            LIMIT {BIGRAM_TOPK}
        """,
        "seq_token_budget": f"""
            WITH c AS (
              SELECT source, CAST(n_tok AS BIGINT) AS n_tok,
                     SUM(CAST(n_tok AS BIGINT)) OVER (
                       PARTITION BY source
                       ORDER BY CAST(regexp_extract(doc_id, 'doc-(\\d+)', 1)
                                     AS BIGINT)) AS run
              FROM read_parquet('{glob}')
            )
            SELECT source, COUNT(*)::BIGINT AS rows_kept,
                   SUM(n_tok)::BIGINT AS tok_kept
            FROM c WHERE run <= {TOKEN_BUDGET}
            GROUP BY source ORDER BY source
        """,
        "seq_curriculum": f"""
            WITH ranked AS (
              SELECT (row_number() OVER (ORDER BY n_tok DESC, doc_id ASC)
                      - 1) // {CURRICULUM_SHARD} AS shard,
                     n_tok
              FROM read_parquet('{glob}')
            )
            SELECT CAST(shard AS BIGINT) AS shard,
                   COUNT(*)::BIGINT AS n_rows,
                   SUM(CAST(n_tok AS BIGINT))::BIGINT AS tok_sum,
                   MAX(n_tok) AS max_tok,
                   MIN(n_tok) AS min_tok
            FROM ranked GROUP BY shard
        """,
        "seq_stratified": f"""
            SELECT source,
                   CAST(row_number() OVER (
                        PARTITION BY source
                        ORDER BY md5(doc_id || '{STRAT_SALT}')) AS BIGINT)
                     AS rank,
                   doc_id
            FROM read_parquet('{glob}')
            QUALIFY row_number() OVER (
                        PARTITION BY source
                        ORDER BY md5(doc_id || '{STRAT_SALT}'))
                    <= {STRAT_QUOTA}
        """,
    }


def _mix_case_sql() -> str:
    return " ".join(
        f"WHEN '{s}' THEN '{_mix_threshold_hex(r)}'"
        for s, r in MIX_RATES.items())


def q_seq_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic content-hash sampling (~12.5%): keep rows whose
    md5(doc_id) starts with hex 0 or 1 — the scalable seeded-sample
    pattern (uniform, reproducible, independent of row order and
    parallelism, and a pure per-batch filter: no shuffle, no driver
    RNG). Output: per-source sampled counts, SQL-checked."""
    import pyarrow.compute as pc
    from ..stages.ids import md5_hex
    from .agg import grouped_count

    def sample(batch: pa.Table) -> pa.Table:
        h = md5_hex(batch["doc_id"].combine_chunks().cast(pa.large_binary()))
        keep = pc.is_in(pc.utf8_slice_codeunits(h, 0, 1),
                        value_set=pa.array(["0", "1"]))
        return batch.filter(keep)

    ds = read_parquet_clean(_seq_files(sf_dir), columns=["doc_id", "source"])
    return grouped_count(
        ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True),
        ["source"], alias="sampled_rows", bounded_groups=True)


# ------------------------------------------------------------ seeded shuffle

SHUFFLE_SALT = ":shuf1"
SHUFFLE_HEAD = 100


def q_seq_shuffle(sf_dir: str) -> pd.DataFrame:
    """Deterministic seeded GLOBAL SHUFFLE — the training-order pass
    run before packing/sharding: shuffle key = md5(doc_id || salt)
    (reproducible, independent of row order and parallelism; changing
    the salt is a fresh epoch order), then a DISTRIBUTED sort on the
    key. Ray's sort is a sample-based range partition — the one
    all-to-all this op inherently is; at corpus scale the sorted
    stream writes hive-partitioned shards keyed by digest prefix
    instead of being collected. The query surface returns the first
    ``SHUFFLE_HEAD`` rows with their ranks — a bounded, exactly
    SQL-checkable view of the global order (md5 keys are distinct, so
    the order is total and ties can't flip)."""
    import pyarrow.compute as pc

    from ..stages.ids import md5_hex

    def key(t: pa.Table) -> pa.Table:
        salted = pc.binary_join_element_wise(
            t["doc_id"].combine_chunks().cast(pa.string()),
            pa.scalar(SHUFFLE_SALT), pa.scalar(""))
        return pa.table({"doc_id": t["doc_id"],
                         "skey": md5_hex(salted)})

    head = (read_parquet_clean(_seq_files(sf_dir), columns=["doc_id"])
            .map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
            .sort("skey")
            .limit(SHUFFLE_HEAD)
            .to_pandas())
    head.insert(0, "rank", np.arange(1, len(head) + 1, dtype=np.int64))
    return head


# ------------------------------------------------------------- data mixing

#: target per-source keep rates for the mixture pass — downweights the
#: 55%-hot source and keeps the rare ones whole (the classic "rebalance
#: the crawl against the curated sets" step before training).
MIX_SALT = ":mix1"
MIX_RATES: dict[str, float] = {
    "github_audit": 0.10,
    "cloudtrail": 0.40,
    "access_log": 0.80,
    "vpc_flow": 1.0,
    "debug": 1.0,
    "unknown_src": 1.0,
}


def _mix_threshold_hex(rate: float) -> str:
    """Keep row iff the first 4 hex digits of md5(doc_id||salt) compare
    below this literal — string compare ≡ numeric compare at fixed
    width, so both Arrow and DuckDB evaluate the identical predicate
    with no hex→int parse. rate ≥ 1.0 must keep EVERY row: 65536 as
    '10000' is 5 chars and lexicographically BELOW almost every 4-char
    coin (review finding: it silently kept only the '0…' sixteenth),
    so keep-all uses 'g000' — 'g' sorts after every hex digit, width
    stays 4, and no coin can equal or exceed it."""
    n = min(65536, int(rate * 65536))
    return "g000" if n >= 65536 else format(n, "04x")


def q_seq_mixture(sf_dir: str) -> ray.data.Dataset:
    """Weighted DATA-MIXING sampler: each source is kept at its target
    rate via a deterministic content-hash coin (md5(doc_id||salt) —
    reproducible, order/parallelism independent, re-salt for a fresh
    epoch). Output: per-source kept rows + kept token mass, SQL-checked.

    Scale: pure per-batch filter (zero shuffle) + per-batch partial
    (source → count, Σn_tok) folded by the bounded combine tree
    (``agg.tree_fold_sum``) — only ``#blocks × #sources`` partial rows
    ever move. Unknown sources default to keep-all, so a
    schema drift never silently drops data."""
    import pyarrow.compute as pc

    from ..stages.ids import md5_hex

    srcs = pa.array(list(MIX_RATES))
    thresholds = pa.array([_mix_threshold_hex(r) for r in MIX_RATES.values()])

    def sample(batch: pa.Table) -> pa.Table:
        salted = pc.binary_join_element_wise(
            batch["doc_id"].combine_chunks().cast(pa.string()),
            pa.scalar(MIX_SALT), pa.scalar(""))
        coin = pc.utf8_slice_codeunits(md5_hex(salted), 0, 4)
        # per-row threshold via dictionary gather on source
        idx = pc.index_in(batch["source"], value_set=srcs)
        thr = pc.take(thresholds, pc.fill_null(idx, len(srcs) - 1))
        thr = pc.if_else(pc.is_null(idx), pa.scalar("g000"), thr)
        kept = batch.filter(pc.less(coin, thr))
        # partial aggregate: one row per (source) per batch
        g = pa.TableGroupBy(kept.select(["source", "n_tok"]), ["source"])
        part = g.aggregate([("n_tok", "sum"), ("source", "count")])
        return part.rename_columns(["source", "tok_kept", "rows_kept"])

    ds = read_parquet_clean(_seq_files(sf_dir),
                               columns=["doc_id", "source", "n_tok"])
    from .agg import tree_fold_sum
    return tree_fold_sum(
        ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True),
        ["source"], ["rows_kept", "tok_kept"])


# ----------------------------------------- temperature-rebalanced mixing

TEMP_ALPHA = 0.7        # rebalancing exponent: α<1 flattens toward rare
TEMP_SALT = ":temp1"


def q_seq_mixture_temp(sf_dir: str, alpha: float = TEMP_ALPHA
                       ) -> ray.data.Dataset:
    """TEMPERATURE-rebalanced data mixing — the multilingual-LM
    α-sampling recipe (sample source s ∝ p_s^α; α<1 upweights rare
    sources): unlike ``q_seq_mixture`` the keep rates are derived FROM
    the corpus — ``rate_s = (p_s^α / p_s) / max_t(p_t^α / p_t)``, so
    the rarest source keeps everything and hot sources downsample
    toward balance, with no hand-set weight table to drift stale.

    Scale: pass 1 is per-batch (source, count) partials → the bounded
    combine tree (#blocks × #sources rows cross, a pruned one-column
    read);
    the driver does #sources float ops; pass 2 is the q_seq_mixture
    ZERO-SHUFFLE hash-coin filter under the derived thresholds.
    Oracle: DuckDB independently re-derives shares → lifts → rates →
    the same fixed-width hex thresholds from the raw table itself —
    the rate DERIVATION is checked, not just the filter."""
    import pyarrow.compute as pc

    from ..stages.ids import md5_hex

    def count_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["source"]), ["source"])
        return g.aggregate([("source", "count")]) \
            .rename_columns(["source", "c"])

    from .agg import tree_fold_sum
    counts = tree_fold_sum(
        read_parquet_clean(_seq_files(sf_dir), columns=["source"])
        .map_batches(count_partial, batch_format="pyarrow",
                     zero_copy_batch=True),
        ["source"], ["c"]).to_pandas()
    c = counts["c"].to_numpy(dtype=np.float64)
    p = c / c.sum()
    lift = np.power(p, alpha) / p
    rates = lift / lift.max()
    srcs = pa.array(counts["source"].tolist())
    thresholds = pa.array([_mix_threshold_hex(float(r)) for r in rates])

    def sample(batch: pa.Table) -> pa.Table:
        salted = pc.binary_join_element_wise(
            batch["doc_id"].combine_chunks().cast(pa.string()),
            pa.scalar(TEMP_SALT), pa.scalar(""))
        coin = pc.utf8_slice_codeunits(md5_hex(salted), 0, 4)
        idx = pc.index_in(batch["source"], value_set=srcs)
        thr = pc.take(thresholds, pc.fill_null(idx, 0))
        # a source unseen in pass 1 can't occur on one input, but the
        # q_seq_mixture schema-drift rule holds: unknown ⇒ keep-all
        thr = pc.if_else(pc.is_null(idx), pa.scalar("g000"), thr)
        kept = batch.filter(pc.less(coin, thr))
        g = pa.TableGroupBy(kept.select(["source", "n_tok"]), ["source"])
        part = g.aggregate([("n_tok", "sum"), ("source", "count")])
        return part.rename_columns(["source", "tok_kept", "rows_kept"])

    ds = read_parquet_clean(_seq_files(sf_dir),
                               columns=["doc_id", "source", "n_tok"])
    return tree_fold_sum(
        ds.map_batches(sample, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["source"], ["rows_kept", "tok_kept"])


# --------------------------------------------------------- bigram top-k

BIGRAM_TOPK = 50


_BIGRAM_SCHEMA = pa.schema([("tok_a", pa.int32()), ("tok_b", pa.int32()),
                            ("n", pa.int32()), ("bucket", pa.int16())])


def _bigram_partial(batch: pa.Table) -> pa.Table:
    """Per-batch sparse bigram histogram: adjacent token pairs within
    each sequence, collapsed by ``np.unique`` BEFORE the shuffle — the
    exchange moves distinct (pair, count) partials, never the 10^12
    raw pairs. Partial rows are deliberately NARROW (two int32 tokens +
    int32 count + int16 bucket ≈ 14 B/row vs 24 for int64 triples):
    on a near-uniform corpus the distinct-pair set barely collapses,
    so exchange bytes ARE the cost — measured 470 s → 150 s at
    sf0.1/32 CPUs together with the hash-repartition reducer below."""
    toks = batch["tokens"].combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    flat = toks.values.to_numpy(zero_copy_only=False).astype(np.int64)
    # normalize away any slice offset: .values spans the WHOLE child
    # buffer even for sliced arrays, so window it to [offs[0], offs[-1])
    flat = flat[offs[0]:offs[-1]]
    offs = offs - offs[0]
    if flat.size < 2:
        return _BIGRAM_SCHEMA.empty_table()
    valid = np.ones(flat.size - 1, dtype=bool)
    # positions where the NEXT element starts a new sequence
    ends = offs[1:-1] - 1                    # index into flat[:-1]
    valid[ends[(ends >= 0) & (ends < valid.size)]] = False
    keys = flat[:-1][valid] * VOCAB + flat[1:][valid]
    uk, cnt = np.unique(keys, return_counts=True)
    return pa.table({
        "tok_a": pa.array((uk // VOCAB).astype(np.int32)),
        "tok_b": pa.array((uk % VOCAB).astype(np.int32)),
        "n": pa.array(cnt.astype(np.int32)),
        "bucket": pa.array((uk % BIGRAM_BUCKETS).astype(np.int16)),
    })


#: key-space partitions for the bigram exchange — whole buckets land in
#: whole blocks (block-local top-k stays exact); sized well above any
#: test cluster so partition balance is hash-smooth, and int16-narrow
BIGRAM_BUCKETS = 512


def q_bigram_topk_shuffle(sf_dir: str, k: int = BIGRAM_TOPK) -> pd.DataFrame:
    """GENERIC-KEYSPACE bigram top-k (count desc, then pair asc):
    per-batch ``np.unique`` partials, narrow 14 B rows → ONE hash
    repartition on the bigram's bucket → per-bucket vectorized merge →
    per-bucket top-k (exact: a bigram lives wholly in one bucket) →
    ``buckets × k``-row driver merge.

    This is the fallback for key spaces too large to densify (higher-n
    n-grams, big vocabs). On a NEAR-UNIFORM corpus partials barely
    collapse, so the exchange carries ~1 row per raw pair and Ray's
    shuffle machinery is the floor — measured 470 s at sf0.1/32 CPUs
    (sort- and hash-strategy alike) vs 40–135 s for the dense-slice
    plan in ``q_bigram_topk`` (shared-VM band over repeat runs), which
    is why it is not the default here."""
    from ..util import enable_hash_shuffle, keyed_partition_count

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"bigram": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        keys = (df["tok_a"].to_numpy().astype(np.int64) * VOCAB
                + df["tok_b"].to_numpy())
        cnts = df["n"].to_numpy()
        uk, inv = np.unique(keys, return_inverse=True)
        tot = np.bincount(inv, weights=cnts).astype(np.int64)
        sel = _topk_select(uk, tot, k)
        order = sel[np.lexsort((uk[sel], -tot[sel]))]
        return pd.DataFrame({"bigram": uk[order], "n": tot[order]})

    import pyarrow.parquet as _pq
    files = _seq_files(sf_dir)
    n_rows = sum(_pq.read_metadata(f).num_rows for f in files)
    parts = (read_parquet_clean(files, columns=["tokens"])
             .map_batches(_bigram_partial, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=32768))
    # exchange volume ≈ one 14 B partial row per raw pair (near-uniform
    # corpora barely collapse); partition count follows bytes AND CPUs,
    # and is passed to enable_hash_shuffle so aggregator reservations
    # are sized for the ACTUAL partition count (otherwise an explicit
    # count larger than the cluster default multiplies reservations
    # past the cluster and starves the upstream map — observed >580 s
    # at sf0.1 before this plumbing).
    n_parts = keyed_partition_count(n_rows * 14 * 130)
    enable_hash_shuffle(parts, n_parts)
    ds = (parts.repartition(n_parts, keys=["bucket"])
          .map_batches(bucket_topk, batch_format="pandas", batch_size=None))
    df = ds.to_pandas()
    order = np.lexsort((df["bigram"].to_numpy(), -df["n"].to_numpy()))[:k]
    df = df.iloc[order]
    return pd.DataFrame({
        "tok_a": (df["bigram"] // VOCAB).astype("int32"),
        "tok_b": (df["bigram"] % VOCAB).astype("int32"),
        "n": df["n"].astype("int64"),
    }).reset_index(drop=True)


def _topk_select(keys_sorted: np.ndarray, cnt: np.ndarray,
                 k: int) -> np.ndarray:
    """Indices of the top-k by (count desc, key asc) — TIE-SAFE.
    ``np.argpartition(-cnt, k)`` alone keeps an ARBITRARY subset of the
    keys tied at the boundary count, which silently breaks the key-asc
    tie-break (caught by the sf0.01 oracle: a count-3 tie at rank 50
    kept key 6924/23545 over 6778/12426). ``keys_sorted`` must be
    ascending (np.unique / flatnonzero output), so among tied keys the
    FIRST indices are the smallest keys."""
    take = min(k, cnt.size)
    if take == cnt.size:
        return np.arange(cnt.size)
    th = np.partition(cnt, cnt.size - take)[cnt.size - take]
    above = np.flatnonzero(cnt > th)
    tied = np.flatnonzero(cnt == th)[:take - above.size]
    return np.concatenate([above, tied])


class _BigramSliceImpl:
    """Reducer actor owning one contiguous slice of the bigram key
    space as a DENSE count array (the raw-actor escape hatch: a shared
    mutable accumulator is the one shape the Dataset API can't
    express). Scan tasks push raw uint32 keys (4 B/pair — 3.5× leaner
    than the sparse partial rows, and no np.unique sort on the send
    side); the add is one in-place ``np.add.at``."""

    # Once this many pairs have landed in ONE slice, a single uint32
    # cell could in principle be approaching wrap (2^32); the slice
    # upgrades itself to uint64 cells — memory doubles only for slices
    # that are actually that hot (ADVICE r3: the wrap was documented
    # but unchecked).
    _UINT32_SAFE_TOTAL = 1 << 31

    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hist = np.zeros(hi - lo, dtype=np.uint32)
        self.total = 0

    def add(self, keys: np.ndarray) -> int:
        # np.unique first: ``hist[uk] += cnt`` with UNIQUE indices is a
        # plain vectorized gather-add (~100 M/s) where np.add.at with
        # duplicate indices crawls at ~0.7 M/s — measured 1.15 s vs
        # 0.12 s per 800k-key batch — half the reducer-side cost of the
        # sf0.1 win (470 s → 40–135 s band)
        self.total += len(keys)
        if (self.hist.dtype == np.uint32
                and self.total > self._UINT32_SAFE_TOTAL):
            self.hist = self.hist.astype(np.uint64)
        uk, cnt = np.unique(keys.astype(np.int64), return_counts=True)
        self.hist[uk - self.lo] += cnt.astype(self.hist.dtype)
        return len(keys)

    def topk(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        nz = np.flatnonzero(self.hist)
        if nz.size == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        cnt = self.hist[nz].astype(np.int64)
        sel = _topk_select(nz, cnt, k)
        order = sel[np.lexsort((nz[sel], -cnt[sel]))]
        return (nz[order].astype(np.int64) + self.lo, cnt[order])


# actor wrapper kept separate so the accumulator logic (incl. the
# uint32→uint64 self-upgrade) is unit-testable without a Ray actor
_BigramSlice = ray.remote(_BigramSliceImpl)


def _bigram_keys(t: pa.Table) -> np.ndarray:
    """Token table → within-row bigram keys. Key math stays in uint32
    end to end — VOCAB² < 2^32, so the wrap-free product needs no
    int64 copies (measured ~2× on the keygen step)."""
    toks = t["tokens"].combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    flat = toks.values.to_numpy(zero_copy_only=False)
    flat = flat[offs[0]:offs[-1]].astype(np.uint32)
    offs = offs - offs[0]
    if flat.size < 2:
        return np.empty(0, dtype=np.uint32)
    valid = np.ones(flat.size - 1, dtype=bool)
    ends = offs[1:-1] - 1
    valid[ends[(ends >= 0) & (ends < valid.size)]] = False
    return flat[:-1][valid] * np.uint32(VOCAB) + flat[1:][valid]


@ray.remote
def _bigram_scan(path: str, row_groups: list[int], reducers: list,
                 slice_width: int) -> int:
    """Scan a RANGE OF ROW GROUPS of one input file (not the whole
    file — ADVICE r3: per-file scans pinned a whole file's pair array
    resident and gave a single-file corpus exactly one task), emit raw
    bigram keys partitioned by key range, push each range's keys to
    its slice owner. Returns the pair count (reconciliation). Bigrams
    never span rows, so row-group boundaries are exact cut points."""
    import pyarrow.parquet as _pq
    pf = _pq.ParquetFile(path)
    total = 0
    for rg in row_groups:
        keys = _bigram_keys(pf.read_row_group(rg, columns=["tokens"]))
        if keys.size == 0:
            continue
        sl = keys // np.uint32(slice_width)
        ray.get([reducers[r].add.remote(keys[sl == r])
                 for r in range(len(reducers))])
        total += int(keys.size)
    return total


def _bigram_scan_plan(files: list[str]) -> list[tuple[str, list[int]]]:
    """(file, row-group range) work items: split every file at
    row-group boundaries into chunks of ≤ _SCAN_TARGET_ROWS so peak
    scan memory is bounded by the chunk, and a few-file corpus still
    fans out across the cluster."""
    import pyarrow.parquet as _pq
    items: list[tuple[str, list[int]]] = []
    for f in files:
        md = _pq.read_metadata(f)
        cur: list[int] = []
        rows = 0
        for rg in range(md.num_row_groups):
            cur.append(rg)
            rows += md.row_group(rg).num_rows
            if rows >= _SCAN_TARGET_ROWS:
                items.append((f, cur))
                cur, rows = [], 0
        if cur:
            items.append((f, cur))
    return items


_SCAN_TARGET_ROWS = 262_144   # rows per scan task (~a few hundred MB of
                              # token pairs at typical seq lengths)


def _dense_bigram_fits() -> bool:
    """True if the dense reducer slices (VOCAB² uint32 cells split
    across the reducers) fit comfortably in the cluster's worker heap.
    ADVICE r3: the dense plan allocated ~10 GB of histograms
    unconditionally; on a small node that OOMs with no guard. Ray's
    ``memory`` resource is the heap it schedules against — require the
    dense slices to take at most half of it, else fall back to the
    sparse exchange plan."""
    need = VOCAB * VOCAB * 4
    avail = ray.cluster_resources().get("memory", 0)
    return avail == 0 or need <= avail * 0.5


def q_bigram_topk(sf_dir: str, k: int = BIGRAM_TOPK) -> pd.DataFrame:
    """Top-k token BIGRAMS corpus-wide (count desc, then pair asc) —
    the n-gram statistics pass (tokenizer audits, contamination
    n-grams). DEFAULT plan: dense-slice reducer actors. The bigram key
    space is VOCAB² < 2^32, so R reducer actors can own contiguous
    DENSE uint32 count slices (Σ = 16 GB across the cluster at full
    vocab — per-node slices shrink 1/R as the cluster grows); scan
    tasks ship raw 4-byte keys straight to each slice's owner and the
    reduce is one in-place vectorized add. No shuffle machinery, no
    sparse merge, no sort anywhere: measured ~8× over the generic
    sparse exchange (``q_bigram_topk_shuffle``, kept for key spaces
    too big to densify) at sf0.1 — 470 s → 40–135 s across repeat
    runs on the shared VM — because a
    near-uniform corpus gives sparse partials ~1 row per raw pair
    while the dense add is O(1)/pair. Exact by construction (integer
    adds; per-slice top-k is globally exact since a bigram lives
    wholly in one slice). Overflow-safe: a slice upgrades its cells to
    uint64 once its pair total could approach uint32 wrap (see
    ``_BigramSlice.add``). Falls back to the sparse exchange when the
    dense slices would not fit in the cluster heap
    (``_dense_bigram_fits``)."""
    from ..util import cluster_cpus

    if not _dense_bigram_fits():
        return q_bigram_topk_shuffle(sf_dir, k=k)

    files = _seq_files(sf_dir)
    keyspace = VOCAB * VOCAB
    n_red = max(4, min(cluster_cpus() // 2, 16))
    slice_width = -(-keyspace // n_red)          # equal-width ranges
    # FRACTIONAL reservations: n_red full-CPU actors would reserve the
    # whole 4-CPU pytest cluster and the scan tasks could never
    # schedule (the same reservation-deadlock class enable_hash_shuffle
    # guards against). Reducers reserve half the cluster between them
    # and borrow idle CPU for their bursty adds.
    red_cpu = max(0.05, (cluster_cpus() / 2) / n_red)
    reducers = [_BigramSlice.options(num_cpus=red_cpu).remote(
                    r * slice_width, min((r + 1) * slice_width, keyspace))
                for r in range(n_red)]
    try:
        ray.get([_bigram_scan.remote(f, rgs, reducers, slice_width)
                 for f, rgs in _bigram_scan_plan(files)])
        tops = ray.get([r.topk.remote(k) for r in reducers])
    finally:
        for r in reducers:
            ray.kill(r)
    keys = np.concatenate([t[0] for t in tops])
    cnts = np.concatenate([t[1] for t in tops])
    order = np.lexsort((keys, -cnts))[:k]
    return pd.DataFrame({
        "tok_a": (keys[order] // VOCAB).astype("int32"),
        "tok_b": (keys[order] % VOCAB).astype("int32"),
        "n": cnts[order].astype("int64"),
    }).reset_index(drop=True)


# ---------------------------------------------------- per-source token budget

TOKEN_BUDGET = 400_000       # tokens admitted per source (epoch quota)
BUDGET_BUCKET_MIN = 8192     # smallest doc_idx bucket (test/sandbox scale)
BUDGET_MAX_BUCKETS = 65_536  # offsets-table bound: ≤ this many buckets
                             # (× #sources rows on the driver, a few MB)


def budget_bucket_size(n_rows: int) -> int:
    """doc_idx rows per offset bucket, DERIVED from the corpus row
    count (parquet footers — no data read) so the driver offsets table
    stays bounded at any scale: the bucket is the smallest power of two
    ≥ ``n_rows / BUDGET_MAX_BUCKETS`` (and ≥ ``BUDGET_BUCKET_MIN``).
    10^12 rows → bucket ≈ 1.5·10^7 ⇒ ~65k buckets regardless of corpus
    size. Power-of-two so re-runs at nearby corpus sizes mostly reuse
    the same bucketing (closes VERDICT r3 item 6 — was a manual knob)."""
    need = -(-max(1, n_rows) // BUDGET_MAX_BUCKETS)   # ceil division
    b = BUDGET_BUCKET_MIN
    while b < need:
        b <<= 1
    return b


def q_seq_token_budget(sf_dir: str,
                       budget: int = TOKEN_BUDGET) -> ray.data.Dataset:
    """Per-source TOKEN-BUDGET cap: admit each source's sequences in
    global doc order until its running token total exceeds ``budget``
    (the per-source quota / epoch-budget pass of a mixture pipeline).
    Output: per-source admitted rows + tokens, SQL-checked against a
    windowed running-sum oracle.

    Scale plan — a per-key PREFIX SUM without a global sort and
    without keying the exchange on the 55%-hot source column:
    (1) per-batch partials of (source, doc_idx-bucket) token sums →
    a driver-small offsets table (#sources × #buckets; bucket size
    auto-derived from footer row counts, see ``budget_bucket_size``);
    (2) driver cumsum per source → exclusive
    bucket-start offsets, ``ray.put`` broadcast; (3) ONE hash
    repartition keyed on the UNIFORM bucket id co-locates each bucket;
    (4) block-local: order by doc_idx, within-(source,bucket) cumsum +
    broadcast offset = the row's global running total — keep iff
    ≤ budget; (5) per-source partial counts → bounded tree fold (agg.tree_fold_sum)."""
    import pyarrow.compute as pc

    from ..stages.ids import doc_index
    from ..util import enable_hash_shuffle, keyed_partition_count

    import pyarrow.parquet as _pq

    files = _seq_files(sf_dir)
    bucket_sz = budget_bucket_size(
        sum(_pq.read_metadata(f).num_rows for f in files))

    def bucket_partial(t: pa.Table) -> pa.Table:
        idx = doc_index(t)
        b = pc.cast(pc.divide(idx, bucket_sz), pa.int64())
        part = pa.table({"source": t["source"], "bucket": b,
                         "n_tok": pc.cast(t["n_tok"], pa.int64())})
        return pa.TableGroupBy(part, ["source", "bucket"]).aggregate(
            [("n_tok", "sum")]).rename_columns(["source", "bucket", "tok"])

    ds = read_parquet_clean(files,
                               columns=["doc_id", "source", "n_tok"])
    sums = ds.map_batches(bucket_partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    sums = sums.groupby(["source", "bucket"], as_index=False)["tok"].sum() \
        .sort_values(["source", "bucket"])
    # exclusive prefix: tokens admitted BEFORE each bucket starts
    sums["offset"] = sums.groupby("source")["tok"].cumsum() - sums["tok"]
    offsets_ref = ray.put({(s, int(b)): int(o) for s, b, o in
                           zip(sums["source"], sums["bucket"],
                               sums["offset"])})

    def add_bucket(t: pa.Table) -> pa.Table:
        idx = doc_index(t)
        return pa.table({
            "source": t["source"],
            "n_tok": pc.cast(t["n_tok"], pa.int64()),
            "doc_idx": idx,
            "bucket": pc.cast(pc.divide(idx, bucket_sz), pa.int64()),
        })

    _OUT = pa.schema([("source", pa.string()), ("rows_kept", pa.int64()),
                      ("tok_kept", pa.int64())])

    def admit_block(df_: pd.DataFrame) -> pd.DataFrame:
        if df_.empty:
            return _OUT.empty_table().to_pandas()
        offsets = ray.get(offsets_ref)
        df_ = df_.sort_values("doc_idx", kind="stable")
        run = df_.groupby(["source", "bucket"])["n_tok"].cumsum()
        base = pd.Series(
            [offsets[(s, int(b))] for s, b in
             zip(df_["source"], df_["bucket"])], index=df_.index)
        kept = df_[(run + base) <= budget]
        out = kept.groupby("source", as_index=False).agg(
            rows_kept=("n_tok", "size"), tok_kept=("n_tok", "sum"))
        return out.astype({"rows_kept": "int64", "tok_kept": "int64"})

    tagged = ds.map_batches(add_bucket, batch_format="pyarrow",
                            zero_copy_batch=True)
    n_parts = keyed_partition_count()
    enable_hash_shuffle(tagged, n_parts)
    from .agg import tree_fold_sum
    return tree_fold_sum(
        tagged.repartition(n_parts, keys=["bucket"])
        .map_batches(admit_block, batch_format="pandas", batch_size=None),
        ["source"], ["rows_kept", "tok_kept"])


# ---------------------------------------------- stratified exact-quota sample

STRAT_SALT = ":strat1"
STRAT_QUOTA = 500          # rows kept per source
STRAT_BUCKETS = 64         # level-2 fan-in width (see docstring)


def q_seq_stratified(sf_dir: str, quota: int = STRAT_QUOTA
                     ) -> ray.data.Dataset:
    """Stratified EXACT-QUOTA sampling: the first ``quota`` rows per
    source under the deterministic md5(doc_id||salt) order — the
    "N examples from every source" eval-set / ablation draw that
    rate-based sampling (q_seq_mixture) can't guarantee. md5 keys are
    distinct so the order is total and the draw reproducible at any
    parallelism.

    Scale shape — per-key top-Q with a TWO-LEVEL combiner, no global
    sort: (1) each block keeps its local Q-head per source (block
    output ≤ Q×#sources rows); (2) partials fold per (source,
    hash-bucket) — the salted-key recipe, so one source's survivors
    spread over ``STRAT_BUCKETS`` groups of ≤ its own Q-heads instead
    of one group of #blocks×Q (at 10^12 rows, #blocks ~10^6 would make
    the single-level fold group itself corpus-shaped); (3) the final
    per-source fold sees ≤ STRAT_BUCKETS×Q bounded rows and assigns
    ranks. top-Q(∪ parts) = top-Q(∪ top-Q(parts)) makes every level
    exact. Output: (source, rank, doc_id), SQL-checked against a
    row_number() window oracle."""
    import pyarrow.compute as pc

    from ..stages.ids import md5_hex

    def local_head(t: pa.Table) -> pd.DataFrame:
        salted = pc.binary_join_element_wise(
            t["doc_id"].combine_chunks().cast(pa.string()),
            pa.scalar(STRAT_SALT), pa.scalar(""))
        df_ = pd.DataFrame({
            "source": t["source"].to_pandas(),
            "doc_id": t["doc_id"].to_pandas(),
            "skey": md5_hex(salted).to_pandas(),
        })
        df_ = df_.sort_values(["source", "skey"], kind="mergesort") \
            .groupby("source", sort=False).head(quota)
        # level-2 routing key: stable content hash of the SORT key so
        # bucket membership never depends on parallelism
        df_["bucket"] = (
            df_["skey"].str[:4].apply(int, base=16) % STRAT_BUCKETS
        ).astype("int64")
        return df_

    def bucket_head(df_: pd.DataFrame) -> pd.DataFrame:
        return df_.sort_values("skey", kind="mergesort").head(quota)

    def final_head(df_: pd.DataFrame) -> pd.DataFrame:
        df_ = df_.sort_values("skey", kind="mergesort").head(quota)
        return pd.DataFrame({
            "source": df_["source"].to_numpy(),
            "rank": np.arange(1, len(df_) + 1, dtype=np.int64),
            "doc_id": df_["doc_id"].to_numpy(),
        })

    ds = read_parquet_clean(_seq_files(sf_dir),
                               columns=["doc_id", "source"])
    partial = ds.map_batches(local_head, batch_format="pyarrow",
                             zero_copy_batch=True)
    # repartition(1) before the final fold: its input is ≤ #sources ×
    # STRAT_BUCKETS × quota rows BY CONSTRUCTION (level-2 already
    # folded), so one partition is safe at any corpus size and avoids
    # the schema-less empty reduce bundles Ray's Aggregate emits for
    # keyless partitions (the q_media_stats recipe).
    return (partial.groupby(["source", "bucket"]).map_groups(
                bucket_head, batch_format="pandas")
            .repartition(1)
            .groupby("source").map_groups(
                final_head, batch_format="pandas"))


# ------------------------------------------------- curriculum / global rank

CURRICULUM_SHARD = 4096     # sequences per curriculum shard


def q_seq_curriculum(sf_dir: str,
                     shard_size: int = CURRICULUM_SHARD) -> ray.data.Dataset:
    """Curriculum ordering: GLOBAL rank of every sequence by
    (n_tok DESC, doc_id ASC) → shard = rank // shard_size → per-shard
    stats. SQL-checked against a ``row_number()`` window oracle.

    This implements the distributed **zipWithIndex** primitive Ray Data
    lacks: (1) range-partition sort, materialized once (the sort is the
    inherent all-to-all; ranks are global prefix counts so SOME barrier
    is unavoidable); (2) a metadata pass collecting per-block
    (first_key, row_count) — #blocks tiny rows to the driver, never
    data; (3) cumulative offsets keyed by each block's first row (rows
    are unique ⇒ unambiguous); (4) a second map over the SAME
    materialized blocks assigns rank = block_offset + local position,
    then folds per-shard partials. Only stats cross to the driver."""
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min
    from ray.data.aggregate import Sum as _Sum

    ds = read_parquet_clean(_seq_files(sf_dir), columns=["doc_id", "n_tok"])
    sorted_ds = ds.sort(["n_tok", "doc_id"],
                        descending=[True, False]).materialize()

    def block_meta(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"first_ntok": pa.array([], type=pa.int32()),
                             "first_doc": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64())})
        return pa.table({"first_ntok": t["n_tok"].slice(0, 1),
                         "first_doc": t["doc_id"].slice(0, 1),
                         "rows": pa.array([len(t)], type=pa.int64())})

    meta = sorted_ds.map_batches(block_meta, batch_format="pyarrow",
                                 zero_copy_batch=True,
                                 batch_size=None).to_pandas()
    meta = meta.sort_values(["first_ntok", "first_doc"],
                            ascending=[False, True], kind="stable")
    offsets = np.concatenate([[0], meta["rows"].to_numpy().cumsum()[:-1]])
    offset_of = {(int(a), b): int(o) for a, b, o in
                 zip(meta["first_ntok"], meta["first_doc"], offsets)}

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"shard": pa.array([], type=pa.int64()),
                             "n_rows": pa.array([], type=pa.int64()),
                             "tok_sum": pa.array([], type=pa.int64()),
                             "max_tok": pa.array([], type=pa.int32()),
                             "min_tok": pa.array([], type=pa.int32())})
        key = (int(t["n_tok"][0].as_py()), t["doc_id"][0].as_py())
        rank = offset_of[key] + np.arange(len(t), dtype=np.int64)
        shard = rank // shard_size
        part = pa.table({"shard": pa.array(shard, type=pa.int64()),
                         "n_tok": t["n_tok"]})
        g = pa.TableGroupBy(part, ["shard"]).aggregate(
            [("n_tok", "count"), ("n_tok", "sum"),
             ("n_tok", "max"), ("n_tok", "min")])
        return g.rename_columns(
            ["shard", "n_rows", "tok_sum", "max_tok", "min_tok"])

    return (sorted_ds.map_batches(assign, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None)
            .groupby("shard")
            .aggregate(_Sum("n_rows", alias_name="n_rows"),
                       _Sum("tok_sum", alias_name="tok_sum"),
                       _Max("max_tok", alias_name="max_tok"),
                       _Min("min_tok", alias_name="min_tok")))
