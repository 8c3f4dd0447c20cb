"""Driver-mimicking correctness check: run every queries() entry and its
oracle_sql() twin side-by-side, compare row count + column names +
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

import ray
import ray.data


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical rows: stringify (lists -> tuple str), sort rows
    def canon(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "<null>"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "[" + ",".join(str(x) for x in v) + "]"
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)
    rows = sorted("\x1f".join(canon(v) for v in row) for row in df.itertuples(index=False, name=None))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        p = Path(sf_dir) / f"{name}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_ray = time.time() - t0
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(got)} rows, {t_ray:.1f}s)")
            continue
        t0 = time.time()
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_sql = time.time() - t0
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems and value_hash(got) != value_hash(want):
            problems.append("value-hash mismatch")
            merged = got.reindex(sorted(got.columns), axis=1)
            merged_w = want.reindex(sorted(want.columns), axis=1)
            print(merged.head(3).to_string())
            print(merged_w.head(3).to_string())
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, ray {t_ray:.1f}s, sql {t_sql:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
