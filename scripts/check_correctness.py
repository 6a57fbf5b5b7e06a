"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry, compare against ``oracle_sql()`` via DuckDB
(row count + column set + order-insensitive value comparison).

Usage: python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_arrow(res):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return pa.concat_tables(
            list(res.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
        ) if res.count() else res.schema().base_schema.empty_table()
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res)
    return res


def canon(tbl):
    """Sorted-by-name columns, rows sorted — comparable form."""
    import pandas as pd

    df = tbl.to_pandas()
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # normalize dtypes for comparison
    return df


def compare(name, ray_tbl, sql_tbl) -> list[str]:
    problems = []
    a, b = canon(ray_tbl), canon(sql_tbl)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: ray={list(a.columns)} sql={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: ray={len(a)} sql={len(b)}")
        return problems
    import pandas as pd

    for col in a.columns:
        av, bv = a[col], b[col]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = ((av.isna() & bv.isna()) | (abs(av - bv) < 1e-9)).all()
            else:
                ok = (av.astype(str) == bv.astype(str)).all()
        except Exception as e:
            ok = False
            problems.append(f"col {col}: compare error {e}")
            continue
        if not ok:
            bad = (av.astype(str) != bv.astype(str))
            idx = bad[bad].index[:3].tolist()
            problems.append(
                f"col {col}: {int(bad.sum())} mismatches, e.g. "
                + "; ".join(f"ray={av[i]!r} sql={bv[i]!r}" for i in idx)
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional: restrict to these query names

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ray_res = to_arrow(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        wall = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={ray_res.num_rows} ({wall:.1f}s, rows-only)")
            continue
        sql_res = con.execute(oracles[name]).fetch_arrow_table()
        problems = compare(name, ray_res, sql_res)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: ({wall:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name}: rows={ray_res.num_rows} ({wall:.1f}s)")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
