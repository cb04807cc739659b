"""Local simulation of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` side-by-side at a given
sf, compare row-count + sorted-column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [--only name1,name2]
"""

from __future__ import annotations

import sys
import time


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def normalize(df):
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith(("uint", "UInt")):
            df[c] = df[c].astype("int64", errors="ignore")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="stable")
    return df.reset_index(drop=True)


def main(sf_dir: str, only: set[str] | None = None) -> int:
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, osql = e.queries(), e.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query name(s): {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in osql:
            print(f"ok   {name}: rows-only ({len(mine)} rows, {dt:.1f}s)")
            continue
        try:
            oracle = normalize(con.execute(osql[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}")
            failures += 1
            continue
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != "
                  f"{list(oracle.columns)}")
            failures += 1
            continue
        if len(mine) != len(oracle):
            print(f"FAIL {name}: rows {len(mine)} != {len(oracle)}")
            failures += 1
            continue
        eq = mine.equals(oracle)
        if not eq:
            # dtype-insensitive value compare
            try:
                eq = all(
                    (mine[c].astype(str).values == oracle[c].astype(str).values).all()
                    for c in mine.columns)
            except Exception:
                eq = False
        if eq:
            print(f"ok   {name}: {len(mine)} rows match oracle ({dt:.1f}s)")
        else:
            print(f"FAIL {name}: value mismatch")
            for c in mine.columns:
                a, b = mine[c], oracle[c]
                if not (a.astype(str).values == b.astype(str).values).all():
                    bad = (a.astype(str).values != b.astype(str).values)
                    i = bad.argmax()
                    print(f"  col {c}: first diff at row {i}: "
                          f"{a.iloc[i]!r} vs {b.iloc[i]!r} ({bad.sum()} diffs)")
            failures += 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):
            print("usage: check_oracle.py [sf_dir] --only n1,n2")
            raise SystemExit(1)
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sf = args[0] if args else "/root/testdata/sf0.01"
    raise SystemExit(main(sf, only))
