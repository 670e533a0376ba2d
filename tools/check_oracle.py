#!/usr/bin/env python
"""Local simulation of the driver's correctness gate: run every queries()
entry at an sf dir and diff against oracle_sql() via DuckDB (row count,
column names, order-insensitive values).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def to_df(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    # spill OUTSIDE the repo: duckdb's default temp dir is cwd-relative
    # .tmp/, which pollutes the working tree (and once leaked multi-GB
    # block files into a commit)
    con.execute("SET temp_directory = '/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = to_df(fn(sf_dir))
        except Exception as e:
            failures.append((name, f"query raised: {e!r}"))
            print(f"ERROR {name}: {e!r}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows, cols={sorted(got.columns)}")
            continue
        want = con.execute(oracles[name]).fetchdf()
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"columns {list(g.columns)} != {list(w.columns)}"))
            print(f"FAIL {name}: column mismatch {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} != {len(w)}"))
            print(f"FAIL {name}: row count {len(g)} vs {len(w)}")
            continue
        eq = True
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np

                if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                    eq = False
                    break
            else:
                try:
                    same = (a.astype(str) == b.astype(str)).all()
                except Exception:
                    same = a.tolist() == b.tolist()
                if not same:
                    eq = False
                    break
        if eq:
            print(f"OK   {name}: {len(g)} rows")
        else:
            failures.append((name, f"value mismatch in column {c}"))
            print(f"FAIL {name}: values differ in {c}")
            print("  got :", g.head(3).to_dict("records"))
            print("  want:", w.head(3).to_dict("records"))

    print(f"\n{len(failures)} failures")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
