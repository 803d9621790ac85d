"""Local simulation of the driver's correctness gate.

Runs each ``queries()`` callable and its ``oracle_sql()`` DuckDB equivalent
at a given sf dir, then compares row count, schema (sorted column names) and
a value hash over column-name-sorted, row-sorted values — the same contract
the per-round CORRECTNESS_r{N}.json check applies.

Usage:
    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    assert isinstance(res, pd.DataFrame), type(res)
    return res


def _value_hash(df) -> str:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.10g").encode("utf-8")
    return hashlib.sha256(payload).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
            logging_level="ERROR",
        )

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = _to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: RAY-ERROR {e}")
            n_fail += 1
            continue
        ray_s = time.perf_counter() - t0
        if name not in oracles:
            print(f"{name}: no_oracle rows={len(got)} ({ray_s:.2f}s)")
            continue
        t0 = time.perf_counter()
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SQL-ERROR {e}")
            n_fail += 1
            continue
        sql_s = time.perf_counter() - t0
        rows_ok = len(got) == len(exp)
        schema_ok = sorted(got.columns) == sorted(exp.columns)
        hash_ok = rows_ok and schema_ok and _value_hash(got) == _value_hash(exp)
        status = "OK" if hash_ok else "MISMATCH"
        print(
            f"{name}: {status} rows={len(got)}/{len(exp)} schema={schema_ok} "
            f"(ray {ray_s:.2f}s, sql {sql_s:.2f}s)"
        )
        if not hash_ok:
            n_fail += 1
            if rows_ok and schema_ok:
                a = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
                b = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
                neq = (a != b).any(axis=1)
                print(a[neq].head(5))
                print(b[neq].head(5))
            else:
                print(" ray cols:", list(got.columns))
                print(" sql cols:", list(exp.columns))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
