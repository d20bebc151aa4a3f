"""Local mirror of the driver's correctness gate: run every queries()[name]
against oracle_sql()[name] via DuckDB (row count + schema + order-insensitive
value hash). Usage:
  python tools/check_oracles.py [sf_dir] [name ...]
  python tools/check_oracles.py --json docs/oracle_sweep_r4.json [sf_dir] [name ...]

--json writes a machine-readable {name: {status, seconds, rows}} artifact
(status: pass | fail | rows-only) so each round's full sweep is diffable
(VERDICT r3 item 4)."""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            ds = res
            res = ds.to_pandas()
            if len(res) == 0 and len(res.columns) == 0:
                # Ray 2.49 to_pandas drops columns on 0-row datasets; rebuild
                # the empty frame from the dataset schema so schema compare
                # stays meaningful for legitimately-empty small-sf results.
                schema = ds.schema()
                if schema is not None:
                    res = pa.schema(
                        list(zip(schema.names, schema.types))
                    ).empty_table().to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        df.itertuples(index=False, name=None),
        key=lambda r: tuple(str(v) for v in r),
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def main():
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    report: dict[str, dict] = {}
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            report[name] = {
                "status": "fail", "seconds": round(time.time() - t0, 2),
                "rows": -1, "error": f"{type(e).__name__}: {e}"[:200],
            }
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(res)} rows, cols={list(res.columns)} ({dt:.1f}s) [no oracle]")
            report[name] = {
                "status": "rows-only", "seconds": round(dt, 2), "rows": len(res),
            }
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {e}")
            report[name] = {
                "status": "fail", "seconds": round(dt, 2), "rows": len(res),
                "error": f"oracle raised: {e}"[:200],
            }
            n_fail += 1
            continue
        ok_rows = len(res) == len(exp)
        ok_schema = sorted(map(str, res.columns)) == sorted(map(str, exp.columns))
        ok_hash = ok_rows and ok_schema and value_hash(res) == value_hash(exp)
        report[name] = {
            "status": "pass" if ok_hash else "fail",
            "seconds": round(dt, 2), "rows": len(res),
        }
        if ok_hash:
            print(f"PASS  {name}: {len(res)} rows ({dt:.1f}s)")
            n_pass += 1
        else:
            print(
                f"FAIL  {name}: rows {len(res)} vs {len(exp)}, "
                f"schema {sorted(res.columns)} vs {sorted(exp.columns)}, "
                f"hash_match={ok_hash} ({dt:.1f}s)"
            )
            if ok_schema and not ok_rows:
                merged = res.merge(exp, how="outer", indicator=True)
                print(merged[merged["_merge"] != "both"].head(10))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        summary = {
            "sf_dir": sf_dir,
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_rows_only": sum(
                1 for v in report.values() if v["status"] == "rows-only"
            ),
            "results": report,
        }
        os.makedirs(os.path.dirname(json_out) or ".", exist_ok=True)
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
