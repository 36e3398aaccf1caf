"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry and its oracle_sql() in DuckDB over the
same sf parquet tables; compare row count, column names, and an
order-insensitive value hash. Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def table_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from gtfs2lc_spark.session import build_session

    spark = build_session(app_name="correctness-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    import time as _time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = _time.perf_counter()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        t_spark = _time.perf_counter() - t0
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        t1 = _time.perf_counter()
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        t_duck = _time.perf_counter() - t1
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh = table_hash([tuple(r) for r in srows], scols)
        oh = table_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{name:28s} {status} rows {len(srows)}/{len(orows)}"
            f" cols={'=' if ok_cols else scols} hash={'=' if ok_hash else (sh[:8] + '!=' + oh[:8])}"
            f"  [{t_spark:.1f}s/{t_duck:.1f}s]"
        )
        if status == "FAIL":
            failures += 1
            if not ok_cols:
                print(f"   spark cols: {scols}\n   oracle cols: {ocols}")
            if ok_cols and not ok_hash:
                sset = {tuple(norm_cell(v) for v in r) for r in (tuple(x) for x in srows)}
                oset = {tuple(norm_cell(v) for v in r) for r in orows}
                print(f"   only-spark (3): {list(sset - oset)[:3]}")
                print(f"   only-oracle (3): {list(oset - sset)[:3]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
