"""Local stand-in for the driver's correctness gate: run every queries()
entry in Spark and (when an oracle exists) the matching SQL in DuckDB on the
same sf dir; compare row count, sorted column names, and an order-insensitive
value hash. Usage: python scripts/check_correctness.py [sf_dir] [only] and
set CHECK_JSON_OUT=<path> to also write a machine-readable receipt covering
every checked query (the per-round CORRECTNESS_LOCAL_rNN.json evidence the
r5 verdict asked for — the driver's own gate only windows the first 50
registry entries)."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def df_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(sf_dir: str) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("check-correctness")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    receipt: dict[str, dict] = {}
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            receipt[name] = {"ok": False, "err": f"spark error: {exc}"}
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(srows)} (rows-only, no oracle) [{dt:.1f}s]")
            receipt[name] = {"ok": True, "rows": len(srows), "oracle": False}
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            receipt[name] = {"ok": False, "err": f"duckdb error: {exc}"}
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        hs = hd = None
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(dcols)}")
        else:
            hs = df_hash(scols, [[r[c] for c in scols] for r in srows])
            hd = df_hash(dcols, drows)
            if hs != hd:
                problems.append(f"value hash spark={hs} duckdb={hd}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{dt:.1f}s]")
            receipt[name] = {"ok": False, "err": "; ".join(problems)}
            failures += 1
        else:
            print(f"ok   {name}: rows={len(srows)} hash match [{dt:.1f}s]")
            receipt[name] = {
                "ok": True, "rows": len(srows), "oracle": True, "hash": hs,
            }
    spark.stop()
    out = os.environ.get("CHECK_JSON_OUT")
    if out:
        import json

        with open(out, "w", encoding="utf-8") as fh:
            json.dump({"sf_dir": sf_dir, "queries": receipt}, fh, indent=1)
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
