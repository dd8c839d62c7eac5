#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare against the Spark parquet dump
(columns sorted by name, rows sorted, exact value compare).

Dev tool only — not part of the shipped library.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--json <outPath>]

--json writes a machine-readable per-query record (ok/fail + oracle wall
seconds + row count) so the round's correctness evidence survives even if
the driver-side artifact collection fails (the round-14 empty
CORRECTNESS_r14.json), and so the slowest oracles are visible without
re-running the gate.
"""
import json
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, json_path: str | None) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    record: dict[str, dict] = {}

    def fail(name: str, reason: str, oracle_sec: float = 0.0) -> None:
        nonlocal n_bad
        print(f"FAIL {name}: {reason}")
        record[name] = {"ok": False, "fail": reason[:200],
                        "oracle_sec": round(oracle_sec, 3)}
        n_bad += 1

    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            fail(name, f"spark output unreadable: {e}")
            continue
        t0 = time.monotonic()
        try:
            want = con.sql(sql).df()
        except Exception as e:
            fail(name, f"oracle error: {e}", time.monotonic() - t0)
            continue
        osec = time.monotonic() - t0
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            fail(name, f"columns {list(g.columns)} != {list(w.columns)}", osec)
            continue
        if len(g) != len(w):
            fail(name, f"rows {len(g)} != {len(w)}", osec)
            continue
        # exact compare, column by column (mirrors the driver's value hash);
        # dtype-strict — the driver hashes raw values, so int32 vs int64 or
        # datetime64[ns] vs [us] must be treated as failures even when the
        # values coerce equal
        bad_cols = []
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype != b.dtype:
                bad_cols.append(f"{c}[dtype {a.dtype}!={b.dtype}]")
                continue
            try:
                if not a.equals(b):
                    bad_cols.append(c)
            except Exception:
                if not a.astype(str).equals(b.astype(str)):
                    bad_cols.append(c)
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                neq = g[c].astype(str) != w[c].astype(str)
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"  row {i} col {c}: spark={g[c][i]!r} oracle={w[c][i]!r}")
            record[name] = {"ok": False, "fail": f"value mismatch in {bad_cols}"[:200],
                            "oracle_sec": round(osec, 3)}
            n_bad += 1
        else:
            print(f"ok   {name} ({len(g)} rows, oracle {osec:.2f}s)")
            record[name] = {"ok": True, "rows": len(g),
                            "oracle_sec": round(osec, 3)}
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    slow = sorted(record.items(), key=lambda kv: -kv[1]["oracle_sec"])[:5]
    print("slowest oracles: " +
          ", ".join(f"{k} {v['oracle_sec']:.1f}s" for k, v in slow))
    if json_path:
        with open(json_path, "w") as f:
            json.dump({"n_ok": n_ok, "n_failed": n_bad, "sf_dir": sf_dir,
                       "slowest_oracles": {k: v["oracle_sec"] for k, v in slow},
                       "queries": record}, f, indent=0, sort_keys=True)
        print(f"wrote {json_path}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(
        description="DuckDB oracle compare of a graft.Verify dump "
                    "(dtype-strict replica of the driver gate)")
    ap.add_argument("sf_dir", help="testdata scale-factor dir, e.g. /root/testdata/sf0.01")
    ap.add_argument("out_dir", help="graft.Verify output dir with <query>.parquet + oracle_sql.json")
    ap.add_argument("--json", dest="json_path", default=None, metavar="PATH",
                    help="also write the per-query correctness artifact (CHECK_rN.json)")
    ns = ap.parse_args()
    main(ns.sf_dir, ns.out_dir, ns.json_path)
