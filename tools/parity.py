#!/usr/bin/env python3
"""Pre-driver t2 mirror (SURVEY.md §5.2): compare Verify's parquet dumps
against DuckDB 1.0.0 running oracle_sql.json on the same tables.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]

Mirrors the driver's compare: per query — row count, schema (column
names + dtypes after sorting columns by name), and exact value equality
(NaN-safe). Exit code = number of failing queries.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    return pq.read_table(f"{outdir}/{name}").to_pandas()


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sql = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    fails = 0
    for name in sorted(sql):
        if only and name not in only:
            continue
        try:
            oracle = con.execute(sql[name]).fetch_arrow_table().to_pandas()
            spark = load_spark(outdir, name)
        except Exception as e:
            print(f"FAIL {name}: load error: {e}")
            fails += 1
            continue
        problems = []
        if len(spark) != len(oracle):
            problems.append(f"rows spark={len(spark)} oracle={len(oracle)}")
        scols, ocols = sorted(spark.columns), sorted(oracle.columns)
        if scols != ocols:
            problems.append(f"cols spark={scols} oracle={ocols}")
        else:
            s, o = spark[scols], oracle[scols]
            def norm(t):
                t = str(t)
                return "datetime" if t.startswith("datetime64") else t
            sdt = [norm(t) for t in s.dtypes]
            odt = [norm(t) for t in o.dtypes]
            if sdt != odt:
                problems.append(f"dtypes spark={list(zip(scols, sdt))} oracle={list(zip(scols, odt))}")
            if len(s) == len(o):
                for c in scols:
                    sv, ov = s[c].tolist(), o[c].tolist()
                    bad = []
                    for i, (a, b) in enumerate(zip(sv, ov)):
                        if a is None and b is None:
                            continue
                        if isinstance(a, float) and isinstance(b, float) and \
                           math.isnan(a) and math.isnan(b):
                            continue
                        if a != b:
                            bad.append((i, a, b))
                        if len(bad) >= 3:
                            break
                    if bad:
                        problems.append(f"col {c}: {len(bad)}+ diffs, first: {bad[:3]}")
        if problems:
            fails += 1
            print(f"FAIL {name}: " + " | ".join(problems))
        else:
            print(f"PASS {name} ({len(spark)} rows)")
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    sys.exit(min(fails, 99))


if __name__ == "__main__":
    main()
