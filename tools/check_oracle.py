#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
testdata parquet tables, loads the Spark result parquet from
<outdir>/<name>/, and compares (columns sorted by name, rows sorted,
values normalized). Usage:

    python3 tools/check_oracle.py <sfdir> <outdir> [query ...]
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(round(v, 9))
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, norm(v[k])) for k in sorted(v))
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out, key=repr)


FLOAT_TYPES = {"FLOAT", "DOUBLE", "REAL"}
INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def type_class_drift(con, spark_src, sql):
    """Columns where one side is floating-point and the other integral.

    Python-value comparison can't see this (256.0 == 256) and the local
    9-dp rounding hides it, but the driver's hasher distinguishes the
    two — the q_multimodal_audio round-8/9 red row was exactly a Spark
    DOUBLE vs oracle BIGINT with identical values. Int widths and
    timestamp units are driver-normalized, so only this class is fatal.
    """
    def types_of(query):
        return {r[0]: r[1].upper() for r in
                con.sql(f"DESCRIBE {query}").fetchall()}
    st = types_of(f"SELECT * FROM '{spark_src}'")
    dt = types_of(f"({sql})")
    drift = []
    for c, s in st.items():
        d = dt.get(c)
        if d is None:
            continue
        if (s in FLOAT_TYPES and d in INT_TYPES) or \
           (s in INT_TYPES and d in FLOAT_TYPES):
            drift.append(f"{c}: spark={s} oracle={d}")
    return drift


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; ScaleUp writes Spark-style
        # directories of part files — accept both
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        if t == "events":
            # driver testdata: TIMESTAMP(NANOS), DuckDB reads natively;
            # ScaleUp output: raw INT64 nanos (the Tables.load contract) —
            # apply the same ns->us truncation Tables.load does
            typ = con.execute(
                f"SELECT typeof(ts) FROM '{path}' LIMIT 1").fetchone()[0]
            if typ == "BIGINT":
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM '{path}'")
                continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = []
    checked = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        checked += 1
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            scols, srows = spark_rel.columns, spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failed.append(name)
            continue
        try:
            ducks = con.sql(sql)
            dcols, drows = ducks.columns, ducks.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failed.append(name)
            continue
        drift = type_class_drift(con, f"{outdir}/{name}/*.parquet", sql)
        if drift:
            print(f"FAIL {name}: float/int type drift "
                  f"(hash-mismatches in the driver): {'; '.join(drift)}")
            failed.append(name)
            continue
        sc, sr = canon(scols, srows)
        dc, dr = canon(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            failed.append(name)
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            failed.append(name)
            continue
        if len(sr) == 0:
            # an empty result hash-matches trivially — almost always a
            # mis-aimed predicate, so flag it loudly
            print(f"WARN {name}: 0 rows on both sides (vacuous match)")
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first:")
            print(f"   cols:  {sc}")
            print(f"   spark: {bad[0][0]}")
            print(f"   duck:  {bad[0][1]}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(sr)} rows)")
    print(f"\n{checked - len(failed)}/{checked} OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
