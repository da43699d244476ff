#!/usr/bin/env python3
"""Local replica of the driver's DuckDB differential gate.

Usage: python3 dev/compare.py <verify_out_dir> <sf_dir> [query ...]

Reads each <verify_out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the <sf_dir> parquet
tables, and compares rows/schema/hash the way the driver does (columns sorted
by name, values hashed in result order).
"""
import sys, os, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    import datetime
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "%.10g" % v
    # parquet date surfaces as midnight datetime on the Spark side; the
    # driver's r1 run treated these as equal, so normalize both to the date
    if isinstance(v, datetime.datetime) and v.time() == datetime.time(0):
        return str(v.date())
    return str(v)


def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update("|".join(norm(row[i]) for i in order).encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noora = 0
    for name in names:
        if only and name not in only:
            continue
        sq = con.sql(
            f"SELECT * FROM read_parquet('{os.path.join(out_dir, name)}/*.parquet')")
        scols, srows = [c.lower() for c in sq.columns], sq.fetchall()
        if name not in oracles:
            n_noora += 1
            print(f"  [no-oracle] {name}: spark_rows={len(srows)}")
            continue
        try:
            oq = con.sql(oracles[name])
            ocols, orows = [c.lower() for c in oq.columns], oq.fetchall()
            # Convention lint (r8): DuckDB SUM over integers widens to
            # HUGEINT (int128). fetchall renders HUGEINT like BIGINT, so
            # this replica would pass — but the driver's fetch path does
            # NOT (r7's 5 hash-reds were exactly the 5 oracles with a
            # HUGEINT column). Fail loudly here so it can't recur.
            # (The r8 control probe probe_hugeint_sum that kept the
            # construct deliberately was retired in r9 — no exceptions.)
            wide = [c for c, t in zip(oq.columns, oq.types)
                    if "HUGEINT" in str(t).upper()]
            if wide:
                n_fail += 1
                print(f"  [TYPE-LINT] {name}: HUGEINT oracle columns {wide} "
                      f"— CAST(... AS BIGINT) in the oracle SQL")
                continue
        except Exception as e:
            n_fail += 1
            print(f"  [ORACLE-ERR] {name}: {e}")
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = (rows_ok and schema_ok and
                   frame_hash(scols, srows) == frame_hash(ocols, orows))
        if hash_ok:
            n_pass += 1
        else:
            n_fail += 1
            print(f"  [FAIL] {name}: rows {len(srows)}/{len(orows)} "
                  f"schema {scols} vs {ocols} hash_match={hash_ok}")
    print(f"pass={n_pass} fail={n_fail} no_oracle={n_noora}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
