#!/usr/bin/env python3
"""Rerun-determinism check: compare two graft.Verify dump dirs
query-by-query as SORTED row multisets (row order inside a dump is not
part of the contract; cell values are). Usage:

    python3 dev/rerun_diff.py <dumpA> <dumpB>

Exit nonzero if any query's sorted rows differ or is missing on one
side. Complements dev/compare.py (engine differential) and the
permuted-fixture gate (input-order invariance): this one pins
run-to-run determinism of the same binaries on the same input.
"""
import sys, os, glob
import duckdb

def rows(dirpath):
    files = glob.glob(os.path.join(dirpath, "*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    q = f"SELECT * FROM read_parquet({files!r})"
    df = con.execute(q).fetchall()
    # sort by the string form of every cell — a total order that only
    # cares about value equality
    return sorted(tuple(str(c) for c in r) for r in df)

def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(set(os.listdir(a)) & set(os.listdir(b)))
    only_a = set(os.listdir(a)) - set(os.listdir(b))
    only_b = set(os.listdir(b)) - set(os.listdir(a))
    bad = 0
    for extra, side in ((only_a, a), (only_b, b)):
        for n in sorted(extra):
            if os.path.isdir(os.path.join(side, n)):
                print(f"  [only-in-{side}] {n}")
                bad += 1
    same = 0
    for n in names:
        da, db = os.path.join(a, n), os.path.join(b, n)
        if not (os.path.isdir(da) and os.path.isdir(db)):
            continue
        ra, rb = rows(da), rows(db)
        if ra is None or rb is None:
            print(f"  [empty] {n}")
            bad += 1
        elif ra != rb:
            diff = next((i, x, y) for i, (x, y) in enumerate(zip(ra, rb)) if x != y) \
                if len(ra) == len(rb) else ("len", len(ra), len(rb))
            print(f"  [DIFF] {n}: {diff}")
            bad += 1
        else:
            same += 1
    print(f"identical={same} diff={bad}")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
