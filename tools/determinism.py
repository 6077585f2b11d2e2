#!/usr/bin/env python3
"""Run-to-run determinism check for rows-only queries.

Compares two graft.Verify output dirs (same sfDir, independent runs)
with a symmetric EXCEPT per query — any nonzero diff means a query is
not reproducible and would flake the driver's rows-only hash check.
Usage: python3 tools/determinism.py <outDir1> <outDir2>
"""
import sys, os, glob
import duckdb


def main(d1, d2):
    con = duckdb.connect()
    bad = ok = 0
    for name in sorted(os.listdir(d1)):
        p1, p2 = os.path.join(d1, name), os.path.join(d2, name)
        if not (os.path.isdir(p1) and os.path.isdir(p2)):
            continue
        f1 = glob.glob(p1 + "/*.parquet")
        f2 = glob.glob(p2 + "/*.parquet")
        n = con.execute(f"""SELECT count(*) FROM (
          (SELECT * FROM read_parquet({f1!r})
             EXCEPT SELECT * FROM read_parquet({f2!r}))
          UNION ALL
          (SELECT * FROM read_parquet({f2!r})
             EXCEPT SELECT * FROM read_parquet({f1!r})))""").fetchone()[0]
        if n:
            print(f"NONDETERMINISTIC: {name} ({n} differing rows)")
            bad += 1
        else:
            ok += 1
    print(f"== {ok} deterministic, {bad} nondeterministic ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
