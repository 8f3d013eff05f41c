#!/usr/bin/env python3
"""Golden-output regression net (SURVEY.md §5.5).

Usage:
  python3 tools/golden.py write <verifyOutDir>   # regenerate golden/ CSVs
  python3 tools/golden.py check <verifyOutDir>   # diff current vs golden/

Converts each query's Verify parquet dump to a canonical CSV (columns
sorted by name, rows sorted) so `git diff golden/` shows any semantic
drift a refactor introduces — cheaper signal than a full oracle run.
Exit code (check) = number of drifted queries.
"""
import duckdb, glob, os, sys

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden")


def canon_csv(con, parquet_glob):
    r = con.execute(f"SELECT * FROM read_parquet('{parquet_glob}')")
    cols = [d[0] for d in r.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(tuple(repr(row[i]) for i in order) for row in r.fetchall())
    head = ",".join(cols[i] for i in order)
    return head + "\n" + "\n".join(",".join(t) for t in rows) + "\n"


def main():
    mode, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    os.makedirs(GOLDEN, exist_ok=True)
    drift = 0
    seen = set()
    for d in sorted(glob.glob(os.path.join(out, "q*"))):
        name = os.path.basename(d)
        seen.add(name)
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            continue
        csv = canon_csv(con, os.path.join(d, "*.parquet"))
        path = os.path.join(GOLDEN, f"{name}.csv")
        if mode == "write":
            with open(path, "w") as f:
                f.write(csv)
            print(f"wrote {name} ({csv.count(chr(10)) - 1} rows)")
        else:
            if not os.path.exists(path):
                print(f"MISSING golden for {name}")
                drift += 1
            elif open(path).read() != csv:
                print(f"DRIFT {name}")
                drift += 1
            else:
                print(f"ok    {name}")
    if mode == "check":
        # a golden CSV whose query was deleted/renamed is stale, not silent
        for path in sorted(glob.glob(os.path.join(GOLDEN, "q*.csv"))):
            name = os.path.basename(path)[:-4]
            if name not in seen:
                print(f"STALE golden {name}: no matching verify output")
                drift += 1
        print(f"---- {drift} drifted")
        sys.exit(min(drift, 120))


if __name__ == "__main__":
    main()
