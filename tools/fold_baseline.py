#!/usr/bin/env python3
"""Fold bench-run JSON(s) into BASELINE.md's self-baseline table.

Usage: python3 tools/fold_baseline.py <keys-regex> run1.json [run2.json ...]

For each key matching the regex: new row value = min across the given
runs (and the existing row, if one exists). Rows are inserted in key
order (numeric by qNN). Existing non-matching rows are untouched.
"""
import json, re, sys

def main():
    pat = re.compile(sys.argv[1])
    runs = [json.load(open(p))["queries"] for p in sys.argv[2:]]
    base_path = "BASELINE.md"
    text = open(base_path).read()
    rows = dict(re.findall(r"\| (q\d+_[a-z0-9_]+) \| ([0-9.]+) \|", text))
    vals = {}
    for qs in runs:
        for k, v in qs.items():
            if pat.match(k) and v >= 0:
                vals[k] = min(vals.get(k, v), v)
    for k in vals:
        if k in rows:
            vals[k] = min(vals[k], float(rows[k]))
    def qnum(k):
        return int(re.match(r"q(\d+)_", k).group(1))
    lines = text.split("\n")
    out = []
    inserted = set()
    for i, ln in enumerate(lines):
        m = re.match(r"\| (q\d+_[a-z0-9_]+) \| ([0-9.]+) \|", ln)
        if m and m.group(1) in vals:
            out.append(f"| {m.group(1)} | {vals[m.group(1)]:.2f} |")
            inserted.add(m.group(1))
        else:
            out.append(ln)
    text = "\n".join(out)
    missing = sorted(set(vals) - inserted, key=qnum)
    if missing:
        # append after the LAST existing table row
        all_rows = list(re.finditer(r"\| q\d+_[a-z0-9_]+ \| [0-9.]+ \|", text))
        last = all_rows[-1]
        addition = "\n" + "\n".join(f"| {k} | {vals[k]:.2f} |" for k in missing)
        text = text[:last.end()] + addition + text[last.end():]
    open(base_path, "w").write(text)
    print(f"updated {len(inserted)} rows, appended {len(missing)} rows")
    for k in missing:
        print(f"  + {k} {vals[k]:.2f}")

if __name__ == "__main__":
    main()
