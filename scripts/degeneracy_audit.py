#!/usr/bin/env python3
"""Dev-only audit: flag queries whose Verify output is DEGENERATE at the
given scale — the oracle hash-match of such a query proves little because
only one code path / one branch produced every value.

Degeneracy classes flagged (any column counts, key columns excluded by the
all-column rule):
  ALL_NULL_OR_ZERO   every value in every column is NULL / 0 / 0.0 / ""
  SINGLE_ROW_ZEROISH single row and >= half of its values are NULL/0
  CONST_COLS         > 1 row but every column has exactly one distinct value

Usage: python3 scripts/degeneracy_audit.py <verify_out_dir>
Writes a TSV report to stdout, one line per flagged query.
"""
import sys, os, json
import pyarrow.parquet as pq


def zeroish(v):
    return v is None or v == 0 or v == 0.0 or v == ""


def audit(d):
    flagged = []
    names = sorted(
        n for n in os.listdir(d)
        if n.startswith("q_") and os.path.isdir(os.path.join(d, n)))
    for name in names:
        try:
            t = pq.read_table(os.path.join(d, name))
        except Exception as e:  # unreadable -> report loudly
            flagged.append((name, "UNREADABLE", str(e)))
            continue
        rows = t.num_rows
        if rows == 0:
            flagged.append((name, "EMPTY", "0 rows"))
            continue
        cols = t.column_names
        pyl = {c: t.column(c).to_pylist() for c in cols}
        vals = [v for c in cols for v in pyl[c]]
        n_zero = sum(1 for v in vals if zeroish(v))
        if n_zero == len(vals):
            flagged.append((name, "ALL_NULL_OR_ZERO", f"{rows} rows x {len(cols)} cols"))
            continue
        if rows == 1 and n_zero * 2 >= len(vals):
            flagged.append((name, "SINGLE_ROW_ZEROISH",
                            json.dumps({c: pyl[c][0] for c in cols}, default=str)[:160]))
            continue
        if rows > 1 and all(len(set(map(str, pyl[c]))) == 1 for c in cols):
            flagged.append((name, "CONST_COLS", f"{rows} rows, every column constant"))
    return flagged


if __name__ == "__main__":
    out = audit(sys.argv[1])
    for name, kind, detail in out:
        print(f"{name}\t{kind}\t{detail}")
    print(f"# flagged {len(out)} queries", file=sys.stderr)
