#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle on the same parquet tables, compare per query.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import decimal
import glob
import json
import math
import os
import struct
import sys

import duckdb


class F:
    """Float wrapper: sign-aware bitwise identity (after the round-6
    tolerance), so -0.0 != +0.0 — matching the driver, which hashes
    serialized values. Python's == treats -0.0 == 0.0, which masked the
    x79 signed-zero divergence in round 5."""

    __slots__ = ("v", "bits")

    def __init__(self, v):
        self.v = round(v, 6)
        self.bits = struct.pack("<d", self.v)

    def __eq__(self, other):
        return isinstance(other, F) and self.bits == other.bits

    def __hash__(self):
        return hash(self.bits)

    def __repr__(self):
        return repr(self.v) if not (self.v == 0.0 and self.bits[7] & 0x80) else "-0.0"


def norm(rows):
    # DECIMAL oracle outputs (DuckDB round() on a DECIMAL expression stays
    # DECIMAL) compare as floats, matching the driver (x5 passed r5 with a
    # Decimal oracle vs a double Spark column).
    # Ints are deliberately NOT wrapped: an int column on one engine vs a
    # float column on the other (Python 1 == 1.0) must register as a
    # mismatch because the driver hashes SERIALIZED values, where
    # bigint(1) != double(1.0). Cast both sides in the query instead.
    out = []
    for r in rows:
        out.append(tuple(
            F(float(v)) if isinstance(v, (float, decimal.Decimal)) else v
            for v in r))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def selftest():
    assert norm([(0.0,)]) != norm([(-0.0,)]), "signed-zero fixture not flagged"
    assert norm([(1.0000001,)]) == norm([(1.0000004,)]), "round-6 tolerance lost"
    assert norm([(0.5, "a")]) == norm([(0.5, "a")])
    print("selftest OK: -0.0 != +0.0, round-6 tolerance kept")
    return 0


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # Driver pairing: oracle_sql.json keys ARE the output directory names
    # ("<name>.parquet"). Outputs with no matching key are flagged so a
    # keying regression can't silently skip the gate again.
    out_dirs = {os.path.basename(d) for d in glob.glob(os.path.join(out_dir, "*.parquet"))
                if os.path.isdir(d)}
    for missing in sorted(out_dirs - set(oracle)):
        print(f"WARN {missing}: spark output has no oracle entry (rows-only check)")
    for name, sql in sorted(oracle.items()):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_rel = con.execute(
                f"SELECT * FROM '{qdir}/*.parquet'")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        g = norm([[r[i] for i in gidx] for r in got])
        e = norm([[r[i] for i in eidx] for r in exp])
        if g == e:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"  first diff at {i}:\n    got {a}\n    exp {b}")
                    break
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
