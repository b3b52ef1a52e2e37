#!/usr/bin/env python
"""Local replica of the driver's DuckDB-oracle correctness gate.

Dev-only tool (the shipped engine is pure Scala/Spark). Usage:
    python tools/check_oracle.py <sfDir> <verifyOutDir>
Assumes graft.Verify has already written <verifyOutDir>/<name>/ parquet
dirs and <verifyOutDir>/oracle_sql.json.
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata ships single files; ScaleUp output is a Spark
        # parquet DIRECTORY — glob its part files in that case
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # Verify-side execution errors: surface them as explicit FAIL rows so
    # an erroring query can never silently vanish from the gate.
    try:
        with open(f"{out_dir}/errors.json") as f:
            errors = json.load(f)
    except FileNotFoundError:
        errors = {}
    n_pass = n_fail = 0
    for name, err in sorted(errors.items()):
        n_fail += 1
        print(f"FAIL {name}: query errored during Verify: {err}")
    for name, sql in sorted(oracles.items()):
        if name in errors:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
            # strict schema check first (raw arrow types, no lax compare)
            gs = {f.name: str(f.type) for f in got.schema}
            ws = {f.name: str(f.type) for f in want.schema}
            sdiff = {k: (gs.get(k), ws.get(k))
                     for k in set(gs) | set(ws) if gs.get(k) != ws.get(k)}
            g = canon(got)
            w = canon(want)
            if g.equals(w) and not sdiff:
                print(f"PASS {name} rows={g.num_rows}")
                n_pass += 1
            else:
                n_fail += 1
                if sdiff:
                    print(f"FAIL {name}: schema mismatch {sdiff}")
                else:
                    print(f"FAIL {name}: rows {g.num_rows} vs {w.num_rows}")
                    diff(g, w)
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


def canon(tbl):
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    # Normalize types the two engines legitimately represent differently:
    # timestamps to us, decimals/floats to float64, ints to int64.
    fields = []
    arrays = []
    for c in cols:
        arr = tbl.column(c).combine_chunks()
        t = arr.type
        if pa.types.is_timestamp(t):
            arr = arr.cast(pa.timestamp("us"))
        elif pa.types.is_decimal(t):
            # DuckDB hugeint/decimal sums of integers: keep exactness
            arr = arr.cast(pa.int64()) if t.scale == 0 else arr.cast(pa.float64())
        elif pa.types.is_floating(t):
            arr = arr.cast(pa.float64())
        elif pa.types.is_integer(t):
            arr = arr.cast(pa.int64())
        elif pa.types.is_date(t):
            arr = arr.cast(pa.date32())
        fields.append(pa.field(c, arr.type))
        arrays.append(arr)
    out = pa.table(arrays, schema=pa.schema(fields))
    return out.sort_by([(c, "ascending") for c in cols])


def diff(g, w):
    import pyarrow.compute as pc

    if g.num_rows != w.num_rows:
        return
    for c in g.column_names:
        if c not in w.column_names:
            print(f"  col {c} missing in oracle")
            continue
        eq = pc.equal(g.column(c), w.column(c))
        bad = pc.sum(pc.invert(pc.fill_null(eq, False))).as_py() or 0
        nulls_mismatch = abs(g.column(c).null_count - w.column(c).null_count)
        if bad or nulls_mismatch:
            print(f"  col {c}: {bad} mismatched values (nulls {g.column(c).null_count} vs {w.column(c).null_count})")
            shown = 0
            gc, wc = g.column(c).to_pylist(), w.column(c).to_pylist()
            for i, (a, b) in enumerate(zip(gc, wc)):
                if a != b and shown < 5:
                    print(f"    row {i}: got={a!r} want={b!r}")
                    shown += 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:3]))
