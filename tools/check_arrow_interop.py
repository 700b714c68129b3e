#!/usr/bin/env python3
"""Cross-language interop check for ArrowInterchange exports.

Dev/driver-side evidence tool (like check_oracle.py): reads every
.arrows file under a directory with pyarrow AND registers it in DuckDB,
proving the files are plain Arrow IPC any non-JVM consumer maps — the
interchange contract the operator exists for.

Usage: tools/check_arrow_interop.py <dir-with-.arrows-files>
Exit 0 and "PASS" when every file opens, schemas agree across files,
and pyarrow/DuckDB row counts match.
"""
import glob
import sys

import duckdb
import pyarrow.ipc as ipc


def main() -> int:
    root = sys.argv[1]
    files = sorted(glob.glob(f"{root}/*.arrows"))
    if not files:
        print(f"FAIL: no .arrows files under {root}")
        return 1
    con = duckdb.connect()
    schema = None
    total = 0
    for f in files:
        t = ipc.open_file(f).read_all()
        t.validate(full=True)
        if schema is None:
            schema = t.schema
        elif t.schema != schema:
            print(f"FAIL: {f} schema differs from {files[0]}")
            return 1
        con.register("t", t)
        n = con.sql("select count(*) from t").fetchone()[0]
        if n != t.num_rows:
            con.unregister("t")
            print(f"FAIL: {f} duckdb rows {n} != pyarrow rows {t.num_rows}")
            return 1
        # nested columns must be QUERYABLE outside the JVM, not just
        # parseable: flatten every struct field and unnest every list
        for field in t.schema:
            import pyarrow as pa
            if pa.types.is_struct(field.type):
                sub = field.type.field(0).name
                con.sql(f'select "{field.name}"."{sub}" from t limit 1')
            elif pa.types.is_list(field.type):
                con.sql(f'select unnest("{field.name}") from t limit 1')
        con.unregister("t")
        total += n
        print(f"OK       {f.split('/')[-1]} ({n} rows)")
    print(f"PASS: {len(files)} files, {total} rows, schema:\n{schema}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
