"""Oracle parity at an arbitrary SF dir (the driver's correctness gate,
same logic as tests/test_catalog_oracle.py which pins sf0.001).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
       python scripts/oracle_parity.py [query ...]   # default: all
"""

from __future__ import annotations

import glob
import os
import sys
from pathlib import Path

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def _normalize(df):
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype.kind == "f":
            out[c] = out[c].round(6)
    return sorted(map(tuple, out.itertuples(index=False)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    from auncel_spark.session import get_spark

    spark = get_spark("oracle_parity")
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            got = queries[name](spark, sf_dir).toPandas()
            if name not in oracles:
                ok = len(got) > 0
                status = "rows-only " + ("OK" if ok else "EMPTY")
                if not ok:
                    failed.append(name)
            else:
                want = con.execute(oracles[name]).fetchdf()
                if sorted(got.columns) != sorted(want.columns):
                    status = f"SCHEMA MISMATCH {sorted(got.columns)} vs {sorted(want.columns)}"
                    failed.append(name)
                elif len(got) != len(want):
                    status = f"ROWCOUNT {len(got)} vs {len(want)}"
                    failed.append(name)
                elif _normalize(got) != _normalize(want):
                    status = "VALUE MISMATCH"
                    failed.append(name)
                else:
                    status = f"OK ({len(got)} rows)"
        except Exception as e:
            status = f"ERROR {type(e).__name__}: {e}"
            failed.append(name)
        print(f"{name:32s} {status}", flush=True)
    print(f"\n{'FAILED: ' + ', '.join(failed) if failed else 'ALL GREEN'}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
