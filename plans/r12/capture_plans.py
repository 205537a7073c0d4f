"""Capture .explain("formatted") for catalog queries into plans/r12/.

Usage: python plans/r12/capture_plans.py SUFFIX [query ...]
Writes plans/r12/<query>_<SUFFIX>.txt for each named query (all
catalog queries when none named). Offline layouts (IVF/PQ/media) are
built first so plans reflect the steady query path, matching bench.py.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from openetl_spark import catalog  # noqa: E402
from openetl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(catalog.QUERIES)
    spark = get_spark("openetl_spark_plans")
    catalog._ivf_layout(spark, SF_DIR)
    catalog._pq_codebooks(spark, SF_DIR)
    catalog._ivf_pq_layout(spark, SF_DIR)
    for name in names:
        fn = catalog.QUERIES[name]
        buf = io.StringIO()
        try:
            df = fn(spark, SF_DIR)
            with redirect_stdout(buf):
                df.explain("formatted")
        except Exception as exc:  # noqa: BLE001
            buf.write(f"EXPLAIN FAILED: {exc!r}\n")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(name, "->", path, flush=True)


if __name__ == "__main__":
    main()
