"""Dump .explain("formatted") for registry queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (default:
every bench HEADLINE query). Lifecycle queries (streaming commits,
write-path harnesses) run their side effects while the final frame is
built; the captured plan is the returned frame's — the part the driver
times end-to-end is still that frame's evaluation plus the recorded
side-effect jobs, which the bench numbers cover.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]

    from metastore_spark.session import get_spark
    import __spark_entry__  # noqa: F401
    from metastore_spark.queries import REGISTRY
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("metastore-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    from metastore_spark import catalog as _catalog

    for _kind in _catalog.SNAPSHOT_KINDS:
        _catalog.snapshot_root(spark, sf_dir, _kind)

    for name in names or bench.HEADLINE:
        if name not in REGISTRY:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure instead of dying
            text = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({suffix})\n")
            fh.write(text)
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
