"""Print the canonical one-line summary of a SELFCHECK_*.json.

The evidence chain (SCALE.md / README.md / VERDICT history) must
quote these artifacts exactly — two rounds of judge feedback flagged
hand-maintained counts drifting after late-round additions. Generate
the sentence instead of typing it:

    python tools/selfcheck_summary.py SELFCHECK_sf1.json
"""

from __future__ import annotations

import json
import sys


def summarize(path: str) -> str:
    doc = json.load(open(path))
    res = doc.get("results", doc)
    n = len(res)
    hashed = sorted(
        k for k, v in res.items() if v.get("hash_match") is True
    )
    rows_only = sorted(
        k
        for k, v in res.items()
        if v.get("rows_match") in ("rows-only", "oracle-skipped")
    )
    skipped = sorted(k for k, v in res.items() if v.get("skipped"))
    failed = sorted(
        k
        for k, v in res.items()
        if v.get("err")
        or v.get("hash_match") is False
        or v.get("rows_match") is False
    )
    spark_secs = [
        v["spark_sec"] for v in res.values() if v.get("spark_sec")
    ]
    line = (
        f"{path}: {n} queries — {len(hashed)} value-hash-matched, "
        f"{len(rows_only)} rows-only/oracle-skipped"
        + (f" ({', '.join(rows_only)})" if rows_only else "")
        + (f", {len(skipped)} skipped ({', '.join(skipped)})" if skipped else "")
        + f", {len(failed)} failures"
        + (f" ({', '.join(failed)})" if failed else "")
        + (
            f"; spark wall {sum(spark_secs):.0f}s over {len(spark_secs)} runs"
            if spark_secs
            else ""
        )
    )
    return line


if __name__ == "__main__":
    for p in sys.argv[1:] or ["SELFCHECK_sf1.json"]:
        print(summarize(p))
