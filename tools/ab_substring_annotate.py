#!/usr/bin/env python
"""Targeted A/B for the r11 `substring_annotate` skew-safety rewrite
(VERDICT r10 mandate #1): run `substring_duplicate_coverage` and
`substring_strip` end-to-end on the document-axis replicas with

  - window  — the r10 `Window.partitionBy(wh)` whole-partition form
              (`_substring_annotate_window_form`), and
  - groupby — the r11 groupBy+join-back form (shipped),

alternating forms within one session so JVM warmup lands on both.
One JSON line per (op, form, dir): wall seconds (noop sink, the
bench.py convention) + rows. Run on an idle host, nothing concurrent.

Usage: python tools/ab_substring_annotate.py DIR[,DIR...] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomaxscale_spark.operators import dedup as D
from gomaxscale_spark.session import get_session

FORMS = {
    "groupby": D.substring_annotate,
    "window": D._substring_annotate_window_form,
}
OPS = {
    "coverage": D.substring_duplicate_coverage,
    "strip": D.substring_strip,
}


def main() -> None:
    dirs = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_session("ab_substring_annotate")
    orig = D.substring_annotate
    try:
        for d in dirs:
            docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
            for rep in range(reps):
                for op_name, op in OPS.items():
                    for form_name, form in FORMS.items():
                        D.substring_annotate = form
                        start = time.perf_counter()
                        df = op(docs, "doc_id", "text", window=8)
                        df.write.format("noop").mode("overwrite").save()
                        wall = round(time.perf_counter() - start, 1)
                        print(
                            json.dumps(
                                {
                                    "op": op_name,
                                    "form": form_name,
                                    "dir": os.path.basename(d),
                                    "rep": rep,
                                    "wall_s": wall,
                                }
                            ),
                            flush=True,
                        )
    finally:
        D.substring_annotate = orig
    spark.stop()


if __name__ == "__main__":
    main()
