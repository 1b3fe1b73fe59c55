#!/usr/bin/env python
"""A/B: one-shot hashed-df BM25 — four tokenize legs vs ONE shared
materialized (id, __toks) frame (the release_report lesson applied to
the retrieval family, r13).

Old form: corpus_term_stats + bm25_against_stats each tokenize the raw
text (df, meta, tf, lengths legs → 4 split/lower/filter passes).
New form: tokenized_docs → materialize_once → the *_tokenized twins.
Results asserted IDENTICAL (exceptAll both directions) per corpus.

Usage: python tools/ab_bm25_tokenized.py [dir ...]
Idle host, no concurrent Spark.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gomaxscale_spark.operators import search as SE
from gomaxscale_spark.operators.materialize import materialize_once
from gomaxscale_spark.session import get_session

TERMS = ["spark", "window", "hash"]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def old_form(docs):
    ts, meta = SE.corpus_term_stats(docs)
    return (
        SE.bm25_against_stats(docs, TERMS, ts, meta)
        .orderBy(F.desc("score"), F.col("doc_id"))
        .limit(15)
    )


def new_form(docs):
    tokd = materialize_once(SE.tokenized_docs(docs))
    ts, meta = SE.corpus_term_stats_tokenized(tokd)
    return (
        SE.bm25_against_stats_tokenized(tokd, TERMS, ts, meta)
        .orderBy(F.desc("score"), F.col("doc_id"))
        .limit(15)
    )


def main() -> None:
    dirs = sys.argv[1:] or ["/tmp/scaled_x30_emb", "/tmp/scaled_x100_doc"]
    spark = get_session("ab_bm25_tokenized")
    out = {}
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        label = os.path.basename(d)
        a = old_form(docs)
        b = new_form(docs)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, label
        cell = {}
        for name, fn in (("old_4_legs", old_form), ("new_shared_toks", new_form)):
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                materialize(fn(docs))
                runs.append(time.perf_counter() - t0)
            cell[name] = round(min(runs), 3)
        cell["ratio"] = round(cell["new_shared_toks"] / cell["old_4_legs"], 2)
        out[label] = cell
        print(json.dumps({label: cell}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
