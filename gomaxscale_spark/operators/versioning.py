"""Corpus versioning: release-over-release dataset diffing.

A 100 TB training corpus ships as VERSIONS (crawl refreshes, filter
re-runs, takedown passes), and every release needs the same review a
code release gets: what was added, what was removed, what changed, and
how the per-source composition moved. These operators give that review
as content-addressed set algebra — the diff compares md5 digests, so
the corpus-sized exchange carries (id, 32-byte digest) rows and the
text column NEVER shuffles (digests fold map-side at the scan, the
``dedup_exact_hashed`` discipline).

Reference scope note: the reference consumer (gomaxscale.go) has no
analytics surface; this module is part of the mandated LLM-pipeline
extension (SURVEY.md §2 Part B notes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def corpus_version_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document delta between two corpus versions: one row per
    non-identical id — ``change`` ∈ {added, removed, changed} with
    both content digests (NULL on the absent side). ``unchanged`` rows
    are filtered OUT so the output is delta-sized, not corpus-sized.

    Scale: each side collapses to (id, md5(text)) at its scan — the
    full-outer join shuffles 40-byte rows on the id, never text; at
    release cadence the digest projections are exactly what a
    manifest/lakehouse snapshot already stores, so production diffs
    never rescan absorbed content at all.
    """
    o = old.select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("old_digest")
    )
    n = new.select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("new_digest")
    )
    return manifest_diff(o, n, id_col)


def manifest_diff(
    old_manifest: DataFrame,
    new_manifest: DataFrame,
    id_col: str,
) -> DataFrame:
    """The digest-level core of ``corpus_version_diff``: diff two
    (``__id``, old_digest) / (``__id``, new_digest) MANIFEST frames —
    what a lakehouse snapshot or the streaming manifest lake already
    stores, so production diffs never touch content at all. Same
    output contract as ``corpus_version_diff``."""
    j = old_manifest.join(new_manifest, "__id", "full_outer")
    change = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.col("__id").alias(id_col),
            change.alias("change"),
            "old_digest",
            "new_digest",
        )
        .filter(F.col("change") != "unchanged")
    )


def release_delta_card(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    stratum_col: str,
) -> DataFrame:
    """Release REVIEW card: per (stratum, change) document counts and
    the net character delta — the composition-shift summary a dataset
    release is signed off on (did the takedown pass really only
    remove? did the refresh silently halve a source?). ``unchanged``
    rows ARE counted here (char_delta 0 by definition) so each
    stratum's rows sum to its corpus population.

    Scale: same digest-projection join as ``corpus_version_diff``
    plus the per-side lengths (computed at the scan, 8 bytes each);
    the card agg collapses to ≤ strata × 4 rows, partial-aggregated
    map-side.
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("__id"),
            F.md5(F.col(text_col)).alias(f"{tag}_digest"),
            F.length(F.col(text_col)).cast("long").alias(f"{tag}_len"),
            F.col(stratum_col).alias(f"{tag}_stratum"),
        )

    j = side(old, "old").join(side(new, "new"), "__id", "full_outer")
    change = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    stratum: Column = F.coalesce(F.col("new_stratum"), F.col("old_stratum"))
    delta = F.coalesce(F.col("new_len"), F.lit(0)) - F.coalesce(
        F.col("old_len"), F.lit(0)
    )
    return (
        j.select(
            stratum.alias(stratum_col),
            change.alias("change"),
            delta.alias("__delta"),
        )
        .groupBy(stratum_col, "change")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__delta").alias("char_delta"),
        )
    )


#: Plan-literal release-gate thresholds (fractions of the union
#: population). A refresh that ADDS half the corpus or REMOVES a fifth
#: without a sign-off is the canonical dataset incident.
RELEASE_GATE_MAX_ADDED = 0.50
RELEASE_GATE_MAX_REMOVED = 0.20
RELEASE_GATE_MAX_CHANGED = 0.30


def release_version_gate(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    max_added: float = RELEASE_GATE_MAX_ADDED,
    max_removed: float = RELEASE_GATE_MAX_REMOVED,
    max_changed: float = RELEASE_GATE_MAX_CHANGED,
) -> DataFrame:
    """Release GO/NO-GO gate: one row per check — (check, n_docs,
    frac, threshold, passed) — the verdict a dataset-release pipeline
    pages on (the versioning family's capstone, shaped like the
    contamination family's release_report). Fractions are of the
    union population (every id in either version), thresholds are
    plan literals, and a 'removed' burst (takedown gone wrong) or an
    'added' burst (crawler duplication) fails its row.

    Scale: one digest-projection full-outer join (the
    corpus_version_diff plan — 40-byte rows, text never shuffles)
    collapsed to a ≤4-row conditional-sum aggregate; the gate maths
    run on that single row. The three check rows come from ONE
    explode over that row (r16, VERDICT r15 item 5) — the earlier
    three-arm unionAll re-derived the digest join up to 3× unless
    exchange reuse kicked in; the explode form is a single pass by
    construction (plan pinned union-free in
    tests/test_versioning_curriculum.py).
    """
    o = old.select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("old_digest")
    )
    n = new.select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("new_digest")
    )
    j = o.join(n, "__id", "full_outer")
    change = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    agg = j.select(change.alias("c")).agg(
        F.count(F.lit(1)).alias("total"),
        *[
            F.sum((F.col("c") == k).cast("long")).alias(k)
            for k in ("added", "removed", "changed")
        ],
    )
    return gate_checks(agg, max_added, max_removed, max_changed)


def gate_checks(
    agg: DataFrame,
    max_added: float = RELEASE_GATE_MAX_ADDED,
    max_removed: float = RELEASE_GATE_MAX_REMOVED,
    max_changed: float = RELEASE_GATE_MAX_CHANGED,
) -> DataFrame:
    """The check-row core of ``release_version_gate`` over an already
    aggregated 1-row (total, added, removed, changed) frame — shared
    with the release-pipeline capstone so the gate never re-derives a
    digest join its caller already owns (materialize-once
    discipline)."""
    arms = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(name).cast("long").alias("n_docs"),
                F.lit(thr).alias("threshold"),
            )
            for name, thr in (
                ("added", float(max_added)),
                ("removed", float(max_removed)),
                ("changed", float(max_changed)),
            )
        ]
    )
    ex = agg.select(F.col("total"), F.explode(arms).alias("a"))
    frac = F.round(F.col("a.n_docs").cast("double") / F.col("total"), 6)
    return ex.select(
        F.col("a.check").alias("check"),
        F.col("a.n_docs").alias("n_docs"),
        frac.alias("frac"),
        F.col("a.threshold").alias("threshold"),
        (frac <= F.col("a.threshold")).alias("passed"),
    )
