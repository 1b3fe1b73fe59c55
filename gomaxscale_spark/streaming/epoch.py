"""EpochCommit: the one shared driver-local epoch-commit protocol.

Until round 7 the three streaming sinks (``CDCSnapshotSink``,
``CDCHistorySink``, ``IncrementalLSHDedupSink``) each hand-rolled the
same five protocol pieces — marker check, partial-dir cleanup, staged
write, two-rename swap, swap-recovery preamble — as ~150 lines of
near-triplicate code. Every partial-failure hole found by review lived
in exactly one of the copies, so the surface is consolidated here: one
class, one set of crash-window arguments, one place to audit.

Protocol (the lakehouse-less emulation of a transactional commit — at
100 TB the same sink logic points at Delta/Iceberg MERGE, whose commit
protocol subsumes all of this):

- ``_epoch_N`` marker files under the root are the COMMIT POINT of an
  epoch: a replayed epoch whose marker exists is a no-op; any
  ``<sub>/epoch=N`` directory WITHOUT its marker is by construction
  garbage from a crashed attempt (Structured Streaming retries a
  failed epoch with the same id, sequentially) and is deleted before
  any lake state is read.
- dataset republish is a two-rename swap (``live → live__old``,
  ``live__new → live``) whose every crash point is repaired by three
  rules in ``finish_swap``.
- per-key-hash-bucket publish (the snapshot/history sinks) swaps only
  the touched buckets' directories; untouched buckets' files are never
  listed, read, or rewritten.

Caveats carried over verbatim from the sinks: markers, renames, and
locks are driver-local filesystem operations — correct for local paths
only (this sandbox's documented emulation scope). Ad-hoc readers that
list ``epoch=`` dirs themselves can observe a crashed epoch's partial
output; serving surfaces must read via ``committed_epoch_dirs`` (the
embedding sink's ``topk``/``read_kept`` do — r9).

Maintenance exclusion (enforced, not conventional): maintenance passes
(``compact``/``compact_log``/``drain_review``) must not race an
in-flight ``apply_batch`` — they read multi-dataset state the batch is
mid-rewrite of. ``trigger_guard`` (held by apply_batch) and
``maintenance_guard`` (held by maintenance) are sentinel files; taking
one while the OTHER is held raises RuntimeError instead of corrupting.
Both guards release on exception; a hard process kill can leave a
stale sentinel, cleared by the owning side's next run (apply_batch
overwrites its own stale sentinel) or explicitly via ``force_unlock``.

Reference fidelity note: the reference library has no storage commit
at all (its sink is the user callback, gomaxscale.go:173-191); this
protocol exists because an analytics lake needs exactly-once state.
"""

from __future__ import annotations

import os
import shutil
from contextlib import contextmanager

_BATCH_LOCK = "_inflight_batch"
_MAINT_LOCK = "_inflight_maintenance"


class EpochCommit:
    def __init__(self, root: str) -> None:
        self.root = root

    # ------------------------------------------------------------------
    # markers: the commit point
    # ------------------------------------------------------------------

    def marker(self, epoch: int) -> str:
        return f"{self.root}/_epoch_{epoch}"

    def is_committed(self, epoch: int) -> bool:
        return os.path.exists(self.marker(epoch))

    def commit(self, epoch: int) -> None:
        os.makedirs(self.root, exist_ok=True)
        open(self.marker(epoch), "w").close()

    # ------------------------------------------------------------------
    # partial-attempt cleanup
    # ------------------------------------------------------------------

    def clean_partial(self, subs: tuple[str, ...], epoch: int) -> None:
        """Delete the given epoch's dirs across ``subs`` — the retry
        preamble: a markerless ``epoch=N`` is a crashed prior attempt
        of the epoch about to be re-applied."""
        for sub in subs:
            shutil.rmtree(f"{self.root}/{sub}/epoch={epoch}", ignore_errors=True)

    def committed_epoch_dirs(self, sub: str) -> list[str]:
        """READ-ONLY enumeration of ``sub``'s committed epoch dirs, for
        serving-path readers (the sink's ``topk``/``read_kept``) that
        must not mutate state: a crashed-but-not-yet-retried epoch's
        markerless dir is SKIPPED (not deleted — deletion is the retry
        preamble's job under the trigger guard), and a swap interrupted
        between its two renames is followed to ``sub__new`` (the staged
        copy holds the same committed data the missing live dir did).
        Returns [] when the dataset doesn't exist yet."""
        live = f"{self.root}/{sub}"
        if not os.path.isdir(live) and os.path.isdir(live + "__new"):
            live = live + "__new"
        if not os.path.isdir(live):
            return []
        return [
            f"{live}/{d}"
            for d in sorted(os.listdir(live))
            if d.startswith("epoch=") and self.is_committed(int(d.split("=")[1]))
        ]

    def drop_partial_epochs(self, subs: tuple[str, ...]) -> list[int]:
        """Maintenance preamble: delete EVERY markerless epoch dir
        across ``subs`` (folding a crashed epoch's uncommitted output
        into a committed base would double-admit it on the stream's
        retry) and return the sorted committed-epoch list."""
        epochs: set[int] = set()
        for sub in subs:
            root = f"{self.root}/{sub}"
            if os.path.isdir(root):
                epochs |= {
                    int(d.split("=")[1])
                    for d in os.listdir(root)
                    if d.startswith("epoch=")
                }
        committed = []
        for e in sorted(epochs):
            if self.is_committed(e):
                committed.append(e)
            else:
                self.clean_partial(subs, e)
        return committed

    # ------------------------------------------------------------------
    # two-rename dataset swap
    # ------------------------------------------------------------------

    def finish_swap(self, subs: tuple[str, ...]) -> None:
        """Repair an interrupted two-rename swap. Three rules cover
        every crash point:

        - live missing + ``__new`` present → the crash hit between the
          two renames: finish it (rename ``__new`` → live);
        - ``__old`` present → the crash hit before its cleanup: remove;
        - ``__new`` present beside a live dir → the crash hit before
          the first rename: the staged copy is redundant, remove it.
        """
        for sub in subs:
            live = f"{self.root}/{sub}"
            new, old = live + "__new", live + "__old"
            if os.path.isdir(new) and not os.path.isdir(live):
                os.rename(new, live)
            if os.path.isdir(old):
                shutil.rmtree(old, ignore_errors=True)
            if os.path.isdir(new):
                shutil.rmtree(new, ignore_errors=True)

    def swap_publish(self, sub: str, write_staged) -> None:
        """Write a replacement dataset for ``sub`` via
        ``write_staged(staging_path)`` then swap it live with the
        crash-recoverable two renames (``finish_swap`` repairs every
        interruption point). A missing live dir (first-time publish)
        degrades to the single staged→live rename — current sink
        callers all guard on existing state first, but the shared
        protocol class must not hand a FileNotFoundError to the next
        caller that doesn't."""
        live = f"{self.root}/{sub}"
        new, old = live + "__new", live + "__old"
        shutil.rmtree(new, ignore_errors=True)
        write_staged(new)
        if os.path.isdir(live):
            os.rename(live, old)
        os.rename(new, live)
        shutil.rmtree(old, ignore_errors=True)

    # ------------------------------------------------------------------
    # per-bucket publish (partition-scoped rewrite)
    # ------------------------------------------------------------------

    def swap_bucket_dirs(
        self, staged: str, live: str, buckets, prefix: str = "__bucket="
    ) -> None:
        """Swap only the touched buckets' directories from ``staged``
        into ``live``; a touched bucket absent from the staged output
        means every key in it was deleted — removing its live dir IS
        the publish. Atomic per bucket, not across buckets: a
        mid-publish crash leaves a mix the epoch's (idempotent) retry
        repairs. Untouched buckets are never listed, read, or
        rewritten."""
        os.makedirs(live, exist_ok=True)
        for b in buckets:
            src = os.path.join(staged, f"{prefix}{b}")
            dst = os.path.join(live, f"{prefix}{b}")
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.isdir(src):
                shutil.move(src, dst)
        shutil.rmtree(staged, ignore_errors=True)

    # ------------------------------------------------------------------
    # maintenance-vs-trigger exclusion (enforced)
    # ------------------------------------------------------------------

    def _take(self, own: str, other: str, what: str) -> None:
        if os.path.exists(f"{self.root}/{other}"):
            raise RuntimeError(
                f"{what} on {self.root!r} would race the holder of "
                f"{other!r} — run maintenance between triggers "
                "(force_unlock() clears a stale sentinel after a hard kill)"
            )
        os.makedirs(self.root, exist_ok=True)
        open(f"{self.root}/{own}", "w").close()

    @contextmanager
    def trigger_guard(self):
        """Held by apply_batch: raises if a maintenance pass is in
        flight. A stale sentinel from a hard-killed batch is
        overwritten here (foreachBatch is sequential — there is never
        a genuinely concurrent second batch)."""
        self._take(_BATCH_LOCK, _MAINT_LOCK, "apply_batch")
        try:
            yield
        finally:
            try:
                os.remove(f"{self.root}/{_BATCH_LOCK}")
            except OSError:
                pass

    @contextmanager
    def maintenance_guard(self):
        """Held by compact/compact_log/drain_review: raises LOUDLY if
        a micro-batch is in flight instead of corrupting the state it
        is mid-rewrite of."""
        self._take(_MAINT_LOCK, _BATCH_LOCK, "maintenance")
        try:
            yield
        finally:
            try:
                os.remove(f"{self.root}/{_MAINT_LOCK}")
            except OSError:
                pass

    def force_unlock(self) -> None:
        """Clear stale exclusion sentinels after a hard process kill.
        Only safe when nothing is actually running against the root."""
        for lock in (_BATCH_LOCK, _MAINT_LOCK):
            try:
                os.remove(f"{self.root}/{lock}")
            except OSError:
                pass
