"""SearcherLifetimeManager analog.

Re-expresses ``search/SearcherLifetimeManager.kt`` over commit
generations: ``record(searcher)`` keys the searcher by its reader's
manifest ``gen`` (the reference keys by ``DirectoryReader.version``,
kt:96/176), ``acquire(token)`` returns that exact point-in-time view
for follow-on actions (paging through the SAME index view the user saw
— searchAfter across requests), ``prune(PruneByAge)`` drops trackers
older than a cutoff (kt:133-146, 239-268). Because segments are
immutable and the deletion policy (index/commits.py) can retain old
generations, ``acquire`` can even REOPEN a pruned-from-memory
generation when its commit file survives — stronger than the
reference, which can only hand back still-referenced readers.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class _Tracker:
    searcher: object
    record_time: float


class PruneByAge:
    """Prune trackers older than ``max_age_sec`` (kt:133-146); the
    NEWEST searcher is never pruned (kt:256-262: doPrune only for
    trackers after the first)."""

    def __init__(self, max_age_sec: float):
        if max_age_sec < 0:
            raise ValueError("maxAgeSec must be > 0")
        self.max_age_sec = max_age_sec

    def do_prune(self, age_sec: float, searcher) -> bool:
        return age_sec > self.max_age_sec


class SearcherLifetimeManager:
    """Times come from the caller (``now``) — deterministic by design
    (the driver stamps wall time; library code stays clock-free)."""

    def __init__(self):
        self._searchers: dict[int, _Tracker] = {}

    def record(self, searcher, now: float = 0.0) -> int:
        """Track ``searcher`` under its reader's commit gen; returns the
        token the client echoes back (kt:171-196). Re-recording the same
        generation must present the same searcher instance."""
        gen = searcher.reader.manifest.get("gen")
        if gen is None:
            raise ValueError("reader's manifest has no commit gen "
                             "(pre-commits index)")
        tr = self._searchers.get(gen)
        if tr is None:
            self._searchers[gen] = _Tracker(searcher, now)
        elif tr.searcher is not searcher:
            raise ValueError(
                "the provided searcher has the same underlying reader "
                "version yet the searcher instance differs from before")
        return gen

    def acquire(self, token: int, index_dir: str | None = None):
        """The searcher recorded under ``token``, or — when it was
        pruned but ``index_dir``'s deletion policy retained the commit —
        a fresh reopen of that generation; else None (kt:209-222)."""
        tr = self._searchers.get(token)
        if tr is not None:
            return tr.searcher
        if index_dir is not None:
            from ..index.commits import list_commits
            if token in list_commits(index_dir):
                from ..index.reader import IndexReader
                from .searcher import Searcher
                return Searcher(IndexReader(index_dir, commit=token))
        return None

    def release(self, searcher) -> None:
        """No-op ref-count analog (readers here hold no OS resources a
        GC can't reclaim); kept for API parity (kt:227-231)."""

    def prune(self, pruner: PruneByAge, now: float = 0.0) -> list[int]:
        """Drop trackers the pruner rejects, newest-first exempt
        (kt:239-268). Returns the pruned tokens."""
        by_gen = sorted(self._searchers, reverse=True)
        pruned = []
        for i, gen in enumerate(by_gen):
            tr = self._searchers[gen]
            if i > 0 and pruner.do_prune(now - tr.record_time,
                                         tr.searcher):
                del self._searchers[gen]
                pruned.append(gen)
        return pruned
