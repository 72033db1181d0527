"""Commit points + deletion policies (point-in-time index reads).

Re-expresses ``index/IndexCommit.kt`` / ``IndexDeletionPolicy.kt`` /
``KeepOnlyLastCommitDeletionPolicy.kt`` / ``SnapshotDeletionPolicy.kt``
over this format's manifest-last two-phase commit: every
``commit_index()`` additionally records an immutable generation file
``commits/segments_<gen>.json`` (the ``segments_N`` role) before
``manifest.json`` — which stays the latest-commit pointer and the
visibility point — is atomically replaced. ``IndexReader(dir,
commit=gen)`` opens ANY retained generation (snapshot / time-travel
reads — on a 100 TB index this is how a long-running query fleet pins a
consistent view while builds and merges keep committing). A deletion
policy decides which generations stay; segment directories referenced by
no retained generation are removed (the ``IndexFileDeleter`` role:
files unreferenced by any live commit).

Single-writer discipline is the caller's, exactly as in the reference
(IndexWriter holds the write lock; we assume one committing driver).
"""

from __future__ import annotations

import json
import os
import shutil

COMMITS_DIR = "commits"
SNAPSHOTS_FILE = "snapshots.json"


def _commit_path(index_dir: str, gen: int) -> str:
    return os.path.join(index_dir, COMMITS_DIR, f"segments_{gen}.json")


def list_commits(index_dir: str) -> list[int]:
    """Ascending generation numbers of retained commits
    (``DirectoryReader.listCommits`` role). Pre-commits indexes → []."""
    d = os.path.join(index_dir, COMMITS_DIR)
    if not os.path.isdir(d):
        return []
    gens = []
    for name in os.listdir(d):
        if name.startswith("segments_") and name.endswith(".json"):
            try:
                gens.append(int(name[len("segments_"):-len(".json")]))
            except ValueError:
                pass
    return sorted(gens)


def read_commit(index_dir: str, gen: int) -> dict:
    with open(_commit_path(index_dir, gen)) as f:
        return json.load(f)


def record_commit(index_dir: str, manifest: dict) -> int:
    """Write the next immutable generation file; returns its gen. Called
    by ``commit_index`` BEFORE the manifest pointer flips (phase order:
    segment dirs → generation file → manifest.json)."""
    gens = list_commits(index_dir)
    gen = (gens[-1] + 1) if gens else 1
    manifest["gen"] = gen  # stamped into the commit file AND manifest.json
    os.makedirs(os.path.join(index_dir, COMMITS_DIR), exist_ok=True)
    tmp = _commit_path(index_dir, gen) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _commit_path(index_dir, gen))
    return gen


def referenced_segments(commit: dict) -> set[int]:
    return {m["seg"] for m in commit["segments"]}


class KeepOnlyLastCommitDeletionPolicy:
    """Default policy (KeepOnlyLastCommitDeletionPolicy.kt): every commit
    but the newest is deleted as soon as a new one lands."""

    def retained(self, index_dir: str, gens: list[int]) -> set[int]:
        return {gens[-1]} if gens else set()


class KeepLastNCommitsDeletionPolicy:
    """Keep the newest ``n`` commits — bounded time-travel."""

    def __init__(self, n: int):
        if n < 1:
            raise ValueError("n must be >= 1")
        self.n = n

    def retained(self, index_dir: str, gens: list[int]) -> set[int]:
        return set(gens[-self.n:])


class SnapshotDeletionPolicy:
    """SnapshotDeletionPolicy.kt: wraps another policy and additionally
    retains explicitly snapshotted generations until released. Snapshots
    persist in ``commits/snapshots.json`` so they survive the process
    (the reference's in-memory refCounts rebuilt from commits on init;
    persistence is the durable equivalent for a driver that restarts)."""

    def __init__(self, base=None):
        self.base = base or KeepOnlyLastCommitDeletionPolicy()

    def _snap_path(self, index_dir: str) -> str:
        return os.path.join(index_dir, COMMITS_DIR, SNAPSHOTS_FILE)

    def snapshots(self, index_dir: str) -> list[int]:
        p = self._snap_path(index_dir)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def _write(self, index_dir: str, snaps: list[int]) -> None:
        os.makedirs(os.path.join(index_dir, COMMITS_DIR), exist_ok=True)
        tmp = self._snap_path(index_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(set(snaps)), f)
        os.replace(tmp, self._snap_path(index_dir))

    def snapshot(self, index_dir: str) -> int:
        """Pin the LATEST commit (SnapshotDeletionPolicy.snapshot);
        returns its gen."""
        gens = list_commits(index_dir)
        if not gens:
            raise FileNotFoundError("no commits recorded yet")
        self._write(index_dir, self.snapshots(index_dir) + [gens[-1]])
        return gens[-1]

    def release(self, index_dir: str, gen: int) -> None:
        snaps = self.snapshots(index_dir)
        if gen not in snaps:
            raise KeyError(f"gen {gen} is not snapshotted")
        snaps.remove(gen)
        self._write(index_dir, snaps)

    def retained(self, index_dir: str, gens: list[int]) -> set[int]:
        return self.base.retained(index_dir, gens) | \
            (set(self.snapshots(index_dir)) & set(gens))


def apply_deletion_policy(index_dir: str, policy=None) -> dict:
    """Prune commits the policy rejects, then delete segment directories
    referenced by NO retained commit (IndexFileDeleter semantics). The
    newest commit (== the live manifest) is always retained. Returns
    ``{"kept": [...], "deleted_commits": [...],
    "deleted_segments": [...]}``."""
    from .builder import seg_dirname

    policy = policy or KeepOnlyLastCommitDeletionPolicy()
    gens = list_commits(index_dir)
    if not gens:
        return {"kept": [], "deleted_commits": [], "deleted_segments": []}
    keep = set(policy.retained(index_dir, gens)) | {gens[-1]}
    dropped = [g for g in gens if g not in keep]
    live: set[int] = set()
    for g in sorted(keep):
        live |= referenced_segments(read_commit(index_dir, g))
    deleted_segs = []
    seg_root = os.path.join(index_dir, "segments")
    if os.path.isdir(seg_root):
        for name in sorted(os.listdir(seg_root)):
            if not name.startswith("seg="):
                continue
            seg = int(name.split("=")[1])
            if seg not in live:
                shutil.rmtree(os.path.join(seg_root, name),
                              ignore_errors=True)
                deleted_segs.append(seg)
    for g in dropped:
        os.remove(_commit_path(index_dir, g))
    return {"kept": sorted(keep), "deleted_commits": dropped,
            "deleted_segments": deleted_segs}
