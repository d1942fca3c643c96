"""Index snapshots — Solr ReplicationHandler backup/restore analog
(``solr/core/src/java/org/apache/solr/handler/ReplicationHandler.java``
``backup``/``restore`` commands; Lucene-side ``SnapshotDeletionPolicy``).

A snapshot captures one COMMIT POINT: the current ``manifest.json``
generation plus every segment directory it references — the same file-list
contract the reference's replication protocol ships to followers. Files are
hard-linked when the filesystem allows (zero-copy, like the reference's
in-place reserve via SnapshotDeletionPolicy) and copied otherwise, so a
later merge/delete in the live index can never mutate the snapshot.

``restore`` recreates a working index directory from a snapshot; readers
opened on it see exactly the snapshotted results.
"""

from __future__ import annotations

import json
import os
import shutil


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _copy_tree(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            _link_or_copy(os.path.join(root, f), os.path.join(out, f))


def create_snapshot(index_dir: str, snapshot_dir: str) -> dict:
    """Capture the current commit point → snapshot metadata dict."""
    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    os.makedirs(snapshot_dir, exist_ok=True)
    src_root = os.path.join(index_dir, "segments")
    copied = []
    for s in manifest["segments"]:
        # resolve exactly the dirs this commit references (merged segments
        # carry an explicit "dir"; uncommitted partials are never copied)
        d = s.get("dir", f"seg={s['seg']:06d}")
        _copy_tree(os.path.join(src_root, d), os.path.join(snapshot_dir, "segments", d))
        copied.append(d)
    for extra in ("manifest.json", "plan.json"):
        src = os.path.join(index_dir, extra)
        if os.path.exists(src):
            _link_or_copy(src, os.path.join(snapshot_dir, extra))
    meta = {
        "generation": manifest["generation"],
        "doc_count": manifest["stats"]["doc_count"],
        "segments": copied,
    }
    with open(os.path.join(snapshot_dir, "snapshot.json"), "w") as f:
        json.dump(meta, f)
    return meta


def replicate(leader_dir: str, follower_dir: str) -> dict:
    """Pull-based incremental follower sync — Solr's ``IndexFetcher``
    (``solr/core/src/java/org/apache/solr/handler/IndexFetcher.java``:
    fetch the leader's commit-point file list, download only files the
    follower lacks, delete obsolete ones, then install the new commit).

    Per leader-referenced segment dir, every missing file is hard-linked or
    copied (segment files are write-once, so present == identical; delta
    sidecars like ``deletes.parquet`` / doc-value updates appear as NEW
    files inside an existing dir and are picked up file-by-file). Follower
    segment dirs the leader no longer references are removed, and the
    leader's manifest is installed atomically (tmp + rename) — the same
    one-generation reader caveat as ``merge_index`` applies. Idempotent:
    a second call copies nothing.

    Returns ``{generation, up_to_date, copied_files, removed_dirs}``."""
    with open(os.path.join(leader_dir, "manifest.json")) as f:
        leader = json.load(f)
    fm_path = os.path.join(follower_dir, "manifest.json")
    if os.path.exists(fm_path):
        with open(fm_path) as f:
            if json.load(f).get("generation") == leader["generation"]:
                return {
                    "generation": leader["generation"],
                    "up_to_date": True,
                    "copied_files": 0,
                    "removed_dirs": 0,
                }
    live_dirs = [s.get("dir", f"seg={s['seg']:06d}") for s in leader["segments"]]
    src_root = os.path.join(leader_dir, "segments")
    dst_root = os.path.join(follower_dir, "segments")
    copied = 0
    for d in live_dirs:
        src = os.path.join(src_root, d)
        dst = os.path.join(dst_root, d)
        for root, _dirs, files in os.walk(src):
            rel = os.path.relpath(root, src)
            out = os.path.join(dst, rel) if rel != "." else dst
            os.makedirs(out, exist_ok=True)
            for fn in files:
                target = os.path.join(out, fn)
                if not os.path.exists(target):
                    _link_or_copy(os.path.join(root, fn), target)
                    copied += 1
    removed = 0
    live = set(live_dirs)
    if os.path.isdir(dst_root):
        for d in os.listdir(dst_root):
            if d not in live:
                shutil.rmtree(os.path.join(dst_root, d), ignore_errors=True)
                removed += 1
    for extra in ("manifest.json", "plan.json"):
        src = os.path.join(leader_dir, extra)
        if os.path.exists(src):
            tmp = os.path.join(follower_dir, extra + ".tmp")
            shutil.copy2(src, tmp)
            os.replace(tmp, os.path.join(follower_dir, extra))
    return {
        "generation": leader["generation"],
        "up_to_date": False,
        "copied_files": copied,
        "removed_dirs": removed,
    }


def restore_snapshot(snapshot_dir: str, index_dir: str) -> dict:
    """Recreate a working index dir from a snapshot (restore command)."""
    with open(os.path.join(snapshot_dir, "snapshot.json")) as f:
        meta = json.load(f)
    if os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    _copy_tree(os.path.join(snapshot_dir, "segments"), os.path.join(index_dir, "segments"))
    for extra in ("manifest.json", "plan.json"):
        src = os.path.join(snapshot_dir, extra)
        if os.path.exists(src):
            _link_or_copy(src, os.path.join(index_dir, extra))
    return meta
