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
