"""Per-stage lineage manifests: resumable checkpointed runs.

The reference resumes by per-file skip-if-exists and a key cache
(src/pattern/generation_parser.py:100-108; src/generator/generation.py:200,
227-229).  We formalize that: every checkpointed stage writes

    <run_dir>/<stage>/part-*.parquet         (the data, atomic via tmp+rename)
    <run_dir>/<stage>.manifest.json          (lineage + metrics)

The manifest records the stage's input fingerprint (hash of upstream manifest
+ config), per-file row counts, total rows, and counters.  On rerun, a stage
whose manifest exists with a matching fingerprint is NOT recomputed — its
parquet is read back instead; changing any upstream input or config changes
the fingerprint and invalidates everything downstream.  This is what
"resumable from checkpoint with per-partition lineage + metrics" (north rule)
means for a batch DAG.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import pyarrow.parquet as pq

from ..util import sha256_hex

MANIFEST_SUFFIX = ".manifest.json"


def _manifest_path(run_dir: str, stage: str) -> str:
    return os.path.join(run_dir, stage + MANIFEST_SUFFIX)


def stage_dir(run_dir: str, stage: str) -> str:
    return os.path.join(run_dir, stage)


def fingerprint(*parts: object) -> str:
    return sha256_hex("|".join(str(p) for p in parts))[:16]


def source_fingerprint(path: str) -> str:
    """Content identity of a source path: every data file's relative path,
    size and mtime_ns fold into the hash, so rewriting a file IN PLACE (same
    path, new bytes) still invalidates downstream checkpoints.  Used as the
    root of each stage's chained fingerprint (stage fp = hash(upstream fp +
    stage config)), giving transitive downstream invalidation."""
    entries = []
    if os.path.isfile(path):
        st = os.stat(path)
        entries.append(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                full = os.path.join(root, f)
                st = os.stat(full)
                entries.append(
                    f"{os.path.relpath(full, path)}:{st.st_size}:{st.st_mtime_ns}"
                )
    else:
        entries.append(path)
    return fingerprint("src", *entries)


def load_manifest(run_dir: str, stage: str) -> dict | None:
    path = _manifest_path(run_dir, stage)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def stage_complete(run_dir: str, stage: str, fp: str) -> bool:
    m = load_manifest(run_dir, stage)
    return bool(m) and m.get("fingerprint") == fp and os.path.isdir(stage_dir(run_dir, stage))


def finalize_stage(run_dir: str, stage: str, fp: str, tmp_out: str,
                   counters: dict | None = None) -> dict:
    """Atomically promote a finished stage: rename tmp dir, write manifest."""
    final = stage_dir(run_dir, stage)
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.replace(tmp_out, final)
    files = sorted(f for f in os.listdir(final) if f.endswith(".parquet"))
    parts = []
    total = 0
    for f in files:
        n = pq.read_metadata(os.path.join(final, f)).num_rows
        parts.append({"file": f, "rows": n})
        total += n
    manifest = {
        "stage": stage,
        "fingerprint": fp,
        "rows": total,
        "partitions": parts,
        "counters": counters or {},
        "completed_at": time.time(),
    }
    tmp = _manifest_path(run_dir, stage) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _manifest_path(run_dir, stage))
    return manifest


def finalize_stage_partitioned(run_dir: str, stage: str, fp: str, tmp_out: str,
                               counters: dict | None = None) -> dict:
    """Like :func:`finalize_stage` but for hive-partitioned layouts
    (e.g. ``pred=usedFor/*.parquet``): partitions are recorded per file with
    their relative path, so a resume can skip finished key ranges."""
    final = stage_dir(run_dir, stage)
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.replace(tmp_out, final)
    parts = []
    total = 0
    for root, _dirs, files in sorted(os.walk(final)):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            full = os.path.join(root, f)
            n = pq.read_metadata(full).num_rows
            parts.append({"file": os.path.relpath(full, final), "rows": n})
            total += n
    manifest = {
        "stage": stage,
        "fingerprint": fp,
        "rows": total,
        "partitions": parts,
        "counters": counters or {},
        "completed_at": time.time(),
    }
    tmp = _manifest_path(run_dir, stage) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _manifest_path(run_dir, stage))
    return manifest


def checkpoint(ds, run_dir: str, stage: str, fp: str, counters: dict | None = None):
    """Write ``ds`` as the stage checkpoint unless already complete.

    Returns a fresh Dataset reading the checkpoint (so downstream stages
    consume the persisted partitions, and a killed rerun restarts here).
    """
    import ray.data as rd

    os.makedirs(run_dir, exist_ok=True)
    if not stage_complete(run_dir, stage, fp):
        sweep_stale_tmp(run_dir, stage)
        tmp_out = tempfile.mkdtemp(dir=run_dir, prefix=f".{stage}-tmp-")
        try:
            ds.write_parquet(tmp_out)
            finalize_stage(run_dir, stage, fp, tmp_out, counters)
        except BaseException:
            # a failed write must not leave a near-stage-sized tmp copy in
            # run_dir (each crashed retry would add another until disk
            # fills); the sweep above also clears dirs a killed -9 left
            shutil.rmtree(tmp_out, ignore_errors=True)
            raise
    return rd.read_parquet(stage_dir(run_dir, stage))


def sweep_stale_tmp(run_dir: str, stage: str) -> None:
    """Remove half-written ``.{stage}-tmp-*`` dirs a killed run left
    behind — they are rewrite candidates by construction (the stage is not
    complete when this runs)."""
    try:
        names = os.listdir(run_dir)
    except FileNotFoundError:
        return
    for name in names:
        if name.startswith(f".{stage}-tmp-"):
            shutil.rmtree(os.path.join(run_dir, name), ignore_errors=True)
