"""Ingest: sha256 lineage + entity extraction + co-occurrence pairs.

Analogue of the reference's metadata load + co-buy edge sampling
(src/generator/utils.py:52-81; src/generator/generation.py:163-189), re-bound
to the source-code domain: the "items" are function/class definitions found in
``content`` by per-language regexes, and the "co-buy pairs" are consecutive
co-occurring definitions within one file.

Scale notes:
- runs as stateless ``map_batches`` with ``batch_format="pyarrow"``; the only
  per-row Python work is regex scanning + sha256, both unavoidable and cheap
  relative to content size;
- ``content`` is DROPPED immediately after this stage — downstream stages only
  carry ``content_sha256`` (the north-rule lineage invariant) plus the small
  extracted columns, so wide rows never travel through the shuffles.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..util import sha256_column

# One compiled regex per language (compiled once per worker at import time —
# the reference compiles its cleaning regexes at module scope too,
# src/pattern/utils.py:53-56).
ENTITY_REGEX = {
    "python": re.compile(r"^def\s+(\w+)\s*\(", re.M),
    "js": re.compile(r"^function\s+(\w+)\s*\(", re.M),
    "go": re.compile(r"^func\s+(\w+)\s*\(", re.M),
    "rust": re.compile(r"^fn\s+(\w+)\s*\(", re.M),
    "java": re.compile(r"^class\s+(\w+)\b", re.M),
}


def extract_entities(lang: str, content: str) -> list[str]:
    rx = ENTITY_REGEX.get(lang)
    if rx is None:
        return []
    seen, out = set(), []
    for m in rx.finditer(content):
        name = m.group(1)
        if name not in seen:
            seen.add(name)
            out.append(name)
    return out


def ingest_batch(batch: pa.Table) -> pa.Table:
    """(repo,path,commit,lang,content) -> + content_sha256, entities; drop content."""
    content = batch.column("content").to_pylist()
    langs = batch.column("lang").to_pylist()
    sha = sha256_column(content)
    ents = [extract_entities(l, c) for l, c in zip(langs, content)]
    out = batch.drop_columns(["content"])
    out = out.append_column("content_sha256", pa.array(sha, type=pa.string()))
    out = out.append_column("entities", pa.array(ents, type=pa.list_(pa.string())))
    return out


def pairs_batch(batch: pa.Table) -> pa.Table:
    """Explode each file's entity list into consecutive co-occurrence pairs.

    1 row in -> (n_entities - 1) rows out, carrying the file lineage columns.
    Analogue of the reference's behavior-pair construction
    (src/generator/generation.py:163-189) minus the sampling (deterministic
    corpus ⇒ no reservoir sample needed; seeded ``random_sample`` is available
    on the Dataset if a user wants it).
    """
    repos, paths, commits = (batch.column(c).to_pylist() for c in ("repo", "path", "commit"))
    shas = batch.column("content_sha256").to_pylist()
    entlists = batch.column("entities").to_pylist()
    o_repo, o_path, o_commit, o_sha, o_a, o_b = [], [], [], [], [], []
    for repo, path, commit, sha, ents in zip(repos, paths, commits, shas, entlists):
        for a, b in zip(ents, ents[1:]):
            o_repo.append(repo)
            o_path.append(path)
            o_commit.append(commit)
            o_sha.append(sha)
            o_a.append(a)
            o_b.append(b)
    return pa.table(
        {
            "repo": pa.array(o_repo, pa.string()),
            "path": pa.array(o_path, pa.string()),
            "commit": pa.array(o_commit, pa.string()),
            "content_sha256": pa.array(o_sha, pa.string()),
            "surf_a": pa.array(o_a, pa.string()),
            "surf_b": pa.array(o_b, pa.string()),
        }
    )
