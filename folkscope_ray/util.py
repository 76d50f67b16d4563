"""Hashing and determinism helpers shared by all stages.

The reference keys generations with md5 of "{asin_a}-{asin_b}-{rel}"
(src/generator/utils.py:42-49) and content-hashes eventualities/concepts with
sha1 (src/pattern/object.py:120-130, 702-711).  We keep both conventions and
add the north-rule per-row invariant: sha256(content) computed at ingest and
carried through every stage.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np


def sha256_hex(text: str | bytes) -> str:
    if isinstance(text, str):
        text = text.encode("utf-8")
    return hashlib.sha256(text).hexdigest()


def sha1_hex(text: str | bytes) -> str:
    if isinstance(text, str):
        text = text.encode("utf-8")
    return hashlib.sha1(text).hexdigest()


def md5_hex(text: str | bytes) -> str:
    if isinstance(text, str):
        text = text.encode("utf-8")
    return hashlib.md5(text).hexdigest()


def pair_key(a: str, b: str, rel: str) -> str:
    """md5 key of a (pair, relation) prompt — format per generator/utils.py:42-49."""
    return md5_hex(f"{a}-{b}-{rel}")


def generate_eid(dependencies, words, pos_tags) -> str:
    """Content hash of a normalized eventuality.

    Exactly the reference formula (src/pattern/object.py:120-130):
    sha1 of the JSON of [dependencies, words, pos_tags], with dependencies as
    (governor, label, dependent) index triples re-based to the eventuality.
    """
    msg = json.dumps([[list(d) for d in dependencies], list(words), list(pos_tags)])
    return sha1_hex(msg)


def generate_cid(words) -> str:
    """Concept id: sha1 of the space-joined words (src/pattern/object.py:702-711)."""
    return sha1_hex(" ".join(words))


def stable_u64(*parts: object) -> int:
    """Deterministic 64-bit hash of the given parts (never Python's salted hash)."""
    h = hashlib.blake2b("|".join(str(p) for p in parts).encode("utf-8"), digest_size=8)
    return int.from_bytes(h.digest(), "little")


def stable_choice(seq, *parts: object):
    """Deterministic element pick keyed on the parts."""
    return seq[stable_u64(*parts) % len(seq)]


def stable_uniform(*parts: object) -> float:
    """Deterministic uniform [0, 1) keyed on the parts."""
    return stable_u64(*parts) / 2**64


def sha256_column(values) -> np.ndarray:
    """Vectorized-ish sha256 over a string array (tight loop, no row dicts)."""
    return np.fromiter(
        (hashlib.sha256(v.encode("utf-8")).hexdigest() for v in values),
        dtype=object,
        count=len(values),
    )
