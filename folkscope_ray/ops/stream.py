"""Streaming-ingestion dedup against a SHARED MUTABLE INDEX.

The one shape in this engine that genuinely cannot be a Dataset transform:
an unbounded/arriving stream must drop keys it has EVER seen — across
batches, across separate Dataset executions, across micro-batch ticks — so
the seen-set is long-lived mutable state, not a per-stage shuffle.  This is
the documented escape hatch to raw Ray actors (`@ray.remote`), kept to the
smallest possible surface:

- ``DedupIndex`` — N index-shard actors, each owning a hash range of the
  key space.  Memory and request load spread over shards; the total index
  scales horizontally with ``n_shards`` (at 100 TB: one shard per node,
  each holding its range's key hashes — 8 bytes/key in a Python set of
  ints ≈ a few GB per billion keys per shard).
- ``dedup_stream_batch`` — a batch filter usable inside ``map_batches`` or
  a driver micro-batch loop: hash-partition the batch's keys, one
  ``check_and_add`` round-trip per shard (bulk, NOT per key), keep rows
  whose key was previously unseen.

Semantics: AT-MOST-ONCE retention per key with an arbitrary winner among
concurrent duplicates (the standard streaming-dedup contract — a total
first-wins order does not exist in a parallel stream).  Within one batch,
first occurrence wins deterministically.  ``check_and_add`` is atomic per
shard (actors process messages serially), so exactly one concurrent claimant
of a key ever sees "new".

For BATCH corpora prefer the shuffle-based exact dedup (`ops/dedup`) —
it has no long-lived state to size or restart.  For resumable streams,
``snapshot``/``restore`` round-trip each shard's key-hash set so the index
can checkpoint alongside the pipeline's stage manifests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote(num_cpus=0.1)
class _IndexShard:
    """Owns one hash range of the key space; message-serial => atomic."""

    def __init__(self):
        self._seen: set[int] = set()

    def check_and_add(self, key_hashes: list[int]) -> list[bool]:
        """For each hash (in order): True if NEW (and claim it), else False.
        Duplicates inside the call: first occurrence claims."""
        seen = self._seen
        out = []
        for h in key_hashes:
            if h in seen:
                out.append(False)
            else:
                seen.add(h)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self._seen)

    def snapshot(self) -> bytes:
        return np.fromiter(self._seen, dtype=np.uint64,
                           count=len(self._seen)).tobytes()

    def restore(self, blob: bytes) -> int:
        self._seen = set(np.frombuffer(blob, dtype=np.uint64).tolist())
        return len(self._seen)


def _key_hashes(keys) -> np.ndarray:
    """Stable 64-bit content hashes (md5-of-str prefix, little-endian —
    never Python's salted ``hash``), so the index survives process restarts
    and mixed writers.  Rides the shared vectorized md5 kernel
    (:func:`..split._md5_digests`: ONE Arrow cast + buffer-walking digest
    loop) and is bit-identical to the original per-key
    ``hashlib.md5(str(k).encode()).digest()[:8]`` — existing snapshots stay
    valid.  Accepts an Arrow array/chunked array or a Python list.  Note
    the str() convention means typed keys collide (int 1 == "1") — streams
    must carry ONE key type, same as the split/sample family."""
    from .split import _md5_digests

    if not isinstance(keys, (pa.Array, pa.ChunkedArray)):
        keys = pa.array(keys)
    dig = _md5_digests(keys)
    return dig[:, :8].copy().view("<u8").reshape(-1)


class DedupIndex:
    """Handle to the sharded index (create once, share the actor handles)."""

    def __init__(self, n_shards: int = 8):
        self.n_shards = n_shards
        self.shards = [_IndexShard.remote() for _ in range(n_shards)]

    def filter_new(self, keys) -> np.ndarray:
        """Boolean keep-mask: True where the key was never seen before.
        One bulk round-trip per shard that owns any of the batch's keys."""
        hashes = _key_hashes(keys)
        shard_of = (hashes % np.uint64(self.n_shards)).astype(np.int64)
        keep = np.zeros(len(keys), dtype=bool)
        futures, positions = [], []
        for s in range(self.n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx):
                futures.append(
                    self.shards[s].check_and_add.remote(
                        [int(h) for h in hashes[idx]]))
                positions.append(idx)
        for flags, idx in zip(ray.get(futures), positions):
            keep[idx] = flags
        return keep

    def total_keys(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self) -> list[bytes]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, blobs: list[bytes]) -> int:
        if len(blobs) != self.n_shards:
            # a zip would silently truncate: restoring an 8-shard snapshot
            # into a 16-shard index loses half the seen-key state AND the
            # h % n_shards routing changed, so previously-seen keys pass
            # the dedup filter again — at-most-once silently violated
            raise ValueError(
                f"DedupIndex.restore: snapshot has {len(blobs)} shards but "
                f"this index has {self.n_shards} — restore into an index "
                "constructed with the same n_shards")
        return sum(ray.get([s.restore.remote(b)
                            for s, b in zip(self.shards, blobs)]))


def dedup_stream_batch(index: DedupIndex, batch: pa.Table,
                       key_col: str) -> pa.Table:
    """Filter a micro-batch to rows whose key is globally new (claiming
    them in the shared index)."""
    keys = batch.column(key_col)
    if not len(keys):
        return batch
    return batch.filter(pa.array(index.filter_new(keys)))
