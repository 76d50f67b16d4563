"""folkscope_ray — a Ray-Data-native knowledge-graph-construction engine.

A from-scratch re-expression of the data-processing capabilities of
HKUST-KnowComp/FolkScope (ACL Findings 2023, arXiv 2211.08316) as an
idiomatic Ray Data pipeline over zero-copy Arrow batches:

    source files (repo, path, commit, lang, content)
      -> ingest (sha256 lineage + entity extraction)       [stateless map_batches]
      -> co-occurrence pairs -> 21-relation prompt fan-out [flat map]
      -> candidate-assertion generation                     [actor pool]
      -> plausibility/typicality critic + threshold filter  [actor pool]
      -> deterministic parse (tokens/pos/lemmas/deps)       [stateless map_batches]
      -> pattern mining (skeleton groupby counts)           [shuffle: pattern_key]
      -> pattern match -> eventualities (eid = sha1)        [broadcast patterns]
      -> dedup/merge on eid                                 [shuffle: eid]
      -> minhash-LSH + union-find entity canonicalization   [salted shuffle: band]
      -> taxonomy conceptualization                         [actor pool]
      -> (subj, pred, obj) triple materialization           [partitioned parquet]

No code is copied from the reference; reference files are cited as
``file:line`` in docstrings purely so semantic parity can be audited.
"""

__version__ = "0.1.0"
