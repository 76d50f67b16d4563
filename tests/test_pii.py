"""PII detection/redaction (ops/pii.py): sequential RE2 count+replace."""
import numpy as np
import pandas as pd
import ray.data as rd

from folkscope_ray.ops.pii import pii_scrub


def test_pii_scrub_counts_and_redaction():
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "mail bob@x.com and alice@y.org now",
            "server at 10.0.0.1 port 80, call 555-123-4567",
            "no pii here at all",
            "a@b.io from 192.168.1.254 tel 555.999.0000",
        ],
    })
    out = (pii_scrub(rd.from_pandas(df, override_num_blocks=2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_email"].tolist() == [2, 0, 0, 1]
    assert out["n_ipv4"].tolist() == [0, 1, 0, 1]
    assert out["n_phone"].tolist() == [0, 1, 0, 1]
    assert out["n_pii"].tolist() == [2, 2, 0, 3]
    assert out["redacted"].tolist() == [
        "mail <EMAIL> and <EMAIL> now",
        "server at <IP> port 80, call <PHONE>",
        "no pii here at all",
        "<EMAIL> from <IP> tel <PHONE>",
    ]
    # text column replaced by redacted; id carried through
    assert sorted(out.columns) == sorted(
        ["doc_id", "n_email", "n_ipv4", "n_phone", "n_pii", "redacted"])


def test_pii_scrub_sequential_no_double_count():
    # the ip-like span inside the email must NOT count as an IP: emails are
    # redacted before the ipv4 pass runs (dict order = application order)
    df = pd.DataFrame({"doc_id": [0], "text": ["x 1.2.3.4@dom.com y"]})
    out = pii_scrub(rd.from_pandas(df)).to_pandas()
    assert out["n_email"].tolist() == [1]
    assert out["n_ipv4"].tolist() == [0]
    assert out["redacted"].tolist() == ["x <EMAIL> y"]


# ------------------------------------------------------- chunk-level dedup


def test_chunk_dedup_first_occurrence_wins():
    """Planted repeated passage: the 4-token chunk 'x y z w' appears in three
    docs; only doc 0 (first occurrence) keeps it.  A fully-duplicated doc
    drops out entirely."""
    from folkscope_ray.ops.dedup import chunk_dedup

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "x y z w alpha beta gamma delta",      # owns both its chunks
            "x y z w epsilon zeta eta theta",      # chunk 0 is a dupe
            "x y z w",                             # fully duplicated -> gone
            "unique words only here right now ok", # untouched
        ],
    })
    out = (chunk_dedup(rd.from_pandas(df, override_num_blocks=2),
                       chunk_tokens=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 1, 3]
    got = dict(zip(out["doc_id"], out["text_dedup"]))
    assert got[0] == "x y z w alpha beta gamma delta"
    assert got[1] == "epsilon zeta eta theta"
    assert got[3] == "unique words only here right now ok"
    assert dict(zip(out["doc_id"], out["n_kept"])) == {0: 2, 1: 1, 3: 2}


def test_chunk_dedup_partition_invariant():
    """Same output at 1 block and 7 blocks (map-side combine + min agg are
    partition-independent)."""
    from folkscope_ray.ops.dedup import chunk_dedup

    rng = np.random.RandomState(11)
    vocab = list("abcdefgh")
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    df = pd.DataFrame({"doc_id": range(40), "text": texts})
    outs = []
    for nb in (1, 7):
        out = (chunk_dedup(rd.from_pandas(df, override_num_blocks=nb),
                           chunk_tokens=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # every chunk string survives exactly once corpus-wide
    all_chunks = [c for t in outs[0]["text_dedup"]
                  for c in [" ".join(t.split()[i:i+2])
                            for i in range(0, len(t.split()), 2)]]
    assert len(all_chunks) == len(set(all_chunks))


def test_chunk_overlap_windows_and_edges():
    import pyarrow as pa

    from folkscope_ray.ops.text import chunk_overlap_batch

    b = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["one two three four five six seven",  # 7 toks
                 "",                                   # empty: no chunks
                 "  A b!c ",                           # separators/case
                 "x"],                                 # single short tail
    })
    out = chunk_overlap_batch(b, size=3, stride=2).to_pandas()
    d1 = out[out.doc_id == 1]
    assert list(d1.chunk) == ["one two three", "three four five",
                              "five six seven", "seven"]
    assert list(d1.n_tokens) == [3, 3, 3, 1]
    assert list(d1.chunk_idx) == [0, 1, 2, 3]
    assert (out.doc_id != 2).all()  # empty doc emits nothing
    assert list(out[out.doc_id == 3].chunk) == ["a b c", "c"]
    assert list(out[out.doc_id == 4].chunk) == ["x"]
    # stride == size degenerates to chunk_dedup's non-overlapping windows
    nolap = chunk_overlap_batch(b, size=3, stride=3).to_pandas()
    assert list(nolap[nolap.doc_id == 1].chunk) == [
        "one two three", "four five six", "seven"]


def test_chunk_overlap_partition_invariant():
    import pyarrow as pa

    from folkscope_ray.ops.text import chunk_overlap_batch

    df = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")[
        ["doc_id", "text"]]
    whole = chunk_overlap_batch(
        pa.Table.from_pandas(df), size=16, stride=12).to_pandas()
    outs = []
    for nb in (1, 4):
        ds = rd.from_pandas(df, override_num_blocks=nb).map_batches(
            lambda b: chunk_overlap_batch(b, size=16, stride=12),
            batch_format="pyarrow")
        outs.append(ds.to_pandas().sort_values(["doc_id", "chunk_idx"])
                    .reset_index(drop=True))
    ref = whole.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    for o in outs:
        pd.testing.assert_frame_equal(o, ref)
