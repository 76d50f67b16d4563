"""Tests for the statistical-LM curation ops (ops/lm.py, ops/split.py
additions): BPE training/encoding, bigram-LM perplexity, deterministic
shuffle and mixing weights — against pure-Python or DuckDB oracles, with
parallelism-invariance checks (repartition(1) vs repartition(8))."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"
_TOK = re.compile(r"[a-z0-9]+")


def _docs():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


def _doc_texts() -> list[str]:
    import duckdb

    return duckdb.sql(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).fetchdf()["text"].tolist()


# --------------------------------------------------------------------- BPE

def test_bpe_train_textbook_example():
    """The canonical Sennrich example: {'low':5,'lower':2,'newest':6,
    'widest':3} — first merges must assemble 'est</w>' then 'low'."""
    from folkscope_ray.ops.lm import bpe_train

    wf = pd.DataFrame({"word": ["low", "lower", "newest", "widest"],
                       "n": [5, 2, 6, 3]})
    m = bpe_train(wf, 6)
    pairs = list(zip(m["left"], m["right"]))
    # 'es' (9), then 'es'+'t' (9), then 'est'+'</w>' (9), then 'l'+'o' (7),
    # 'lo'+'w' (7) — counts force this exact order under lexical tie-break
    assert pairs[:5] == [("e", "s"), ("es", "t"), ("est", "</w>"),
                         ("l", "o"), ("lo", "w")]


def test_bpe_encode_word_applies_rank_order():
    from folkscope_ray.ops.lm import bpe_encode_word, bpe_train

    wf = pd.DataFrame({"word": ["low", "lower", "newest", "widest"],
                       "n": [5, 2, 6, 3]})
    m = bpe_train(wf, 10)
    ranks = {(l, r): int(k) for k, l, r in zip(m["rank"], m["left"], m["right"])}
    assert bpe_encode_word("lowest", ranks)[-1] == "est</w>"
    # unseen word degrades to chars + whatever merges apply
    assert "".join(bpe_encode_word("zzz", ranks)) == "zzz</w>"


def test_word_counts_and_bpe_token_counts_vs_python_oracle():
    from folkscope_ray.ops.lm import (bpe_encode_word, bpe_token_counts,
                                      bpe_train, word_counts)

    texts = _doc_texts()
    oracle_wc: Counter = Counter()
    for t in texts:
        oracle_wc.update(_TOK.findall(t.lower()))

    wc_ds = word_counts(_docs())
    got = wc_ds.to_pandas().sort_values("word").reset_index(drop=True)
    assert dict(zip(got["word"], got["n"])) == dict(oracle_wc)

    wf = pd.DataFrame(sorted(oracle_wc.items()), columns=["word", "n"])
    merges = bpe_train(wf, 50)
    ranks = {(l, r): int(k) for k, l, r in
             zip(merges["rank"], merges["left"], merges["right"])}
    oracle_tok: Counter = Counter()
    for w, n in oracle_wc.items():
        for tok in bpe_encode_word(w, ranks):
            oracle_tok[tok] += n

    tc = bpe_token_counts(wc_ds, merges).to_pandas()
    assert dict(zip(tc["token"], tc["n"])) == dict(oracle_tok)


def test_bpe_training_invariant_to_parallelism():
    from folkscope_ray.ops.lm import bpe_train, word_counts

    m1 = bpe_train(
        word_counts(_docs().repartition(1)).to_pandas()
        .sort_values("word").reset_index(drop=True), 30)
    m8 = bpe_train(
        word_counts(_docs().repartition(8)).to_pandas()
        .sort_values("word").reset_index(drop=True), 30)
    assert m1.values.tolist() == m8.values.tolist()


# ------------------------------------------------------------- bigram LM

def _python_lm(texts: list[str]):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        ws = _TOK.findall(t.lower())
        uni.update(ws)
        for i in range(len(ws) - 1):
            bi[ws[i] + " " + ws[i + 1]] += 1
    return uni, bi


def test_train_bigram_lm_matches_python_counts():
    from folkscope_ray.ops.lm import train_bigram_lm

    texts = _doc_texts()
    uni, bi = _python_lm(texts)
    m = train_bigram_lm(_docs())
    assert m["unigrams"] == dict(uni)
    assert m["bigrams"] == dict(bi)
    assert m["total_uni"] == sum(uni.values())


def test_train_bigram_lm_topk_gate_is_deterministic():
    from folkscope_ray.ops.lm import train_bigram_lm

    m_full = train_bigram_lm(_docs())
    m_cut = train_bigram_lm(_docs(), max_vocab=20, max_bigrams=100)
    assert len(m_cut["unigrams"]) == 20 < len(m_full["unigrams"])
    # the kept 20 are exactly the top-20 by (count desc, word asc)
    want = sorted(m_full["unigrams"].items(),
                  key=lambda kv: (-kv[1], kv[0]))[:20]
    assert sorted(m_cut["unigrams"].items()) == sorted(want)
    # every kept bigram's words are in the kept vocabulary
    assert all(w in m_cut["unigrams"]
               for g in m_cut["bigrams"] for w in g.split(" "))


def test_perplexity_scorer_matches_python_and_parallelism_invariant():
    import ray

    from folkscope_ray.ops.lm import PerplexityScorer, train_bigram_lm

    texts = _doc_texts()
    model = train_bigram_lm(_docs())
    scorer = PerplexityScorer(ray.put(model))

    # python oracle for one doc
    ws = _TOK.findall(texts[0].lower())
    denom = float(model["total_uni"] + model["vocab_size"] + 1)
    bits = 0.0
    for i in range(1, len(ws)):
        c1 = model["unigrams"].get(ws[i - 1], 0)
        p_bi = (model["bigrams"].get(ws[i - 1] + " " + ws[i], 0) / c1) if c1 else 0.0
        p_uni = (model["unigrams"].get(ws[i], 0) + 1) / denom
        bits -= math.log2(0.9 * p_bi + 0.1 * p_uni)
    want0 = int(round(1000.0 * bits / (len(ws) - 1)))

    got1 = (_docs().repartition(1)
            .map_batches(PerplexityScorer, fn_constructor_args=(ray.put(model),),
                         concurrency=2, batch_format="pyarrow")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got8 = (_docs().repartition(8)
            .map_batches(PerplexityScorer, fn_constructor_args=(ray.put(model),),
                         concurrency=2, batch_format="pyarrow")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got1["ppl_millibits"].iloc[0] == want0
    assert got1["ppl_millibits"].tolist() == got8["ppl_millibits"].tolist()
    # in-vocabulary fluent text scores lower than the model's OOV tail
    assert got1["ppl_millibits"].min() >= 0


# ------------------------------------------------- shuffle / mixing weights

def test_deterministic_shuffle_matches_md5_order_and_sql():
    import duckdb

    from folkscope_ray.ops.split import deterministic_shuffle

    got = (deterministic_shuffle(
        _docs().select_columns(["doc_id"]), "doc_id", seed=42)
        .limit(50).to_pandas())
    want = duckdb.sql(
        f"""SELECT doc_id, md5('42|' || CAST(doc_id AS VARCHAR)) AS __shuf
            FROM read_parquet('{SF}/documents.parquet')
            ORDER BY __shuf, doc_id LIMIT 50"""
    ).fetchdf()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["__shuf"].tolist() == want["__shuf"].tolist()
    # same seed → same permutation; different seed → different permutation
    again = (deterministic_shuffle(
        _docs().select_columns(["doc_id"]), "doc_id", seed=42)
        .limit(50).to_pandas())
    other = (deterministic_shuffle(
        _docs().select_columns(["doc_id"]), "doc_id", seed=43)
        .limit(50).to_pandas())
    assert got["doc_id"].tolist() == again["doc_id"].tolist()
    assert got["doc_id"].tolist() != other["doc_id"].tolist()


def test_mixing_weights_integer_exact():
    from folkscope_ray.ops.split import mixing_weights

    df = pd.DataFrame({"source": ["a", "b", "c"],
                       "n_tokens": [1_000_000, 250_000, 10_000]})
    out = mixing_weights(df, "source", "n_tokens")
    s = np.array([math.isqrt(v) for v in df["n_tokens"]])
    want = (1_000_000 * s) // s.sum()
    assert out["weight_ppm"].tolist() == want.tolist()
    # sqrt rule upweights the small domain vs proportional sampling
    prop_c = 1_000_000 * 10_000 // 1_260_000
    assert out.set_index("source")["weight_ppm"]["c"] > prop_c
