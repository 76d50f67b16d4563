"""Text-analysis operators: language ID, quality scores, token counts,
document fingerprints.

Each is a vectorized ``map_batches`` stage over a ``documents``-shaped table
(doc_id, text, ...).  Stateful pieces (compiled regexes, stopword sets,
n-gram profiles) live in class ``__init__`` so actor pools amortize them.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .index import TERM_RE

TOKEN_RE = re.compile(r"[A-Za-z0-9_']+|[^\sA-Za-z0-9_']")
WORD_RE = re.compile(r"[A-Za-z']+")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by".split()
)

# tiny deterministic character-trigram profiles for a heuristic language ID
_LANG_PROFILES = {
    "en": ("the", "and", "ing", "ion", "ent", " th", "he ", "er ", " of", "of "),
    "de": ("der", "die", "und", "sch", "ein", "ich", "cht", "en ", " de", "ung"),
    "fr": ("les", "de ", " de", "ent", "que", "ion", "eur", " le", "la ", "des"),
    "es": ("de ", " de", "que", "los", " la", "el ", "ión", "ado", "nte", "las"),
}


class LangId:
    """n-gram-profile language guess (stateful: profiles built per actor)."""

    def __init__(self):
        self.profiles = {
            lang: {g: len(grams) - i for i, g in enumerate(grams)}
            for lang, grams in _LANG_PROFILES.items()
        }

    def guess(self, text: str) -> str:
        t = text.lower()
        best, best_score = "en", -1.0
        for lang, prof in self.profiles.items():
            score = sum(w * t.count(g) for g, w in prof.items())
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized interior: one Arrow ``count_substring`` kernel per
        profile gram over the whole column (40 C++ scans per BATCH instead
        of 40 Python scans per ROW).  ``np.argmax`` keeps the first max —
        identical to ``guess``'s strict-greater iteration in profile order
        (bit-equal, fixture-gated)."""
        import pyarrow.compute as pc

        tl = pc.utf8_lower(batch.column("text"))
        langs_list = list(self.profiles)
        n = batch.num_rows
        scores = np.zeros((n, len(langs_list)), dtype=np.float64)
        for li, lang in enumerate(langs_list):
            for g, w in self.profiles[lang].items():
                scores[:, li] += w * pc.count_substring(tl, g).to_numpy(
                    zero_copy_only=False)
        langs = np.asarray(langs_list, dtype=object)[
            np.argmax(scores, axis=1)] if n else np.empty(0, dtype=object)
        return batch.append_column(
            "lang_guess", pa.array(langs, pa.string()))


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace words + a BPE-ish regex token count."""
    texts = batch.column(text_col).to_pylist()
    ws = np.fromiter((len(t.split()) for t in texts), dtype=np.int64, count=len(texts))
    bpe = np.fromiter(
        (len(TOKEN_RE.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )
    out = batch.append_column("n_words", pa.array(ws, pa.int64()))
    return out.append_column("n_tokens", pa.array(bpe, pa.int64()))


# ASCII byte classes for the vectorized punct-ratio kernel: alnum or whitespace
_ALNUM_SPACE_LUT = np.zeros(256, dtype=bool)
for _b in (*range(48, 58), *range(65, 91), *range(97, 123), 9, 10, 11, 12, 13, 32, 28, 29, 30, 31):
    _ALNUM_SPACE_LUT[_b] = True


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword-ratio quality features + a 0-1 score.

    The per-character alnum scan is one numpy lookup-table pass over the
    batch's concatenated UTF-8 bytes (ASCII fast path, which real code corpora
    overwhelmingly hit); rows with multi-byte characters fall back to the
    exact per-character scan."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    lengths = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    stop_ratio = np.empty(n, dtype=np.float64)
    mean_word_len = np.empty(n, dtype=np.float64)

    blob = "".join(texts).encode("utf-8", "surrogatepass")
    if len(blob) == int(lengths.sum()):  # pure ASCII: byte == char
        # one trailing False sentinel keeps every reduceat start index in
        # range WITHOUT clipping: clipping a trailing empty doc's start from
        # len to len-1 used to split the previous segment and silently drop
        # its final byte from that doc's alnum sum
        good = np.concatenate(
            (_ALNUM_SPACE_LUT[np.frombuffer(blob, dtype=np.uint8)],
             np.zeros(1, dtype=bool)))
        bounds = np.concatenate(([0], np.cumsum(lengths)))
        sums = np.add.reduceat(good, bounds[:-1]) \
            if len(blob) else np.zeros(n)
        # reduceat quirk: an empty (zero-length) slice yields the single
        # element at its start index — zero those rows explicitly
        sums = np.where(lengths == 0, 0, sums)
        punct_ratio = np.where(
            lengths > 0, 1.0 - sums / np.maximum(lengths, 1), 0.0
        )
    else:
        punct_ratio = np.fromiter(
            (
                (1.0 - sum(c.isalnum() or c.isspace() for c in t) / len(t)) if t else 0.0
                for t in texts
            ),
            dtype=np.float64, count=n,
        )
    for i, t in enumerate(texts):
        words = WORD_RE.findall(t.lower())
        stop_ratio[i] = (
            sum(w in STOPWORDS for w in words) / len(words) if words else 0.0
        )
        mean_word_len[i] = float(np.mean([len(w) for w in words])) if words else 0.0
    score = np.clip(
        0.3 * (stop_ratio > 0.05)
        + 0.3 * (punct_ratio < 0.2)
        + 0.2 * ((lengths >= 50) & (lengths <= 50_000))
        + 0.2 * ((mean_word_len >= 2.5) & (mean_word_len <= 12)),
        0.0,
        1.0,
    )
    out = batch.append_column("doc_len", pa.array(lengths, pa.int64()))
    out = out.append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
    out = out.append_column("stop_ratio", pa.array(stop_ratio, pa.float64()))
    out = out.append_column("quality_score", pa.array(score, pa.float64()))
    return out


MAX_SENTENCE_LEN = 1024


def split_sentences(text: str, max_len: int = MAX_SENTENCE_LEN) -> list[str]:
    """Recursive long-text splitting: paragraphs ("\\n\\n"), then lines
    ("\\n"), then sentence-final punctuation — the reference's recursive
    splitter shape (src/pattern/utils.py:144-192, MAX_LEN utils.py:69) with a
    regex sentence fallback instead of a CoreNLP ssplit call."""
    text = text.strip()
    if not text:
        return []
    if len(text) <= max_len:
        return [text]
    for sep in ("\n\n", "\n"):
        if sep in text:
            out = []
            for part in text.split(sep):
                out.extend(split_sentences(part, max_len))
            return out
    pieces = re.split(r"(?<=[.!?])\s+", text)
    if len(pieces) > 1:
        out = []
        for p in pieces:
            out.extend(split_sentences(p, max_len))
        return out
    return [text[i : i + max_len] for i in range(0, len(text), max_len)]


# cleaning semantics per the reference's clean_sentence
# (src/pattern/utils.py:195-214): drop non-ASCII, collapse <ref ...> tags,
# rewrite URLs to a placeholder, squeeze whitespace.  The URL regex here is a
# compact equivalent, not the reference's 4KB TLD enumeration.
_REF_TAG_RE = re.compile(r"<ref[^>]*>")
_URL_RE = re.compile(r"\bhttps?://[^\s<>\"]+|\bwww\.[^\s<>\"]+", re.I)
_WS_RE = re.compile(r"\s+")


def clean_text(text: str) -> str:
    t = text.encode("ascii", "ignore").decode("ascii")
    t = _REF_TAG_RE.sub("<ref>", t)
    t = _URL_RE.sub("<url>", t)
    return _WS_RE.sub(" ", t).strip()


def clean_text_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    cleaned = [clean_text(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("clean_text", pa.array(cleaned, pa.string()))


_FP_B, _FP_MOD = 257, (1 << 31) - 1


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      window: int = 16) -> pa.Table:
    """Winnowing-style document fingerprint: min rolling hash per window,
    xor-folded to one uint64 per doc (cheap near-dup prefilter).

    The rolling Rabin-Karp hash is computed for ALL windows at once as one
    int64 sliding-window × kernel matmul mod p (values bounded by
    window · 255 · 2³¹ ≈ 2⁴³, no overflow) — bit-identical to the scalar
    recurrence (r·B + in − out·B^w) mod p, ~100× faster than the former
    per-byte Python loop."""
    texts = batch.column(text_col).to_pylist()
    kernel = np.array(
        [pow(_FP_B, window - 1 - j, _FP_MOD) for j in range(window)],
        dtype=np.int64,
    )
    fps = []
    for t in texts:
        data = t.encode("utf-8", "ignore")
        if len(data) < window:
            data = data.ljust(window, b" ")
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        rolls = (
            np.lib.stride_tricks.sliding_window_view(arr, window) @ kernel
        ) % _FP_MOD
        n_full = (len(rolls) // 64) * 64
        h = 0
        if n_full:
            h = int(np.bitwise_xor.reduce(
                rolls[:n_full].reshape(-1, 64).min(axis=1)))
        if len(rolls) > n_full:
            h ^= int(rolls[n_full:].min())
        fps.append(h & 0xFFFFFFFFFFFFFFFF)
    return batch.append_column("fingerprint", pa.array(fps, pa.uint64()))


# alias of the ONE corpus token class (ops/index.py TERM_RE) — kept as a
# local name for the existing call sites, never re-declared
_BIGRAM_TOKEN_RE = TERM_RE


def _explode_tokens(texts: list[str]):
    """Tokenize a block in one pass: (flat Arrow string array of every token
    occurrence, int64 row index per occurrence).  One C-level ``findall``
    per row; everything downstream is Arrow/numpy."""
    from itertools import chain

    tok_lists = [TERM_RE.findall(t.lower()) for t in texts]
    counts = np.fromiter((len(l) for l in tok_lists), dtype=np.int64,
                         count=len(tok_lists))
    flat = pa.array(list(chain.from_iterable(tok_lists)), pa.string())
    rows = np.repeat(np.arange(len(tok_lists), dtype=np.int64), counts)
    return flat, rows


def bigram_partials(batch: pa.Table, text_col: str = "text",
                    lang_col: str = "lang") -> pa.Table:
    """Per-block (lang, bigram) counts — the MAP-SIDE COMBINER for corpus
    n-gram statistics: each block collapses its documents to one partial row
    per distinct (lang, bigram), so the downstream shuffle moves vocabulary
    rows, not token occurrences (the 100-TB n-gram-counting discipline).

    Vectorized interior (was a Python Counter loop over every token):
    tokens explode once, adjacent same-row pairs join via Arrow
    ``binary_join_element_wise``, and the partial counts come from one
    Arrow ``group_by`` — no Python per token."""
    empty = pa.table({"lang": pa.array([], pa.string()),
                      "bigram": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    langs = batch.column(lang_col).to_pylist()
    flat, rows = _explode_tokens(batch.column(text_col).to_pylist())
    if len(flat) < 2:
        return empty
    same = rows[:-1] == rows[1:]
    if not same.any():
        return empty
    mask = pa.array(same)
    a = flat.slice(0, len(flat) - 1).filter(mask)
    b = flat.slice(1, len(flat) - 1).filter(mask)
    big = pc.binary_join_element_wise(a, b, " ")
    lang_of_pair = pa.array(
        np.asarray(langs, dtype=object)[rows[:-1][same]], pa.string())
    g = (pa.table({"lang": lang_of_pair, "bigram": big})
         .group_by(["lang", "bigram"])
         .aggregate([([], "count_all")]))
    return pa.table({
        "lang": g["lang"],
        "bigram": g["bigram"],
        "n": pc.cast(g["count_all"], pa.int64()),
    })


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Intra-document repetition quality signal: line counts, distinct line
    counts and the duplicate-line ratio ``1 - distinct/total`` (boilerplate /
    log-spam detector for training-data filtering).  Pure per-doc map — the
    division is a single IEEE op of identical operands on any engine."""
    texts = batch.column(text_col).to_pylist()
    n_lines = np.empty(len(texts), dtype=np.int64)
    n_distinct = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        lines = t.split("\n")
        n_lines[i] = len(lines)
        n_distinct[i] = len(set(lines))
    ratio = 1.0 - (n_distinct / n_lines)
    out = batch.append_column("n_lines", pa.array(n_lines, pa.int64()))
    out = out.append_column("n_distinct_lines", pa.array(n_distinct, pa.int64()))
    return out.append_column("rep_ratio", pa.array(ratio, pa.float64()))


def term_stats_partials(batch: pa.Table, text_col: str = "text",
                        lang_col: str = "lang") -> pa.Table:
    """Per-block (lang, term) -> (occurrence count, containing-doc count)
    partials — the map-side combiner for corpus TF-IDF: one output row per
    distinct (lang, term) per block, so the shuffle moves vocabulary rows
    (bounded by vocab x langs x blocks), never token occurrences.

    Vectorized interior (was two Python Counter loops over every token):
    tokens explode once, terms dictionary-encode via Arrow, and both counts
    come from ``np.unique`` over packed int64 keys — occurrences from
    (lang, term) keys, doc frequency from distinct (row, term) keys mapped
    to their (lang, term).  Both unique passes emit the SAME sorted key
    set, so the two count vectors align positionally."""
    import pandas as pd

    empty = pa.table({"lang": pa.array([], pa.string()),
                      "term": pa.array([], pa.string()),
                      "n_occ": pa.array([], pa.int64()),
                      "n_docs": pa.array([], pa.int64())})
    langs = batch.column(lang_col).to_pylist()
    flat, rows = _explode_tokens(batch.column(text_col).to_pylist())
    if len(flat) == 0:
        return empty
    # use_na_sentinel=False: a null lang gets its OWN code (and a null
    # output row, SQL GROUP BY NULL semantics) — the default -1 sentinel
    # would index lang_uniq[-1] through the packed key and silently merge
    # null-lang token counts into the last real language
    lang_codes, lang_uniq = pd.factorize(
        np.asarray(langs, dtype=object), use_na_sentinel=False)
    # factorize encodes the null as NaN in the uniques — normalize to None
    # so the Arrow string cast below accepts it (tiny: one entry per lang)
    lang_uniq = np.array([None if pd.isna(v) else v for v in lang_uniq],
                         dtype=object)
    d = pc.dictionary_encode(flat)
    tcodes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    terms = d.dictionary
    nterm = np.int64(len(terms))
    lt = lang_codes[rows].astype(np.int64) * nterm + tcodes
    occ_keys, n_occ = np.unique(lt, return_counts=True)
    rt = rows * nterm + tcodes
    urt = np.unique(rt)
    u_lt = lang_codes[urt // nterm].astype(np.int64) * nterm + (urt % nterm)
    df_keys, n_docs = np.unique(u_lt, return_counts=True)
    # same key SET (every occurring (lang, term) appears in >= 1 doc), both
    # sorted by np.unique -> positionally aligned
    return pa.table({
        "lang": pa.array(lang_uniq[occ_keys // nterm], pa.string()),
        "term": terms.take(pa.array(occ_keys % nterm, pa.int64())),
        "n_occ": pa.array(n_occ.astype(np.int64), pa.int64()),
        "n_docs": pa.array(n_docs.astype(np.int64), pa.int64()),
    })


def entropy_batch(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Per-document unigram token-entropy quality signal (low entropy ==
    repetitive / boilerplate text — the CCNet/Gopher-style document
    statistic used to filter LLM training corpora).

    Fully stateless scan: one row per document means the token histogram
    never leaves its own row, so NOTHING shuffles — the cheapest possible
    shape at 100 TB.  Tokenization is one C-level ``findall`` per row over
    the ONE corpus token class (``ops/index.py TERM_RE``, the cross-engine
    tokenizer contract shared with bigrams / TF-IDF / BM25); the per-(row,
    token) counts come from one factorize + ``np.unique`` on a packed int64
    key — no Python dict in the interior.

    Determinism / SQL parity: each term's contribution
    ``-(c/n) * log2(c/n)`` is quantized to integer MILLIBITS
    (``floor(x*1000 + 0.5)``) BEFORE the per-document sum, so the sum is an
    order-free exact int64 — DuckDB spells the identical double expression
    term-by-term and the driver hash compare is exact (the ``ops/lm.py``
    millibit discipline).  Documents with zero tokens emit no row on either
    engine.

    Output: ``(doc_id, n_tokens, n_distinct, entropy_mb)``.
    Reference analogue: none (the reference filters on raw length only,
    generation.py:24-30); this extends the SURVEY §2.8 quality family."""
    from itertools import chain

    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
        np.int64, copy=False)
    texts = batch.column(text_col).to_pylist()
    nrows = len(texts)
    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "n_distinct": pa.array([], pa.int64()),
        "entropy_mb": pa.array([], pa.int64()),
    })
    if nrows == 0:
        return empty
    tok_lists = [TERM_RE.findall(t.lower()) for t in texts]
    counts = np.fromiter((len(l) for l in tok_lists), dtype=np.int64,
                         count=nrows)
    total = int(counts.sum())
    if total == 0:
        return empty
    rows = np.repeat(np.arange(nrows, dtype=np.int64), counts)
    import pandas as pd

    codes, uniques = pd.factorize(
        np.asarray(list(chain.from_iterable(tok_lists)), dtype=object))
    packed = rows * np.int64(len(uniques)) + codes.astype(np.int64)
    ukey, c = np.unique(packed, return_counts=True)
    urow = ukey // np.int64(len(uniques))
    p = c.astype(np.float64) / counts[urow].astype(np.float64)
    mb = np.floor(-p * np.log2(p) * 1000.0 + 0.5).astype(np.int64)
    entropy = np.zeros(nrows, dtype=np.int64)
    np.add.at(entropy, urow, mb)
    ndist = np.bincount(urow, minlength=nrows).astype(np.int64)
    mask = counts > 0
    return pa.table({
        "doc_id": pa.array(ids[mask], pa.int64()),
        "n_tokens": pa.array(counts[mask], pa.int64()),
        "n_distinct": pa.array(ndist[mask], pa.int64()),
        "entropy_mb": pa.array(entropy[mask], pa.int64()),
    })


def regex_extract_batch(batch: pa.Table, pattern: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        first_alias: str = "first_match",
                        count_alias: str = "n_matches") -> pa.Table:
    """First regex match + non-overlapping match count per row — the
    structured-field extraction scan (IDs, codes, entities) of a curation
    pipeline, entirely in Arrow's RE2 kernels (zero Python per row).

    Cross-engine parity: DuckDB's regexp functions are also RE2, so
    ``regexp_extract(text, pat)`` / ``length(regexp_extract_all(...))``
    match bit-for-bit (no-match rows yield '' and 0 on both engines)."""
    col = batch.column(text_col)
    hit = pc.extract_regex(col, pattern=f"(?P<m>{pattern})")
    first = pc.fill_null(pc.struct_field(hit, "m"), "")
    n = pc.cast(pc.count_substring_regex(col, pattern=pattern), pa.int64())
    return pa.table({id_col: batch.column(id_col),
                     first_alias: first, count_alias: n})


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         alias: str = "norm") -> pa.Table:
    """Canonical text normalization: lowercase, collapse whitespace runs
    to one space, trim — entirely in Arrow kernels (utf8_lower +
    RE2 replace), zero Python per row.  SQL parity:
    ``trim(regexp_replace(lower(x), '\\s+', ' ', 'g'))`` (DuckDB is RE2
    too, so the collapse behaves identically)."""
    col = batch.column(text_col)
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(col),
                                   pattern=r"\s+", replacement=" "))
    return batch.append_column(alias, norm)


def chunk_overlap_batch(batch: pa.Table, size: int, stride: int,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Context-window sharding for LLM training: split each document into
    token windows of ``size`` tokens starting every ``stride`` tokens
    (``stride < size`` ⇒ overlapping windows; the tail window may be
    shorter).  Output one row per chunk: ``(doc_id, chunk_idx, n_tokens,
    chunk)`` where ``chunk`` is the space-joined token window.

    Semantics (SQL-reproducible): tokenize ``[a-z0-9]+`` on the lowercased
    text (the chunk_dedup convention, ``ops/dedup.py``); window starts are
    ``0, stride, 2·stride, …`` while ``start < n_tokens``; an empty doc
    emits no chunks.  DuckDB parity: ``regexp_extract_all(lower(text),
    '[a-z0-9]+')`` + ``generate_series(1, len(ts), stride)`` +
    ``array_to_string(ts[i:i+size-1], ' ')``.

    Execution shape: ONE stateless scan — tokenization is Arrow RE2
    (``split_pattern_regex``), the window arithmetic is numpy over the
    list offsets, and chunk strings are C-level slices of the per-doc
    normalized text at precomputed char offsets (tokens are ascii, so
    byte == codeunit).  No Python regex or join runs per chunk.  At 100 TB
    this is embarrassingly parallel; output size is input × (size/stride)
    overlap factor, which the streaming executor spills as it goes."""
    if stride <= 0 or size <= 0:
        raise ValueError("chunk_overlap requires size > 0 and stride > 0")
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    lists = pc.split_pattern_regex(
        pc.utf8_lower(batch.column(text_col)), "[^a-z0-9]+")
    la = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    flat = la.flatten()
    raw_off = la.offsets.to_numpy().astype(np.int64)
    tok_len = pc.binary_length(flat).to_numpy().astype(np.int64)
    keep = tok_len > 0  # splitting leaves '' at edges / between separators
    n_docs = batch.num_rows
    doc_of_tok = np.repeat(np.arange(n_docs), np.diff(raw_off))
    k_per_doc = np.bincount(doc_of_tok[keep], minlength=n_docs)

    # normalized per-doc text (kept tokens space-joined) via one Arrow join
    kept_off = np.zeros(n_docs + 1, np.int64)
    np.cumsum(k_per_doc, out=kept_off[1:])
    filt = pa.ListArray.from_arrays(pa.array(kept_off, pa.int32()),
                                    flat.filter(pa.array(keep)))
    norm = pc.binary_join(filt, " ").to_pylist()

    # char offset of kept token j inside its doc: cumsum of (len+1), reset
    # per doc by subtracting the doc's base
    klen = tok_len[keep]
    ends = np.cumsum(klen + 1)  # 1-past-token incl. trailing space, global
    starts_g = ends - (klen + 1)
    # per-doc windows: starts 0, stride, ... < k
    n_chunks = (k_per_doc + stride - 1) // stride
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "chunk_idx": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "chunk": pa.array([], pa.string())})
    doc_of_chunk = np.repeat(np.arange(n_docs), n_chunks)
    chunk_idx = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(n_chunks)[:-1]]), n_chunks)
    s_tok = chunk_idx * stride                       # window start (doc-rel)
    e_tok = np.minimum(s_tok + size, k_per_doc[doc_of_chunk])
    g0 = kept_off[doc_of_chunk]                      # doc's first kept token
    a = starts_g[g0 + s_tok] - starts_g[g0]
    b = ends[g0 + e_tok - 1] - 1 - starts_g[g0]      # drop trailing space
    out_ids = ids[doc_of_chunk]
    chunks = [norm[d][lo:hi]
              for d, lo, hi in zip(doc_of_chunk.tolist(),
                                   a.tolist(), b.tolist())]
    return pa.table({id_col: pa.array(out_ids, pa.int64()),
                     "chunk_idx": pa.array(chunk_idx, pa.int64()),
                     "n_tokens": pa.array(e_tok - s_tok, pa.int64()),
                     "chunk": pa.array(chunks, pa.string())})
