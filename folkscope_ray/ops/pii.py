"""PII detection / redaction over a text column.

The standard pre-training hygiene pass (the C4 / Dolma / RefinedWeb rule
family): find personally-identifying spans — email addresses, IP addresses,
phone numbers — count them per document, and replace each span with a typed
placeholder token so downstream stages never see the raw value.

Execution shape (100-TB contract):

- ONE stateless ``map_batches`` scan, no shuffle, no state: every pattern is
  applied with ``pyarrow.compute`` RE2 kernels (``count_substring_regex`` /
  ``replace_substring_regex``) that run in Arrow C++ over the whole column —
  no Python per row, no compiled-``re`` actor warm-up needed.
- Patterns are RE2 syntax by construction, which makes DuckDB (also RE2) an
  exact oracle: ``regexp_replace(text, p, tok, 'g')`` and
  ``len(regexp_extract_all(text, p))`` reproduce the outputs bit-for-bit.
- Redaction order is the dict order of ``patterns`` and is part of the
  contract (an IP inside an already-redacted email can't double-count).

The default patterns deliberately favor precision over recall (an
over-eager phone regex that eats ordinary integers corrupts the corpus);
swap in stricter/looser sets per deployment via the ``patterns`` argument.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# name -> (RE2 pattern, replacement token). Order matters: applied top-down.
DEFAULT_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
}


def pii_scrub(
    ds: Dataset,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
    out_col: str = "redacted",
    keep_cols: list[str] | None = None,
) -> Dataset:
    """Count and redact PII spans.

    Output: ``keep_cols`` (default: every input column except ``text_col``)
    + ``n_{name}`` int64 count per pattern + ``out_col`` (the redacted
    text) + ``n_pii`` (total spans redacted).
    """
    pats = DEFAULT_PATTERNS if patterns is None else patterns

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        keep = (keep_cols if keep_cols is not None
                else [c for c in batch.column_names if c != text_col])
        out = {c: batch.column(c) for c in keep}
        total = None
        for name, (pat, tok) in pats.items():
            n = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
            out[f"n_{name}"] = n
            total = n if total is None else pc.add(total, n)
            text = pc.replace_substring_regex(text, pat, tok)
        out["n_pii"] = (total if total is not None
                        else pa.array([0] * batch.num_rows, pa.int64()))
        out[out_col] = text
        return pa.table(out)

    return ds.map_batches(scrub, batch_format="pyarrow")
