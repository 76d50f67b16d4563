"""Library extraction surface: eventualities from free text.

The analogue of the reference's ``PatternMatchEventualityExtractor``
(src/pattern/extractor.py:320-507): a user-facing class that takes a pattern
set (mined or loaded from an artifact) and extracts normalized eventualities
from raw assertion text, without standing up the full Ray pipeline.  The same
object is what the distributed match stage holds per worker, so library and
pipeline behavior are identical by construction.

Usage::

    ex = EventualityExtractor(patterns)          # or .from_table(arrow_table)
    evs = ex.extract_from_text("usedFor", "they are both used for data caching")
    evs = ex.extract_from_parsed(rel, tokens, lemmas, pos_tags, deps)

Each eventuality is a dict with eid / words / pos_tags / deps /
skeleton_indices / pattern / frequency (see patterns.build_eventuality).
"""

from __future__ import annotations

from .patterns import Pattern, match_row
from .stages.mine import patterns_from_table
from .stages.parse import parse_assertion


class EventualityExtractor:
    def __init__(self, patterns: list[Pattern]):
        self.patterns = sorted(patterns, key=Pattern.priority)
        self.by_rel: dict[str, list[Pattern]] = {}
        for p in self.patterns:
            self.by_rel.setdefault(p.rel, []).append(p)

    @classmethod
    def from_table(cls, tbl) -> "EventualityExtractor":
        """Load from the pattern artifact table written by the mining stage."""
        return cls(patterns_from_table(tbl))

    def extract_from_parsed(self, rel, tokens, lemmas, pos_tags, deps) -> list[dict]:
        """Match all patterns of ``rel`` against one parsed sentence; dedups
        by eid within the sentence (pattern_match.py:152-160 semantics)."""
        pats = self.by_rel.get(rel)
        if not pats:
            return []
        return match_row(pats, rel, tokens, lemmas, pos_tags, deps)

    def extract_from_text(self, rel: str, text: str) -> list[dict]:
        """Parse (template-anchored) then extract; returns [] when the text
        does not start with the relation's template anchor."""
        parsed = parse_assertion(rel, text)
        if parsed is None:
            return []
        tokens, lemmas, pos, deps = parsed
        return self.extract_from_parsed(rel, tokens, lemmas, pos, deps)

    def extract_any(self, text: str) -> list[dict]:
        """Try every registered relation's template against the text —
        the free-text entry point for callers that don't know the relation."""
        out = []
        for rel in self.by_rel:
            out.extend(self.extract_from_text(rel, text))
        return out
