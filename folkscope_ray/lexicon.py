"""Closed-world lexicon: object-phrase construction, POS tagging, lemmas.

The mock generator (stages/generate.py) emits assertions whose suffix ("object
phrase") is drawn deterministically from this vocabulary, and the deterministic
parser (stages/parse.py) tags exactly the same vocabulary — replacing the
reference's CoreNLP server (src/pattern/utils.py:217-299) with a closed-world
rule tagger.  The I/O contracts are identical to the reference stages, so a
real LLM generator + real parser can drop in without touching the pipeline.
"""

from __future__ import annotations

from .relations import REL_INDEX, Relation
from .synth import ACT, ADJ, NOUN, VERB
from .util import stable_u64

# POS tags for object-phrase words.  "both" etc. (template words) are tagged by
# the relation's template_pos, never by this lexicon.
_ADJ_SET = frozenset(ADJ)
_VERB_SET = frozenset(VERB)
_NOUN_SET = frozenset(NOUN) | frozenset(ACT)
_NNS_SET = frozenset(n + "s" for n in NOUN)

# Small irregular lemma map for template words (analogue of CoreNLP lemmas).
TEMPLATE_LEMMAS = {
    "are": "be", "was": "be", "is": "be",
    "made": "make", "used": "use", "created": "create", "defined": "define",
    "derived": "derive", "motivated": "motivate", "wants": "want",
    "buying": "buy", "has": "have", "have": "have", "symbols": "symbol",
    "them": "they", "his": "he",
}


def tag_obj_word(word: str, position: int, obj_kind: str) -> str:
    if obj_kind == "verbal" and position == 0:
        return "VB"
    if word in _ADJ_SET:
        return "JJ"
    if word in _NNS_SET:
        return "NNS"
    return "NN"


NER_TYPE_POOL = ("ORGANIZATION", "PERSON", "LOCATION", "CITY", "COUNTRY")


def ner_of(word: str, pos: str) -> str:
    """Closed-world NER: a deterministic ~20% of the noun vocabulary carries
    an entity type — the stand-in for CoreNLP's per-token ner annotations
    (src/pattern/utils.py:292-299); everything else is "O".  A real NER
    tagger drops in by replacing this function."""
    if not pos.startswith("NN"):
        return "O"
    base = word[:-1] if pos == "NNS" and word.endswith("s") else word.lower()
    h = stable_u64("ner", base)
    if h % 5:
        return "O"
    return NER_TYPE_POOL[(h >> 8) % len(NER_TYPE_POOL)]


def lemma_of(word: str, pos: str) -> str:
    w = word.lower()
    if w in TEMPLATE_LEMMAS:
        return TEMPLATE_LEMMAS[w]
    if pos == "NNS" and w.endswith("s"):
        return w[:-1]
    return w


# ------------------------------------------------------------- phrase pools

def obj_phrase(rel: str, surf_a: str, surf_b: str, gen_idx: int) -> list[str]:
    """The deterministic completion the mock LM produces for one sample.

    Keyed on the *surface* pair + relation + sample index (the reference keys
    generations on md5("{a}-{b}-{rel}"), src/generator/utils.py:42-49, and
    samples num_return_sequences=3, src/generator/generation.py:108).
    """
    h = stable_u64("gen", rel, surf_a, surf_b, gen_idx)
    r = REL_INDEX[rel]
    adj = ADJ[h % len(ADJ)]
    act = ACT[(h >> 8) % len(ACT)]
    noun = NOUN[(h >> 16) % len(NOUN)]
    nns = NOUN[(h >> 24) % len(NOUN)] + "s"
    if r.obj_kind == "verbal":
        verb = VERB[(h >> 32) % len(VERB)]
        shape = (h >> 40) % 3
        if shape == 0:
            return [verb, nns]
        if shape == 1:
            return [verb, adj, nns]
        return [verb, noun, act]
    shape = (h >> 40) % 5
    if shape == 0:
        return [noun, act]
    if shape == 1:
        return [adj, act]
    if shape == 2:
        return [adj, noun, act]
    if shape == 3:
        return [nns]
    return [adj, nns]


def assertion_text(rel: str, surf_a: str, surf_b: str, gen_idx: int) -> str:
    """Template anchor + object phrase — the post-prefix slice of a generation
    (the reference cuts generations at the template prefix,
    src/pattern/generation_parser.py:128-138; we emit the slice directly)."""
    r: Relation = REL_INDEX[rel]
    phrase = obj_phrase(rel, surf_a, surf_b, gen_idx)
    if r.rel == "open":
        return " ".join(phrase)
    return " ".join(list(r.tokens) + phrase)
