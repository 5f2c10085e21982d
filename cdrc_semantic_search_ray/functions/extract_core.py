"""Deterministic extraction core: sentence split, mention detection, SVO triples.

This module is PURE (no Ray, no I/O) and is shared by BOTH the distributed
actor stages (``stages/annotate.py``) and the sequential golden oracle
(``golden.py``). The golden/distributed comparison therefore verifies the
distribution machinery (shuffles, grouping, per-conversation ordering,
linking, canonicalization) — the extraction semantics themselves are verified
independently against the generator's intended triples
(tests/test_golden.py).

Semantics (rule-based stand-in for the reference's model stages — the
sentence splitter at /root/reference/src/datastore.py:112-115 and the
retrieval relevance core at /root/reference/src/model.py:73-91; see
SURVEY.md C1/C2/P4/P5):

1. A turn's text splits into sentences on ``(?<=[.!?])\\s+``.
2. Mentions: leftmost-longest, non-overlapping, case-insensitive matches of a
   closed surface lexicon (gazetteer) with word boundaries. At production
   scale this regex alternation becomes an Aho-Corasick automaton / spaCy NER
   actor — same operator shape (documented seam, SURVEY.md §7.4).
3. Predicates: leftmost-longest case-insensitive matches of the closed
   predicate vocabulary (vocab.PREDICATES).
4. For each predicate occurrence within a sentence: subj = nearest mention
   ending at/before the predicate start; obj = nearest mention starting
   at/after the predicate end (same sentence). If the sentence begins with the
   coref pronoun ("It") and no subject mention precedes the predicate, the
   subject resolves to the subject of the most recent emitted triple earlier
   in the SAME conversation (turn order, then in-sentence order) — this is
   why conversation reassembly must precede extraction.
5. A successful emission updates the carried subject.

Everything is deterministic and independent of batch/partition boundaries:
the only carried state is per-conversation, and conversations are processed
as complete, turn-ordered groups.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..vocab import COREF_PRONOUN, PREDICATES

SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")

_PRED_SORTED = sorted(PREDICATES, key=lambda p: (-len(p), p))
PRED_RE = re.compile(
    r"\b(?:" + "|".join(re.escape(p) for p in _PRED_SORTED) + r")\b",
    re.IGNORECASE,
)
_COREF_RE = re.compile(r"^\s*" + re.escape(COREF_PRONOUN) + r"\b")


def normalize_surface(s: str) -> str:
    """Canonical mention key: casefold + whitespace collapse.

    NOTE: this normalizes the *mention copy* only; the per-turn ``text``
    column is never rewritten (text-equality invariant, BASELINE.json:15).
    """
    return " ".join(s.casefold().split())


@dataclass(frozen=True)
class Mention:
    surface: str
    norm: str
    start: int  # char offset within the turn's text
    end: int
    label: str  # entity kind from the lexicon


@dataclass(frozen=True)
class Triple:
    subj_norm: str
    pred: str
    obj_norm: str
    subj_surface: str  # "" when subject came from coref carry
    obj_surface: str


class MentionMatcher:
    """Gazetteer matcher: surface lexicon → compiled alternation.

    ``lexicon`` maps normalized surface form → entity kind (label). Built once
    per actor (stages) or once per run (golden); matching is leftmost-longest
    because alternatives are ordered longest-first and Python ``re`` picks the
    first alternative that matches at a position.
    """

    _WORD_RE = re.compile(r"\w+")

    def __init__(self, lexicon: dict[str, str]):
        if not lexicon:
            raise ValueError("empty lexicon")
        self.lexicon = dict(lexicon)
        surfaces = sorted(self.lexicon, key=lambda s: (-len(s), s))
        self.rx = re.compile(
            r"\b(?:" + "|".join(re.escape(s) for s in surfaces) + r")\b",
            re.IGNORECASE,
        )
        # span count per surface in TEXT terms: "tessera-ml" is one lexicon
        # token but two \w+ spans
        self.max_spans = max(
            len(self._WORD_RE.findall(s)) for s in self.lexicon)

    def find(self, text: str) -> list[Mention]:
        """Word-span n-gram dictionary scan.

        Equivalent to leftmost-longest non-overlapping matching of the
        ``\\b(alt|...)\\b`` alternation (see :meth:`find_regex`, the
        reference implementation kept for the parity test) but O(words ×
        max_spans) dict lookups instead of O(chars × alternatives): the
        alternation was 83% of extraction CPU at ~800 surfaces. The lookup
        key is the candidate's bare ``casefold()`` (NOT the
        whitespace-collapsing :func:`normalize_surface`): lexicon keys are
        already casefolded and single-spaced, so strict equality reproduces
        the regex's case-insensitive LITERAL match — "greta  dubois"
        (double space) must not match, hyphenated surfaces must. Matches
        start and end on word boundaries exactly as ``\\b`` requires.
        """
        spans = [(m.start(), m.end())
                 for m in self._WORD_RE.finditer(text)]
        lexicon = self.lexicon
        out: list[Mention] = []
        i, n_words = 0, len(spans)
        while i < n_words:
            matched = False
            for n in range(min(self.max_spans, n_words - i), 0, -1):
                start, end = spans[i][0], spans[i + n - 1][1]
                surface = text[start:end]
                key = surface.casefold()
                label = lexicon.get(key)
                if label is not None:
                    out.append(Mention(surface, key, start, end, label))
                    i += n
                    matched = True
                    break
            if not matched:
                i += 1
        return out

    def find_regex(self, text: str) -> list[Mention]:
        """Reference implementation (the compiled alternation)."""
        out: list[Mention] = []
        for m in self.rx.finditer(text):
            surface = m.group(0)
            norm = normalize_surface(surface)
            out.append(
                Mention(surface, norm, m.start(), m.end(), self.lexicon[norm])
            )
        return out


def split_sentences(text: str) -> list[tuple[int, str]]:
    """Return [(char_offset, sentence), ...] covering the text."""
    out = []
    pos = 0
    for part in SENT_SPLIT_RE.split(text):
        idx = text.index(part, pos)
        out.append((idx, part))
        pos = idx + len(part)
    return out


def extract_turn(
    text: str, matcher: MentionMatcher, carried_subj: str | None
) -> tuple[list[Mention], list[Triple], str | None]:
    """Extract mentions + triples from one turn.

    ``carried_subj`` is the per-conversation coref state (norm of the last
    emitted triple's subject); returns the updated value.
    """
    mentions = matcher.find(text)
    triples: list[Triple] = []
    for sent_off, sent in split_sentences(text):
        sent_end = sent_off + len(sent)
        sent_mentions = [m for m in mentions if m.start >= sent_off and m.end <= sent_end]
        is_coref = bool(_COREF_RE.match(sent))
        for pm in PRED_RE.finditer(sent):
            p_start, p_end = sent_off + pm.start(), sent_off + pm.end()
            pred = normalize_surface(pm.group(0))
            subj = None
            for m in sent_mentions:
                if m.end <= p_start and (subj is None or m.end > subj.end):
                    subj = m
            obj = None
            for m in sent_mentions:
                if m.start >= p_end and (obj is None or m.start < obj.start):
                    obj = m
            if obj is None:
                continue
            if subj is not None:
                triples.append(
                    Triple(subj.norm, pred, obj.norm, subj.surface, obj.surface)
                )
                carried_subj = subj.norm
            elif is_coref and carried_subj is not None:
                triples.append(Triple(carried_subj, pred, obj.norm, "", obj.surface))
                # carried subject stays the same
    return mentions, triples, carried_subj


def extract_conversation(
    turns: list[tuple[int, str]], matcher: MentionMatcher
) -> tuple[list[tuple[int, Mention]], list[tuple[int, Triple]]]:
    """Process one conversation's turns, ORDERED by turn_idx.

    ``turns`` = [(turn_idx, text), ...] already sorted ascending. Returns
    (mentions, triples) each tagged with their turn_idx.
    """
    carried: str | None = None
    all_mentions: list[tuple[int, Mention]] = []
    all_triples: list[tuple[int, Triple]] = []
    for turn_idx, text in turns:
        mentions, triples, carried = extract_turn(text, matcher, carried)
        all_mentions.extend((turn_idx, m) for m in mentions)
        all_triples.extend((turn_idx, t) for t in triples)
    return all_mentions, all_triples
