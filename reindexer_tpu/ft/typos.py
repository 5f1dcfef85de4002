"""Delete-based typo dictionary (symmetric-delete fuzzy matching).

Semantic equivalent of the reference typo engine (cpp_src/core/ft/typos.cc +
per-step typo maps in ft_fast/dataholder.h): the index side stores every
word's single-character-deletion forms; the query side generates the query
term's deletion forms and intersects. A hit through one deletion on either
side = 1 typo; through deletions on both sides = 2 typos — bounded by
FTConfig::maxTypos (MaxTyposInWord deletions per word, ftconfig.h:219) and
maxTypoLen (typo search skipped for longer terms).
"""
from __future__ import annotations

from typing import Iterable


def deletions(word: str, max_deletes: int = 1) -> set[str]:
    """All forms of `word` with up to `max_deletes` single-char deletions
    (excluding the word itself)."""
    forms = {word}
    frontier = {word}
    for _ in range(max_deletes):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1:])
        frontier = nxt - forms
        forms |= nxt
    forms.discard(word)
    return forms


class TypoDict:
    """deletion-form -> word ids map built at FT commit."""

    def __init__(self, max_typos: int = 2, max_typo_len: int = 15,
                 min_word_len: int = 3, max_candidates: int = 64):
        # deletions per word on the index side (reference MaxTyposInWord)
        self.index_deletes = (max_typos // 2) + (max_typos % 2)
        self.max_typos = max_typos
        self.max_typo_len = max_typo_len
        self.min_word_len = min_word_len
        self.max_candidates = max_candidates
        self.map: dict[str, list[int]] = {}

    def add_word(self, word: str, word_id: int) -> None:
        if not (self.min_word_len <= len(word) <= self.max_typo_len):
            return
        for form in deletions(word, self.index_deletes):
            lst = self.map.setdefault(form, [])
            if len(lst) < self.max_candidates:
                lst.append(word_id)

    def candidates(self, term: str, vocab_get, word_of_id) -> dict[int, int]:
        """word_id -> typo count for words within maxTypos of `term`.

        vocab_get(form) -> word_id|None resolves exact dictionary words;
        word_of_id(word_id) -> str for verification.
        """
        if not (self.min_word_len <= len(term) <= self.max_typo_len):
            return {}
        out: dict[int, int] = {}
        term_forms = deletions(term, self.index_deletes)
        # query deletion == indexed word  (missing letter in doc word: 1 typo)
        for form in term_forms:
            wid = vocab_get(form)
            if wid is not None:
                out.setdefault(wid, 1)
        # query term == indexed word's deletion (extra letter in doc: 1 typo)
        for wid in self.map.get(term, ()):
            out.setdefault(wid, 1)
        # deletion == deletion (substitution/transposition: counts as 2 typos
        # unless it is actually 1 edit — verify with edit distance)
        if self.max_typos >= 2:
            for form in term_forms:
                for wid in self.map.get(form, ()):
                    if wid in out:
                        continue
                    w = word_of_id(wid)
                    d = _damerau_bounded(term, w, 2)
                    if d is not None and d <= self.max_typos:
                        out[wid] = d
        return out


def _damerau_bounded(a: str, b: str, bound: int) -> int | None:
    """Damerau-Levenshtein distance, early-exit when > bound."""
    if abs(len(a) - len(b)) > bound:
        return None
    prev2: list[int] = []
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        row_min = cur[0]
        for j in range(1, len(b) + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
            row_min = min(row_min, cur[j])
        if row_min > bound:
            return None
        prev2, prev = prev, cur
    return prev[len(b)] if prev[len(b)] <= bound else None
