"""Fast word splitter for the full-text engine.

Semantic equivalent of the reference's UTF-8 splitter
(cpp_src/core/ft/ft_fast/splitter.cc, tools/stringstools.cc word split with
`kDefaultExtraWordsSymbols = "-/+_`'"`): a word is a run of unicode
letters/digits plus the configured extra symbols; tokens are lower-cased.
Regex-based so the split rides C speed on host; the C++ native splitter
(csrc/) replaces this on the hot build path when available.
"""
from __future__ import annotations

import functools
import re
from typing import Iterable, Iterator


@functools.lru_cache(maxsize=32)
def _word_re(extra_symbols: str) -> "re.Pattern[str]":
    extra = re.escape(extra_symbols)
    # a word starts/ends with \w (letter/digit) but may contain extra symbols
    # inside — mirrors the reference splitter which strips leading/trailing
    # delimiters (stringstools.cc word boundaries)
    return re.compile(rf"[^\W_](?:[\w{extra}]*[^\W_])?", re.UNICODE)


def tokenize(text: str, extra_symbols: str = "-/+_`'") -> list[str]:
    """Split text into lower-cased word tokens."""
    if not text:
        return []
    return _word_re(extra_symbols).findall(text.lower())


def tokenize_with_offsets(text: str, extra_symbols: str = "-/+_`'",
                          ) -> Iterator[tuple[str, int, int]]:
    """Yield (token, char_start, char_end) — used by highlight/snippet
    (reference: areas in ft/areaholder.h)."""
    if not text:
        return
    for m in _word_re(extra_symbols).finditer(text.lower()):
        yield m.group(0), m.start(), m.end()


def is_number(tok: str) -> bool:
    return tok.isdigit()
