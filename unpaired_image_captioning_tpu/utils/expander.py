"""English contraction expansion with ambiguity resolution.

Parity: reference `misc/expander/` (~1k LoC, yaml-driven rule tables +
named-entity tagging) used for caption post-processing in the pivot
pipeline. This implementation carries the full unambiguous contraction
table plus the context heuristics the reference's rules encode for the
ambiguous cases ('s possessive vs "is"/"has", 'd "would" vs "had"), without
the yaml/NE-model dependencies.
"""

from __future__ import annotations

import re
from typing import List

# unambiguous contractions (reference expander table coverage)
TABLE = {
    "aren't": "are not", "can't": "cannot", "couldn't": "could not",
    "didn't": "did not", "doesn't": "does not", "don't": "do not",
    "hadn't": "had not", "hasn't": "has not", "haven't": "have not",
    "isn't": "is not", "mightn't": "might not", "mustn't": "must not",
    "needn't": "need not", "shan't": "shall not", "shouldn't": "should not",
    "wasn't": "was not", "weren't": "were not", "won't": "will not",
    "wouldn't": "would not", "i'm": "i am", "you're": "you are",
    "we're": "we are", "they're": "they are", "i've": "i have",
    "you've": "you have", "we've": "we have", "they've": "they have",
    "i'll": "i will", "you'll": "you will", "he'll": "he will",
    "she'll": "she will", "we'll": "we will", "they'll": "they will",
    "it'll": "it will", "that'll": "that will", "let's": "let us",
    "y'all": "you all", "ma'am": "madam", "o'clock": "of the clock",
}

# 's resolution: "is" before gerunds/adjectives/articles, possessive before
# plain nouns (the reference resolves with POS/NE tags; these function-word
# cues cover the caption domain)
_IS_CUES = re.compile(
    r"^(a|an|the|not|very|really|quite|so|too|going|being|been|"
    r"\w+ing|\w+ed)$")
_HAS_CUES = re.compile(r"^(been|got|gotten|had|done|made|taken|seen)$")
_WOULD_CUES = re.compile(r"^(like|love|prefer|rather|be|have|want|go|do)$")

_PRONOUNS = {"he", "she", "it", "that", "this", "there", "what", "who",
             "where", "here", "one", "everything", "something", "nothing",
             "somebody", "someone", "everyone"}


def expand_sentence(text: str) -> str:
    toks = text.split()
    out: List[str] = []
    i = 0
    while i < len(toks):
        raw = toks[i]
        low = raw.lower()
        nxt = toks[i + 1].lower() if i + 1 < len(toks) else ""
        if low in TABLE:
            out.extend(TABLE[low].split())
        elif low.endswith("n't") and low[:-3]:
            out.extend([low[:-3], "not"])
        elif low.endswith("'s"):
            stem = low[:-2]
            if _HAS_CUES.match(nxt):
                out.extend([stem, "has"])
            elif stem in _PRONOUNS or _IS_CUES.match(nxt):
                out.extend([stem, "is"])
            else:
                out.append(raw)  # possessive: keep
        elif low.endswith("'d"):
            stem = low[:-2]
            if _WOULD_CUES.match(nxt):
                out.extend([stem, "would"])
            else:
                out.extend([stem, "had"])
        elif low.endswith("'re"):
            out.extend([low[:-3], "are"])
        elif low.endswith("'ve"):
            out.extend([low[:-3], "have"])
        elif low.endswith("'ll"):
            out.extend([low[:-3], "will"])
        elif low.endswith("'m"):
            out.extend([low[:-2], "am"])
        else:
            out.append(raw)
        i += 1
    return " ".join(out)
