"""Frozen deterministic tokenizer.

Replaces the reference's per-call Stanford-tokenizer JVM subprocess
(``/root/reference/wikipedia_connector/tagged_sentence.py:13-14,77-78``) with
a pure-regex tokenizer. The exact token boundaries are *our* contract (the
reference's JVM boundary is the thing the Spark design removes); what matters
is that sentences and alias strings are tokenized by the same frozen rules so
mention spans line up.

Rules: a token is either
  * a word run (``\\w+``) optionally carrying an apostrophe suffix (``'s``),
  * or a single non-space, non-word character (punctuation).
"""

from __future__ import annotations

import re

_RX_TOKEN = re.compile(r"\w+(?:'\w+)?|[^\w\s]")


def tokenize(text: str) -> list[str]:
    """Deterministic tokenization; pure function of the input string."""
    return _RX_TOKEN.findall(text)
