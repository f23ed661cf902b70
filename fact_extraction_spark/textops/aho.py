"""Token-level Aho-Corasick automaton for batched mention detection.

The reference finds mention spans with a per-link NFA scan
(/root/reference/wikipedia_connector/tagged_sentence.py:17-64, TokenMatcher)
— O(sentence_tokens x links) per sentence, rebuilt per link. For
dictionary-scale detection (every page title + redirect alias, millions of
entries at Common-Crawl scale) we need one automaton over ALL aliases:
classic Aho-Corasick, but over token sequences instead of characters.

Built once per executor from the broadcast alias dictionary (see
operators/mentions.py), then each sentence is a single O(tokens + matches)
pass regardless of dictionary size.
"""

from __future__ import annotations

from collections import deque


class TokenAhoCorasick:
    """Aho-Corasick over token sequences.

    ``add(tokens, payload)`` registers one alias; ``build()`` computes
    failure links; ``find(tokens)`` yields ``(start, end_inclusive, payload)``
    for every dictionary hit in a single pass.
    """

    def __init__(self) -> None:
        # each node: dict token -> next state; parallel arrays for links
        self._next: list[dict[str, int]] = [{}]
        self._fail: list[int] = [0]
        self._out: list[list[tuple[int, object]]] = [[]]  # (length, payload)
        self._built = False

    def add(self, tokens: list[str], payload: object) -> None:
        assert not self._built, "add() after build()"
        if not tokens:
            return
        state = 0
        for tok in tokens:
            nxt = self._next[state].get(tok)
            if nxt is None:
                nxt = len(self._next)
                self._next.append({})
                self._fail.append(0)
                self._out.append([])
                self._next[state][tok] = nxt
            state = nxt
        self._out[state].append((len(tokens), payload))

    def build(self) -> "TokenAhoCorasick":
        # every match's first token is a root transition (aliases are added
        # from the root), so a sentence disjoint from this set cannot match
        # — scanners use one C-speed frozenset.isdisjoint as a fast path
        # instead of walking the automaton over filler text
        self.start_tokens = frozenset(self._next[0].keys())
        # pre-failure outputs: aliases whose FULL token path ends at each
        # state (find_at needs them — the failure-merged _out lists also
        # carry proper-suffix matches, which an anchored walk from a given
        # start position must not emit)
        self._out_raw = [list(o) for o in self._out]
        queue: deque[int] = deque()
        for state in self._next[0].values():
            self._fail[state] = 0
            queue.append(state)
        while queue:
            state = queue.popleft()
            for tok, child in self._next[state].items():
                queue.append(child)
                f = self._fail[state]
                while f and tok not in self._next[f]:
                    f = self._fail[f]
                self._fail[child] = self._next[f].get(tok, 0)
                if self._fail[child] == child:
                    self._fail[child] = 0
                self._out[child] = self._out[child] + self._out[self._fail[child]]
        self._built = True
        return self

    def find(self, tokens: list[str]):
        """Yield (start, end_inclusive, payload) for every match."""
        assert self._built, "find() before build()"
        state = 0
        for i, tok in enumerate(tokens):
            while state and tok not in self._next[state]:
                state = self._fail[state]
            state = self._next[state].get(tok, 0)
            for length, payload in self._out[state]:
                yield (i - length + 1, i, payload)

    def witness_tokens(self, pick) -> frozenset:
        """One WITNESS token per alias: the first token on the alias's
        goto-path satisfying ``pick`` (a selectivity predicate — e.g. "not
        a stopword"), falling back to the alias's first token when none
        does. A sentence containing a full alias occurrence contains every
        alias token, witness included — so the witness-set is a sentence-
        level NECESSARY condition for any match, and unlike
        ``start_tokens`` it survives stop-word-headed aliases ("The Grand
        City" contributes "Grand", not "The", so "The" in every English
        sentence no longer defeats the filler fast path). Classic prefix-
        filtering / rare-token pigeonholing from set-similarity joins."""
        assert self._built, "witness_tokens() before build()"
        out: set = set()
        stack = [(child, tok, tok if pick(tok) else None)
                 for tok, child in self._next[0].items()]
        while stack:
            state, first, wit = stack.pop()
            if self._out_raw[state]:
                out.add(wit if wit is not None else first)
            for tok, child in self._next[state].items():
                stack.append(
                    (child, first,
                     wit if wit is not None else (tok if pick(tok) else None)))
        return frozenset(out)

    def witness_tokens_rarest(self, pick) -> frozenset:
        """Like ``witness_tokens`` but choosing, per alias, the RAREST
        eligible token — minimal (dictionary-df, position) among tokens
        satisfying ``pick``, falling back to the alias's first token when
        none does. Dictionary df (how many aliases contain the token) is
        the free proxy for corpus frequency: vast alias families share
        their head token ("John …", "New …"), so the first-non-stopword
        pick floods the gate with exactly the tokens most likely to appear
        in arbitrary text, while each family's distinctive tail tokens are
        both dictionary-rare and corpus-rare. Any member token keeps the
        gate exact (necessary-condition argument of ``witness_tokens``);
        this pick only shrinks what the filler probe can match."""
        assert self._built, "witness_tokens_rarest() before build()"
        # pass 1: df per token = number of alias paths containing it
        df: dict[str, int] = {}
        stack = [(child, (tok,)) for tok, child in self._next[0].items()]
        while stack:
            state, path = stack.pop()
            if self._out_raw[state]:
                for t in set(path):
                    df[t] = df.get(t, 0) + len(self._out_raw[state])
            for tok, child in self._next[state].items():
                stack.append((child, path + (tok,)))
        # pass 2: per alias, min (df, position) among pick-eligible tokens
        out: set = set()
        stack = [(child, (tok,)) for tok, child in self._next[0].items()]
        while stack:
            state, path = stack.pop()
            if self._out_raw[state]:
                best = None
                for pos, t in enumerate(path):
                    if pick(t):
                        key = (df[t], pos)
                        if best is None or key < best[0]:
                            best = (key, t)
                out.add(best[1] if best is not None else path[0])
            for tok, child in self._next[state].items():
                stack.append((child, path + (tok,)))
        return frozenset(out)

    def find_at(self, tokens: list[str], starts) -> list[tuple]:
        """All matches STARTING at the given positions, as sorted
        (start, end_inclusive, payload) tuples.

        Anchored goto-walk from the root per start position — no failure
        links, pre-failure outputs only, so the result over
        ``starts = [i for i, t in enumerate(tokens) if t in start_tokens]``
        equals ``find(tokens)`` as a set (every match begins on a root
        transition). Scanners use this when they already know the few
        candidate positions (C-speed list.index over the skip-token
        intersection): cost is O(candidates × longest alias) instead of a
        Python step per sentence token."""
        assert self._built, "find_at() before build()"
        nxt, raw = self._next, self._out_raw
        n = len(tokens)
        out: list[tuple] = []
        for j in starts:
            state = 0
            for k in range(j, n):
                state = nxt[state].get(tokens[k])
                if state is None:
                    break
                for _length, payload in raw[state]:
                    out.append((j, k, payload))
        out.sort(key=lambda m: (m[0], m[1]))
        return out

    @classmethod
    def from_entries(cls, entries) -> "TokenAhoCorasick":
        """entries: iterable of (token_list, payload)."""
        ac = cls()
        for tokens, payload in entries:
            ac.add(list(tokens), payload)
        return ac.build()
