"""Stage-1 frozen text extraction: raw wikitext/pseudo-HTML → clean article text.

Reimplements (from scratch, in Python 3) the observable behavior of the
reference extractor pipeline:

* wikitext → pseudo-HTML cascade: semantics of
  ``/root/reference/wikipedia_connector/wikipedia_dump_extractor.py:49-125``
  (``_strip_outer_brackets`` + ``_make_wikipedia_text_to_html``) — an
  order-sensitive regex cascade; the ordering below is part of the contract.
* paragraph / sentence / anchor extraction: semantics of
  ``/root/reference/wikipedia_connector/tagged_sentence.py:130-158`` but over
  the engine's own pseudo-HTML (regexes instead of BeautifulSoup — our
  paragraphs are flat ``<p>…</p>`` blocks with ``<a href>`` anchors only).
* input sanitation: semantics of ``tagged_sentence.py:200-219``
  (``__clean_input``), normalized to Python 3 str.

Everything here is a pure function of its argument — no config, no I/O, no
randomness — so outputs are byte-identical per url under any partitioning.
"""

from __future__ import annotations

import re

# --------------------------------------------------------------------------
# wikitext → pseudo-HTML cascade (order matters; each step mirrors one rule
# of wikipedia_dump_extractor.py:72-125)
# --------------------------------------------------------------------------

# NOTE: the reference spells "any char incl. newline" as (.|\n); we use the
# equivalent [\s\S] char class — identical match semantics, but a class is a
# single NFA step where the captured alternation re-enters the engine per
# character (measured 2x on the paragraph rule for 40 KB pages).
_RX_COMMENT = re.compile(r"<!--[\s\S]*?-->")
_RX_FURTHER_READING_TAIL = re.compile(r"== *Further reading *==[\s\S]*")
_RX_REFERENCES_TAIL = re.compile(r"== *References *==[\s\S]*")
_RX_HEADLINE = re.compile(r"^(=+).+?(\1)", re.MULTILINE)
_RX_REF_SELFCLOSE = re.compile(r"<(r|R)ef(( |\n)[^>]*?)?\/>")
_RX_REF_PAIR = re.compile(r"<(r|R)ef(( |\n)[^>]*?[^\/])?>[\s\S]*?<\/(r|R)ef>")

# bracket-nesting vocabulary for File/Image/external-link removal
_NO_BRACKET = r"[^\[\]]"
_NO_BRACKETS = _NO_BRACKET + r"*"
_ONE_LEVEL = (
    r"(((\[" + _NO_BRACKETS + r"\])|(\[\[" + _NO_BRACKETS + r"\]\]))" + _NO_BRACKETS + r")"
)
_EMBEDDED = _NO_BRACKETS + _ONE_LEVEL + r"*" + _NO_BRACKETS
_RX_FILE_IMAGE = re.compile(r"\[\[((File)|(Image)):" + _EMBEDDED + r"\]\]")
_RX_EXTERNAL = re.compile(r"\[https?:\/\/" + _NO_BRACKET + _EMBEDDED + r"\]")
_RX_CATEGORY = re.compile(r"\[\[Category:" + _NO_BRACKETS + r"\]\]")
_RX_BULLET = re.compile(r"\* ?")
_RX_EMPHASIS = re.compile(r"'{2,3}")
# first "." is deliberately newline-excluding (a block must start with a
# non-newline char); the body uses [\s\S] for the same reason as above.
_RX_PARAGRAPH = re.compile(r"((.[\s\S]+?)\n\n)")
_RX_WIKILINK = re.compile(r"\[\[([^\|\]]*)\|?(.*?)\]\]")
_RX_SQUARE_RESIDUE = re.compile(r"\[(.*?)\]")
_RX_EMPTY_P = re.compile(r"<p>[ \n]*<\/p>")
_RX_P_GAP = re.compile(r"<\/p>\n*<p>")


_RX_BRACE_SPLIT = re.compile(r"([{}])")


def _drop_brace_blocks(text: str) -> str:
    """Remove ``{…}`` blocks (nesting-aware single pass).

    Unmatched ``}`` at depth 0 is kept verbatim; everything after an
    unmatched ``{`` is dropped — same observable behavior as the
    reference's character scan (``wikipedia_dump_extractor.py:49-61``),
    but walking brace-delimited *segments* (C-speed regex split) instead
    of characters, so cost scales with the brace count, not the page
    length. Brace-free pages (the common web-text case) return in O(1)
    after the containment check.
    """
    if "{" not in text:
        return text
    parts = _RX_BRACE_SPLIT.split(text)
    out: list[str] = []
    depth = 0
    # re.split with one capture group alternates text (even indices) and
    # single-brace separators (odd indices) deterministically.
    for i, part in enumerate(parts):
        if i & 1:
            if part == "{":
                depth += 1
            elif depth > 0:
                depth -= 1
            else:
                out.append(part)
        elif depth == 0:
            out.append(part)
    return "".join(out)


def _anchor_for_wikilink(m: re.Match) -> str:
    target, label = m.group(1), m.group(2)
    if label == "":
        label = target
    target = target.replace(" ", "_")
    return '<a href="/wiki/' + target + '">' + label + "</a>"


def wikitext_to_html(text: str) -> str:
    """The full stage-1 cascade. Order of operations is the contract."""
    t = _drop_brace_blocks(text)
    t = _RX_COMMENT.sub("", t)
    t = _RX_FURTHER_READING_TAIL.sub("", t)
    t = _RX_REFERENCES_TAIL.sub("", t)
    t = _RX_HEADLINE.sub("\n", t)
    t = _RX_REF_SELFCLOSE.sub("", t)
    t = _RX_REF_PAIR.sub("", t)
    t = _RX_FILE_IMAGE.sub("", t)
    t = _RX_EXTERNAL.sub("", t)
    t = _RX_CATEGORY.sub("", t)
    t = _RX_BULLET.sub("", t)
    t = _RX_EMPHASIS.sub("", t)
    # paragraphize: blocks terminated by a blank line become <p>…</p>; a
    # trailing block with no blank-line terminator stays bare (and is then
    # invisible to paragraph extraction) — reference behavior.
    t = _RX_PARAGRAPH.sub(r"<p>\2</p>", t)
    t = _RX_WIKILINK.sub(_anchor_for_wikilink, t)
    t = _RX_SQUARE_RESIDUE.sub(r"\1", t)
    t = _RX_EMPTY_P.sub("", t)
    t = _RX_P_GAP.sub("</p>\n\n<p>", t)
    return t


def extract_article_text(raw: str) -> str:
    """Stage-1 entry point: raw page source → clean pseudo-HTML article text.

    This is the function whose output populates the ``text`` column and whose
    byte-identity per url the test suite asserts.
    """
    return wikitext_to_html(raw)


def is_markup_consistent(text: str) -> bool:
    """Bracket/brace balance check (``wikipedia_dump_extractor.py:127-133``)."""
    return text.count("[") == text.count("]") and text.count("{") == text.count("}")


# --------------------------------------------------------------------------
# stage 1b: pseudo-HTML → paragraphs → sentences (+ anchors)
# --------------------------------------------------------------------------

_RX_P_BLOCK = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_RX_ANCHOR = re.compile(r'<a href="([^"]*)"[^>]*>(.*?)</a>', re.DOTALL)
_RX_TAG = re.compile(r"<[^>]+>")
_RX_SENT_SPLIT = re.compile(r"(?<=[.!?]) +")


def extract_paragraphs(html_text: str) -> list[str]:
    """All ``<p>…</p>`` blocks, inner markup intact."""
    return _RX_P_BLOCK.findall(html_text)


def paragraph_anchors(paragraph: str) -> list[tuple[str, str]]:
    """``(href, anchor_text)`` pairs in document order. The substring guard
    is exact (the anchor regex requires a literal ``<a``) and turns the
    anchor-free-filler majority case into one C memchr instead of a regex
    scan."""
    if "<a" not in paragraph:
        return []
    return [(m.group(1), _RX_TAG.sub("", m.group(2))) for m in _RX_ANCHOR.finditer(paragraph)]


def paragraph_text(paragraph: str) -> str:
    """Tag-stripped text of one paragraph (bs4 ``get_text()`` analogue).
    Exact substring guard: no ``<`` ⟹ no tag to strip."""
    if "<" not in paragraph:
        return paragraph
    return _RX_TAG.sub("", paragraph)


def split_paragraph_sentences(paragraph_plain: str) -> list[str]:
    """Line split then sentence split on ``. ! ?`` + space, keeping marks.

    Mirrors ``tagged_sentence.py:150-155``.
    """
    return [
        sentence
        for line in paragraph_plain.split("\n")
        for sentence in _RX_SENT_SPLIT.split(line)
    ]


_RX_NEWLINES = re.compile(r"\n+")
_RX_SPACES = re.compile(r" +")
_RX_NON_ASCII = re.compile(r"[^\x00-\x7f]")
_RX_FOOTNOTE = re.compile(r"\[\d+\]")


def normalize_sentence(sentence: str) -> str:
    """Sanitize one sentence (semantics of ``tagged_sentence.py:200-219``):

    collapse newlines/spaces, strip non-ASCII, drop ``[n]`` footnotes, drop
    1-char tokens except ``a``/``A``/``I``.
    """
    s = _RX_NEWLINES.sub(" ", sentence)
    s = _RX_SPACES.sub(" ", s)
    s = _RX_NON_ASCII.sub("", s)
    s = _RX_FOOTNOTE.sub("", s)
    kept = [w for w in s.split(" ") if len(w) > 1 or w.lower() == "a" or w == "I"]
    return " ".join(kept)


def tokens_of_normalized(raw: str) -> list[str]:
    """Exactly ``tokenize(normalize_sentence(raw))`` without materializing
    the normalized string — the per-sentence hot path of the dictionary
    scan (2× measured: skips the newline/space regexes, the joined-string
    rebuild and the second full-string token scan; the two DELETION subs
    run only when the cheap isascii/bracket checks say they could fire).
    Token-space equivalence holds because the token regex never crosses
    whitespace and normalize's space transforms only insert/collapse
    separators. The word split is on newline+space EXACTLY (not all
    whitespace): normalize leaves tabs inside words, where they count
    toward the 1-char-drop length rule. Property-pinned by
    test_tokens_of_normalized_is_exact."""
    from fact_extraction_spark.textops.tokenizer import _RX_TOKEN
    if not raw.isascii():
        raw = _RX_NON_ASCII.sub("", raw)
    if "[" in raw:
        raw = _RX_FOOTNOTE.sub("", raw)
    out: list[str] = []
    findall = _RX_TOKEN.findall
    for seg in raw.split("\n"):
        for w in seg.split(" "):
            if len(w) > 1 or w.lower() == "a" or w == "I":
                out.extend(findall(w))
    return out


def count_split_sentences(plain: str) -> int:
    """``len(split_paragraph_sentences(plain))`` without building the list.

    The line split contributes ``plain.count("\\n") + 1`` segments and every
    sentence-separator match adds one more. A separator match is exactly a
    position ``p`` with ``s[p] in ".!?"`` and ``s[p+1] == " "`` (the char
    before a space run's first space is non-space, so the run starts at
    ``p+1`` and the lookbehind sees ``s[p]``), so the match count is the
    sum of three C-memchr substring counts — no regex pass at all. Counting
    over the WHOLE paragraph equals summing per line: a separator never
    contains or crosses ``\\n``, and at a line start the preceding char is
    ``\\n`` in the paragraph vs nothing in the line — neither satisfies the
    lookbehind. Property-pinned by
    test_count_split_sentences_matches_split. This is what lets the
    dictionary scan skip a gate-missed paragraph while keeping the global
    enumerate-derived sentence ids byte-identical (operators/mentions.py
    paragraph fast path)."""
    return (plain.count(". ") + plain.count("! ") + plain.count("? ")
            + plain.count("\n") + 1)


def iter_raw_sentences(html_text: str,
                       include_unanchored: bool = False,
                       skip_paragraph=None):
    """Generator twin of ``enumerate(extract_sentences(html_text,
    include_unanchored, normalize=False))``: yields
    ``(sent_id, rel_pos, raw_sentence, anchors)`` with IDENTICAL sent_id
    assignment (property-pinned by test_iter_raw_sentences_matches_extract).

    ``skip_paragraph(plain) -> bool`` must be a CONSERVATIVE predicate over
    paragraph text (the witness-gate probe: a miss proves no sentence can
    produce a dictionary hit). It is consulted for ANCHOR-FREE paragraphs
    only (in unanchored mode; anchored mode drops them before the call,
    exactly like extract_sentences). Consecutive anchor-free paragraphs
    are probed as ONE ``"\\n"``-joined block first — the separator is never
    deleted by the probe-text transforms and the sentence splits commute
    with it, so a block miss proves every member paragraph inert and one
    C-speed scan skips the whole run (the boilerplate-run shape of real
    web pages); a block hit falls back to per-paragraph probing. Skipped
    sentences still consume ids via ``count_split_sentences`` (whose
    block count equals the per-paragraph sum by the same separator
    argument), so the ids of every yielded row match the no-skip
    enumeration exactly."""
    paragraphs = extract_paragraphs(html_text)
    n = len(paragraphs)
    sent_id = 0
    i = 0
    while i < n:
        para = paragraphs[i]
        anchors = paragraph_anchors(para)
        if not anchors:
            if not include_unanchored:
                i += 1
                continue
            if skip_paragraph is not None:
                # batch the run of consecutive anchor-free paragraphs
                plains = [paragraph_text(para)]
                j = i + 1
                while j < n and not paragraph_anchors(paragraphs[j]):
                    plains.append(paragraph_text(paragraphs[j]))
                    j += 1
                block = plains[0] if j == i + 1 else "\n".join(plains)
                if skip_paragraph(block):
                    sent_id += count_split_sentences(block)
                    i = j
                    continue
                for k, plain in enumerate(plains):
                    if len(plains) > 1 and skip_paragraph(plain):
                        sent_id += count_split_sentences(plain)
                        continue
                    rel_pos = (i + k) / n
                    for sent in split_paragraph_sentences(plain):
                        yield sent_id, rel_pos, sent, anchors
                        sent_id += 1
                i = j
                continue
        plain = paragraph_text(para)
        rel_pos = i / n
        for sent in split_paragraph_sentences(plain):
            if include_unanchored or any(text in sent for _, text in anchors):
                yield sent_id, rel_pos, sent, anchors
                sent_id += 1
        i += 1



def extract_sentences(html_text: str,
                      include_unanchored: bool = False,
                      normalize: bool = True) -> list[dict]:
    """Full stage-1b: article pseudo-HTML → sentence rows.

    Returns dicts ``{paragraph_idx, rel_pos, sentence, anchors}`` where
    ``rel_pos = paragraph_idx / paragraph_count`` (zero-based, as in
    ``tagged_sentence.py:138-139``) and ``anchors`` is the paragraph's
    ``(href, text)`` list. By default only sentences that contain at least
    one anchor text verbatim are kept (``tagged_sentence.py:156,167-173`` —
    the reference-parity keeps-a-link filter). ``include_unanchored=True``
    keeps every sentence (anchors possibly empty) — Common-Crawl-style
    pages carry no wiki anchors at all, and dictionary-mode detection
    (pipeline cfg ``dictionary_scan_unanchored``) must be able to scan
    them.

    ``normalize=False`` returns the RAW split sentence instead of
    ``normalize_sentence(sent)`` — for scanners that decide per sentence
    whether the row is worth normalizing at all (the dictionary scan's
    filler fast path, operators/mentions.py) and call
    ``normalize_sentence`` themselves on survivors. Row order, count and
    every other field are identical either way, so enumerate-derived
    sentence ids stay stable across the two modes.
    """
    paragraphs = extract_paragraphs(html_text)
    n = len(paragraphs)
    rows: list[dict] = []
    for i, para in enumerate(paragraphs):
        anchors = paragraph_anchors(para)
        if not anchors and not include_unanchored:
            continue
        plain = paragraph_text(para)
        for sent in split_paragraph_sentences(plain):
            if include_unanchored or any(text in sent for _, text in anchors):
                rows.append(
                    {
                        "paragraph_idx": i,
                        "rel_pos": i / n,
                        "sentence": (normalize_sentence(sent) if normalize
                                     else sent),
                        "anchors": anchors,
                    }
                )
    return rows
