"""Deterministic single-core micro-bench of the dictionary scan inner loop:
round-6 per-SENTENCE probing vs round-7 per-PARAGRAPH gate skipping.

No Spark — this times exactly the Python that runs inside the scan UDF
(extract_sentences/iter_raw_sentences + probe + tokens_of_normalized +
_scan_tokens) over fat fixture pages (16 KiB of deterministic filler per
page, inert = boilerplate shape / dense = subject-naming body prose), with
the dictionary built from the same fixture corpus the Spark benches use.
Outputs MB/s per variant and asserts the kept (sent_id, hits) rows are
IDENTICAL — the row-identity contract of the fast path, re-proven at
measurement scale. Measurement tooling only (not imported by the engine).
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fact_extraction_spark.fixtures import (  # noqa: E402
    _FIRST_NAMES, _LAST_SUFFIX, _TEMPLATES, _mkname, _person_wikitext,
    _wikilink, generate_corpus)
from fact_extraction_spark.operators.mentions import (  # noqa: E402
    _gate_probe, _make_paragraph_skip, _probe_text, _scan_gate_set,
    _scan_skip_set, _scan_tokens)
from fact_extraction_spark.textops.aho import TokenAhoCorasick  # noqa: E402
from fact_extraction_spark.textops.tokenizer import tokenize  # noqa: E402
from fact_extraction_spark.textops.wikitext import (  # noqa: E402
    extract_article_text, extract_sentences, iter_raw_sentences,
    tokens_of_normalized)

SEED = 42
N_PAGES = int(os.environ.get("MICRO_PAGES", "120"))
FAT_KB = int(os.environ.get("MICRO_FAT_KB", "16"))
REPEATS = int(os.environ.get("MICRO_REPEATS", "3"))


def build_dictionary():
    """(alias, entity) pairs from the fixture corpus — same construction as
    build_alias_table, in plain Python."""
    fx = generate_corpus(seed=SEED, n_persons=120)
    pairs = {}
    for p in fx.pages:
        title = p["url"].split("/")[-1]
        pairs.setdefault(title.replace("_", " "),
                         title[:1].upper() + title[1:])
    for r in fx.redirects:
        pairs.setdefault(r["alias"].replace("_", " "),
                         r["target"][:1].upper() + r["target"][1:])
    return sorted(pairs.items())


def build_pages(inert: bool) -> list[str]:
    pages = []
    for idx in range(N_PAGES):
        rng = random.Random(f"{SEED}:{idx}")
        person = (f"{_FIRST_NAMES[idx % len(_FIRST_NAMES)]}_"
                  f"{_mkname(rng, 2)}{rng.choice(_LAST_SUFFIX)}_{idx}")
        first = person.split("_")[0]
        sentences = [
            tmpl.format(first=first, obj=_wikilink("Grandmere City"))
            for tmpl in (_TEMPLATES["birthPlace"][0],
                         _TEMPLATES["employer"][0])]
        pages.append(_person_wikitext(rng, first, sentences,
                                      fat_kb=FAT_KB, fat_inert=inert))
    return pages


def scan_sentence_level(texts, ac, gate, skip, probe0):
    """The round-6 inner loop: per-sentence probe over
    extract_sentences(normalize=False)."""
    out = []
    bstate = {"probe": probe0, "n": 0, "m": 0}
    for text in texts:
        for sent_id, r in enumerate(
                extract_sentences(text, include_unanchored=True,
                                  normalize=False)):
            raw = r["sentence"] or ""
            probe = bstate["probe"]
            if probe is not None and not r["anchors"]:
                bstate["n"] += 1
                if probe.search(_probe_text(raw)) is None:
                    bstate["m"] += 1
                    continue
                if bstate["n"] >= 1024 and bstate["m"] * 4 < bstate["n"]:
                    bstate["probe"] = None
            tokens = tokens_of_normalized(raw)
            hits, cand = _scan_tokens(tokens, ac, skip, None, gate)
            if not hits and not cand:
                continue
            out.append((sent_id, tuple(hits)))
    return out


def scan_paragraph_level(texts, ac, gate, skip, probe0):
    """The round-7 inner loop: paragraph gate skip + per-sentence probe."""
    out = []
    bstate = {"probe": probe0, "pprobe": probe0,
              "n": 0, "m": 0, "pn": 0, "pm": 0}
    skip_para = _make_paragraph_skip(bstate)
    for text in texts:
        for sent_id, rel_pos, raw, anchors in iter_raw_sentences(
                text, include_unanchored=True, skip_paragraph=skip_para):
            probe = bstate["probe"]
            if probe is not None and not anchors:
                bstate["n"] += 1
                if probe.search(_probe_text(raw)) is None:
                    bstate["m"] += 1
                    continue
                if bstate["n"] >= 1024 and bstate["m"] * 4 < bstate["n"]:
                    bstate["probe"] = None
            tokens = tokens_of_normalized(raw)
            hits, cand = _scan_tokens(tokens, ac, skip, None, gate)
            if not hits and not cand:
                continue
            out.append((sent_id, tuple(hits)))
    return out


def main() -> None:
    pairs = build_dictionary()
    ac = TokenAhoCorasick.from_entries(
        (tokenize(a), (a, e)) for a, e in pairs)
    gate = _scan_gate_set(ac, None)
    skip = _scan_skip_set(ac, None)
    probe0 = _gate_probe(ac, None)
    print(f"dictionary: {len(pairs)} pairs; pages: {N_PAGES} x ~{FAT_KB}KiB")
    for shape in ("inert", "dense"):
        raws = build_pages(inert=shape == "inert")
        texts = [extract_article_text(r) for r in raws]
        mb = sum(len(t) for t in texts) / 1e6
        results = {}
        for name, fn in (("sentence", scan_sentence_level),
                         ("paragraph", scan_paragraph_level)):
            best = float("inf")
            rows = None
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                got = fn(texts, ac, gate, skip, probe0)
                best = min(best, time.perf_counter() - t0)
                rows = got
            results[name] = (best, rows)
            print(f"  {shape:5s} {name:9s}: {best:7.3f} s  "
                  f"{mb / best:6.1f} MB/s  kept_rows={len(rows)}")
        assert results["sentence"][1] == results["paragraph"][1], \
            f"row mismatch on {shape} corpus"
        speedup = results["sentence"][0] / results["paragraph"][0]
        print(f"  {shape:5s} paragraph/sentence speedup: {speedup:5.2f}x "
              f"(rows identical)")


if __name__ == "__main__":
    main()
