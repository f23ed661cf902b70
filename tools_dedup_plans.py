"""One-shot post-processor for oversized plans/r07/*_after.txt captures.

explain("formatted") re-prints an InMemoryRelation's entire cached subtree
at EVERY reference, and the round's new persists nest several levels deep,
inflating some captures to 10-75 MB of >95% repeated text. This keeps the
first printed occurrence of every operator id (the complete plan: every
node appears exactly once) and drops re-printed subtrees, marking each
elision. Node-detail sections are kept, deduped by detail id the same way.
Measurement tooling only — not part of the engine.
"""

from __future__ import annotations

import glob
import os
import re
import sys

ID_RE = re.compile(r"\((\d+)\)")


def dedup(path: str, cap: int = 3_000_000) -> None:
    sz = os.path.getsize(path)
    if sz <= cap:
        print(f"{path}: {sz} bytes, left alone")
        return
    data = open(path).read()
    seen: set[int] = set()
    out: list[str] = []
    dropping = False
    n_elided = 0
    in_detail = False
    detail_seen: set[int] = set()
    for line in data.splitlines():
        # node-detail blocks start at column 0 like "(123) NodeName"
        m_det = re.match(r"^\((\d+)\) ", line)
        if m_det:
            in_detail = True
            did = int(m_det.group(1))
            dropping = did in detail_seen
            detail_seen.add(did)
            if dropping:
                continue
            out.append(line)
            continue
        if in_detail:
            if not dropping:
                out.append(line)
            continue
        ids = [int(x) for x in ID_RE.findall(line)]
        if ids:
            if all(i in seen for i in ids):
                if not dropping:
                    indent = len(line) - len(line.lstrip(" :+-*"))
                    out.append(" " * indent +
                               f"[re-printed subtree elided: operator "
                               f"({ids[0]}) already shown above]")
                    n_elided += 1
                dropping = True
                continue
            seen.update(ids)
            dropping = False
            out.append(line)
        else:
            # header/blank lines: follow the keep/drop state of context
            if not dropping:
                out.append(line)
    note = (f"\n[POST-PROCESSED by tools_dedup_plans.py: raw "
            f"explain('formatted') was {sz} bytes because nested "
            f"InMemoryRelation nodes re-print their full cached subtree at "
            f"every reference. Every operator id's line and detail block is "
            f"kept at its FIRST occurrence ({n_elided} re-printed subtrees "
            f"elided, each marked in place); the plan content is complete.]\n")
    open(path, "w").write("\n".join(out) + note)
    print(f"{path}: {sz} -> {os.path.getsize(path)} ({n_elided} elisions)")


if __name__ == "__main__":
    targets = sys.argv[1:] or sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "plans", "r07", "*_after.txt")))
    for p in targets:
        dedup(p)
