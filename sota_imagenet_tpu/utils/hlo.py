"""Optimized-HLO inspection helpers: count collective operations in a
compiled program's text.

Used by the collective-structure guards (tests/test_collective_structure.py,
tests/test_device_cache.py) — the TPU-native replacement for eyeballing
DDP's bucketed all-reduce behavior (reference train.py:114): assert the
compiled program's *communication structure*, not just its numerics.
"""

from __future__ import annotations

import re
from typing import Dict, List

COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute", "all-to-all")


def collective_lines(text: str, op: str) -> List[str]:
    """Unique collective *definitions* (not operand references) for one op."""
    return [
        l
        for l in text.splitlines()
        if re.search(rf"= (?:\(?[a-z0-9e\[\],{{}}\s]+\)?\s+)?{op}(?:-start)?\(", l)
    ]


def collective_counts(text: str) -> Dict[str, int]:
    """{op: definition count} over every collective family."""
    return {op: len(collective_lines(text, op)) for op in COLLECTIVE_OPS}


def result_elems_each(line: str) -> List[int]:
    """Per-tensor element counts of a collective's result from its HLO line.

    Handles both scalar-typed results (`f32[8,4]{..} all-gather(...)`) and
    tuple-typed results of combined/async collectives
    (`(f32[8,4]{..}, f32[2]{..}) all-gather(...)`) — the latter previously
    parsed as zero tensors (ADVICE r4), silently disabling the zero1
    gathered-volume guards.
    """
    lhs = line.split(" = ", 1)[1]
    if lhs.startswith("("):
        # tuple-typed result — take the balanced parenthesized type list,
        # not split-on-'(' (which would yield the empty string)
        depth = 0
        for i, ch in enumerate(lhs):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    lhs = lhs[: i + 1]
                    break
    else:
        lhs = lhs.split("(", 1)[0]  # type annotation before the op's open paren
    out = []
    for m in re.finditer(r"[a-z][a-z0-9]*\[([0-9,]*)\]", lhs):
        dims = m.group(1)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append(n)
    return out


def result_elems(line: str) -> int:
    """Total element count of a collective's result tensor(s)."""
    return sum(result_elems_each(line))
