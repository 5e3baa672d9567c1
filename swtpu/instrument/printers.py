"""Debug matrix printers — parity with the reference's DEBUG-mode output.

Reproduces printMatrix (serial_smithW.c:283-292) and the arrow-rendered
printPredecessorMatrix with bold-red path cells (serial_smithW.c:298-328),
so eyeball diffs against reference output stay possible.
"""

from __future__ import annotations

import numpy as np

from ..core.config import DIAGONAL, LEFT, UP

RESET = "\033[0m"
BOLDRED = "\033[1m\033[31m"

_ARROWS = {UP: "↑", LEFT: "←", DIAGONAL: "↖"}


def format_matrix(H: np.ndarray) -> str:
    return "\n".join("\t".join(str(int(v)) for v in row) for row in H) + "\n"


def format_predecessor_matrix(P: np.ndarray, color: bool = True) -> str:
    lines = []
    for row in P:
        cells = []
        for v in row:
            v = int(v)
            arrow = _ARROWS.get(abs(v) & 3, "-")   # mask affine state bits
            if v < 0 and color:     # negated = on the traceback path
                cells.append(f"{BOLDRED}{arrow} {RESET}")
            else:
                cells.append(f"{arrow} ")
        lines.append("".join(cells))
    return "\n".join(lines) + "\n"
