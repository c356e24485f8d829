"""Choi-et-al. benchmark log I/O (gt.log / est .log files).

Format parity with the reference's `geometric_registration/utils.py:loadlog`
and the `.log` writer in `geometric_registration/evaluate.py:84-110`:
each record is a header line "i j n" followed by a 4x4 transform on four
whitespace-separated lines. The MATLAB registration-recall harness
(`geometric_registration/3dmatch/evaluate.m`) consumes these unchanged.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np


def load_log(path: str) -> Dict[str, np.ndarray]:
    """{'i_j': 4x4} for every record in a .log file."""
    out: Dict[str, np.ndarray] = {}
    with open(path) as fh:
        lines = [ln.split() for ln in fh if ln.strip()]
    i = 0
    while i + 4 < len(lines) + 1 and i < len(lines):
        header = lines[i]
        if len(header) < 2:
            break
        key = f'{int(header[0])}_{int(header[1])}'
        mat = np.array([[float(x) for x in lines[i + r]] for r in (1, 2, 3, 4)])
        out[key] = mat
        i += 5
    return out


def write_log(path: str, records: List[Tuple[int, int, int, np.ndarray]]
              ) -> None:
    """records = (i, j, total_fragments, 4x4 transform)."""
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    with open(path, 'w') as fh:
        for i, j, n, t in records:
            fh.write(f'{i}\t{j}\t{n}\n')
            for r in range(4):
                fh.write('\t'.join(f'{t[r, c]:.8e}' for c in range(4)) + '\n')
