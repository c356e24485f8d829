"""Minimal PLY point-cloud I/O.

Replaces `utils/ply.py` (reference): reads/writes binary-little-endian and
ascii PLY files with per-vertex scalar properties. Implemented directly on
numpy structured dtypes rather than the reference's manual field loops.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

_PLY_TYPES = {
    'char': 'i1', 'int8': 'i1',
    'uchar': 'u1', 'uint8': 'u1',
    'short': 'i2', 'int16': 'i2',
    'ushort': 'u2', 'uint16': 'u2',
    'int': 'i4', 'int32': 'i4',
    'uint': 'u4', 'uint32': 'u4',
    'float': 'f4', 'float32': 'f4',
    'double': 'f8', 'float64': 'f8',
}
_INV_TYPES = {'i1': 'char', 'u1': 'uchar', 'i2': 'short', 'u2': 'ushort',
              'i4': 'int', 'u4': 'uint', 'f4': 'float', 'f8': 'double'}


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Read the vertex element of a PLY file -> {property: array}."""
    with open(path, 'rb') as fh:
        magic = fh.readline().strip()
        if magic != b'ply':
            raise ValueError(f'{path}: not a PLY file')
        fmt = None
        n_vertex = 0
        props: List[Tuple[str, str]] = []
        in_vertex = False
        while True:
            line = fh.readline()
            if not line:
                raise ValueError(f'{path}: unexpected EOF in header')
            tokens = line.decode('ascii', 'replace').strip().split()
            if not tokens:
                continue
            if tokens[0] == 'format':
                fmt = tokens[1]
            elif tokens[0] == 'element':
                in_vertex = tokens[1] == 'vertex'
                if in_vertex:
                    n_vertex = int(tokens[2])
            elif tokens[0] == 'property' and in_vertex:
                if tokens[1] == 'list':
                    raise ValueError('list properties not supported')
                props.append((tokens[-1], _PLY_TYPES[tokens[1]]))
            elif tokens[0] == 'end_header':
                break

        if fmt == 'ascii':
            data = np.loadtxt(fh, max_rows=n_vertex)
            data = np.atleast_2d(data)
            return {name: data[:, i].astype(t)
                    for i, (name, t) in enumerate(props)}
        endian = '<' if fmt == 'binary_little_endian' else '>'
        dtype = np.dtype([(name, endian + t) for name, t in props])
        raw = np.frombuffer(fh.read(dtype.itemsize * n_vertex), dtype=dtype,
                            count=n_vertex)
        return {name: np.ascontiguousarray(raw[name]) for name, _ in props}


def read_ply_points(path: str) -> np.ndarray:
    """Convenience: [N, 3] float32 xyz."""
    data = read_ply(path)
    return np.stack([data['x'], data['y'], data['z']], axis=1
                    ).astype(np.float32)


def write_ply(path: str, arrays: Sequence[np.ndarray],
              names: Sequence[str]) -> None:
    """Write per-vertex properties as binary-little-endian PLY.

    ``arrays`` are 1D or 2D; 2D arrays consume len(columns) names
    (mirrors the reference `write_ply` interface, `utils/ply.py:217`).
    """
    cols: List[np.ndarray] = []
    for a in arrays:
        a = np.asarray(a)
        if a.ndim == 1:
            cols.append(a)
        else:
            cols.extend(a[:, i] for i in range(a.shape[1]))
    if len(cols) != len(names):
        raise ValueError(f'{len(cols)} columns but {len(names)} names')
    n = len(cols[0])
    dtype = np.dtype([
        (name, '<' + c.dtype.str.lstrip('<>|=')) for name, c in
        zip(names, cols)])
    rec = np.empty(n, dtype=dtype)
    for name, c in zip(names, cols):
        rec[name] = c
    with open(path, 'wb') as fh:
        fh.write(b'ply\nformat binary_little_endian 1.0\n')
        fh.write(f'element vertex {n}\n'.encode())
        for name, c in zip(names, cols):
            t = _INV_TYPES[c.dtype.str.lstrip('<>|=')]
            fh.write(f'property {t} {name}\n'.encode())
        fh.write(b'end_header\n')
        fh.write(rec.tobytes())
