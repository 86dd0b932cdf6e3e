"""Multi-conformer .xyz reading/writing (host ingress/egress).

Capability parity with the reference reader/writer (firecode/ensemble.py:58-98,
firecode/utils.py:105-191): multi-frame xyz with optional energy parsing from
comment lines (bare number assumed Hartree; `... Eh` suffix Hartree; `...
kcal/mol` suffix converted to Hartree).

This is the only place structures exist as Python objects; everything after
ingress is batched arrays.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import IO, Iterable

import numpy as np

from firecode_tpu.errors import InputError
from firecode_tpu.units import EH_TO_KCAL

_NUM_RE = re.compile(r"-?\d+\.\d+")
_EH_RE = re.compile(r"(-?\d+\.\d+)\s*EH", re.IGNORECASE)
_KCAL_RE = re.compile(r"(-?\d+\.\d+)\s*KCAL/MOL", re.IGNORECASE)

try:  # C-accelerated parser/formatter (native/fastxyz.c); pure-Python fallback
    from firecode_tpu.io import _fastxyz
except ImportError:  # pragma: no cover - extension not built
    _fastxyz = None


def parse_xyz(text: str) -> tuple[list[str], np.ndarray, list[str]]:
    """Parse a (possibly multi-frame) xyz string.

    Returns (atoms, coords[B, N, 3] float64, comment_lines). All frames must
    share the same atom list. Uses the C extension when built.
    """
    if _fastxyz is not None:
        try:
            symbols, coords, comments = _fastxyz.parse(text)
            return [s.capitalize() for s in symbols], coords, comments
        except ValueError as exc:
            raise InputError(str(exc)) from exc
    return _parse_xyz_py(text)


def _parse_xyz_py(text: str) -> tuple[list[str], np.ndarray, list[str]]:
    lines = text.splitlines()
    i = 0
    n_lines = len(lines)
    frames: list[np.ndarray] = []
    comments: list[str] = []
    atoms: list[str] | None = None

    while i < n_lines:
        line = lines[i].strip()
        if not line:
            i += 1
            continue
        try:
            natoms = int(line)
        except ValueError as exc:
            raise InputError(f"Expected atom count at line {i + 1}, got: {line!r}") from exc
        if natoms <= 0:
            raise InputError(f"Atom count must be positive at line {i + 1}, got: {natoms}")
        if i + 1 + natoms >= n_lines + 1:
            raise InputError(f"Truncated xyz frame starting at line {i + 1}")
        comments.append(lines[i + 1] if i + 1 < n_lines else "")
        frame_atoms: list[str] = []
        xyz = np.empty((natoms, 3), dtype=np.float64)
        for k in range(natoms):
            parts = lines[i + 2 + k].split()
            frame_atoms.append(parts[0].capitalize())
            xyz[k] = [float(parts[1]), float(parts[2]), float(parts[3])]
        if atoms is None:
            atoms = frame_atoms
        elif frame_atoms != atoms:
            raise InputError("All frames in a multi-conformer xyz must share one atom list")
        frames.append(xyz)
        i += 2 + natoms

    if atoms is None:
        raise InputError("Empty xyz file")
    return atoms, np.stack(frames), comments


def read_xyz(path: str | Path) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Read an xyz file -> (atoms str[N], coords f64[B,N,3], comments)."""
    atoms, coords, comments = parse_xyz(Path(path).read_text())
    return np.array(atoms), coords, comments


def parse_energy(comment: str) -> float | None:
    """Extract an energy in Hartree from an xyz comment line, or None."""
    stripped = comment.strip()
    if not stripped:
        return None
    parts = stripped.split()
    # single bare number: assume Hartree
    if len(parts) == 1 and set(parts[0]) <= set("0123456789.-"):
        try:
            return float(parts[0])
        except ValueError:
            return None
    m = _EH_RE.search(comment)
    if m:
        return float(m.group(1))
    m = _KCAL_RE.search(comment)
    if m:
        return float(m.group(1)) / EH_TO_KCAL
    m = _NUM_RE.search(comment)
    if m:
        return float(m.group(0))
    return None


def read_xyz_energies(path: str | Path) -> np.ndarray | None:
    """Read per-frame energies (Hartree) from xyz comment lines; None if unparsable."""
    _, _, comments = read_xyz(path)
    energies = [parse_energy(c) for c in comments]
    if any(e is None for e in energies):
        return None
    return np.array(energies, dtype=np.float64)


def format_xyz(
    atoms: Iterable[str],
    coords: np.ndarray,
    title: str = "firecode_tpu",
) -> str:
    """Format a single frame as an xyz string."""
    atoms = list(atoms)
    body = "\n".join(
        f"{a:<3s} {x:15.8f} {y:15.8f} {z:15.8f}" for a, (x, y, z) in zip(atoms, np.asarray(coords))
    )
    return f"{len(atoms)}\n{title}\n{body}\n"


def write_xyz(
    path: str | Path | IO[str],
    atoms: Iterable[str],
    coords: np.ndarray,
    energies: np.ndarray | None = None,
    title: str = "firecode_tpu",
) -> None:
    """Write one or many frames. coords: [N,3] or [B,N,3]."""
    coords = np.asarray(coords)
    if coords.ndim == 2:
        coords = coords[None]
    atoms = list(atoms)
    titles = [
        title if energies is None else f"{energies[b]:.8f} Eh"
        for b in range(coords.shape[0])
    ]
    if _fastxyz is not None:
        text = _fastxyz.format(
            [str(a) for a in atoms], np.ascontiguousarray(coords, dtype=np.float64), titles
        )
    else:
        text = "".join(
            format_xyz(atoms, coords[b], title=t) for b, t in enumerate(titles)
        )
    if hasattr(path, "write"):
        path.write(text)  # type: ignore[union-attr]
    else:
        Path(path).write_text(text)  # type: ignore[arg-type]
