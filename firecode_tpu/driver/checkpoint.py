"""Run-state snapshot / restore.

The reference writes checkpoint xyz files but has no resume logic
(SURVEY.md section 5: "checkpoint files, no resume logic ... the rebuild
should make this a real snapshot/restore of the device ensemble state").
Here the full refinement state — structures, energies, constrained indices,
exit status, pipeline stage — round-trips through one .npz file.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def save_state(embedder, stage: str, path: str | Path | None = None) -> Path:
    """Snapshot the ensemble state; returns the file path."""
    path = Path(path or f"firecode_state_{embedder.stamp}.npz")
    payload = {
        "stage": np.array(stage),
        "structures": embedder.structures,
        "atomnos": embedder.atomnos,
    }
    for attr in ("energies", "exit_status"):
        value = getattr(embedder, attr, None)
        if value is not None:
            payload[attr] = np.asarray(value)
    ci = getattr(embedder, "constrained_indices", None)
    if ci is not None:
        payload["constrained_indices"] = np.asarray(ci)
    np.savez_compressed(path, **payload)
    return path


def load_state(embedder, path: str | Path) -> str:
    """Restore a snapshot into the embedder; returns the saved stage tag."""
    data = np.load(path, allow_pickle=False)
    embedder.structures = data["structures"]
    embedder.atomnos = data["atomnos"]
    from firecode_tpu.pt import symbols_from_atomnos

    embedder.atoms = symbols_from_atomnos(embedder.atomnos)
    if "energies" in data:
        embedder.energies = data["energies"]
    if "exit_status" in data:
        embedder.exit_status = data["exit_status"]
    if "constrained_indices" in data:
        embedder.constrained_indices = data["constrained_indices"]
    return str(data["stage"])
