"""Run-state snapshot / restore.

The reference writes checkpoint xyz files but has no resume logic
(SURVEY.md section 5: "checkpoint files, no resume logic ... the rebuild
should make this a real snapshot/restore of the device ensemble state";
periodic checkpoints at firecode/embedder.py:2213-2240). Here the full
refinement state — structures, energies, constrained indices, exit status,
pipeline stage, and the per-structure done mask of a partially completed
optimization stage — round-trips through one .npz file, and the CLI
`--resume state.npz` flag restarts a killed run from it (see
RunEmbedding.run's stage gating in driver/embedder.py).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def save_state(
    embedder, stage: str, path: str | Path | None = None, done=None
) -> Path:
    """Snapshot the ensemble state; returns the file path.

    done: optional bool[B] mask of structures already optimized within the
    current (partially completed) optimization stage.
    """
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
    if done is not None:
        payload["done_mask"] = np.asarray(done, dtype=bool)
    tmp = path.with_name(path.stem + ".tmp.npz")  # savez appends .npz otherwise
    np.savez_compressed(tmp, **payload)
    tmp.replace(path)  # atomic: a kill mid-write never corrupts the snapshot
    return path


def load_state(embedder, path: str | Path) -> str:
    """Restore a snapshot into the embedder; returns the saved stage tag.

    Sets embedder._resume_done to the partial-stage mask (or None)."""
    data = np.load(path, allow_pickle=False)
    embedder.structures = data["structures"]
    embedder.atomnos = data["atomnos"]
    from firecode_tpu.pt import symbols_from_atomnos

    embedder.atoms = symbols_from_atomnos(embedder.atomnos)
    if "energies" in data:
        embedder.energies = data["energies"]
    if "exit_status" in data:
        embedder.exit_status = data["exit_status"]
    else:
        embedder.exit_status = np.ones(len(embedder.structures), dtype=bool)
    if "constrained_indices" in data:
        embedder.constrained_indices = data["constrained_indices"]
    embedder._resume_done = data["done_mask"] if "done_mask" in data else None
    return str(data["stage"])
