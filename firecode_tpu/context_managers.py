"""Context managers: scratch folders, env overrides, output suppression.

Capability parity with firecode/context_managers.py:17-178 (the Sella/ORCA
env pinning has no equivalent here — the device runtime is JAX itself).
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil
import sys
import tempfile
from pathlib import Path


class HiddenPrints:
    """Suppress stdout within the block (firecode/context_managers.py:47)."""

    def __enter__(self):
        self._stdout = sys.stdout
        sys.stdout = io.StringIO()
        return self

    def __exit__(self, *exc):
        sys.stdout = self._stdout
        return False


@contextlib.contextmanager
def new_folder_context(name: str | None = None, keep: bool = False):
    """Create (and cd into) a scratch folder for the block; remove it after
    unless keep=True (firecode/context_managers.py:59-92)."""
    old_cwd = os.getcwd()
    if name is None:
        path = Path(tempfile.mkdtemp(prefix="firecode_tpu_scratch_"))
    else:
        path = Path(old_cwd) / name
        path.mkdir(parents=True, exist_ok=True)
    try:
        os.chdir(path)
        yield path
    finally:
        os.chdir(old_cwd)
        if not keep:
            shutil.rmtree(path, ignore_errors=True)


@contextlib.contextmanager
def env_override(**overrides: str):
    """Temporarily override environment variables
    (firecode/context_managers.py:114)."""
    saved: dict[str, str | None] = {}
    for key, value in overrides.items():
        saved[key] = os.environ.get(key)
        os.environ[key] = str(value)
    try:
        yield
    finally:
        for key, value in saved.items():
            if value is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = value


def clean_directory(
    to_remove_startswith=("temp", "Candidate_"),
    to_remove_endswith=("temp",),
) -> None:
    """Remove temporary artifacts from the current directory
    (firecode/utils.py:65-102)."""
    for f in os.listdir():
        if f.startswith(tuple(to_remove_startswith)) or f.endswith(
            tuple(to_remove_endswith)
        ):
            try:
                os.remove(f)
            except IsADirectoryError:
                shutil.rmtree(f, ignore_errors=True)
            except FileNotFoundError:
                pass
