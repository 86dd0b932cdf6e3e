"""Environment-variable configuration tier.

Three config tiers, mirroring the reference (firecode/settings.py:11-67 +
firecode/__main__.py:113-146): (1) defaults here, exported as FIRECODE_TPU_*
env vars; (2) ~/.firecodetpurc then ./.firecodetpurc key=value overrides;
(3) the input-file keyword line (firecode_tpu.driver.options).
"""

from __future__ import annotations

import os
from pathlib import Path

ENV_VARS: dict[str, str] = {
    # the generated GFN-FF (literature-anchored, ACCURACY.json) is the
    # default calculator — the reference's default is likewise a GFN-class
    # method (TBLITE/GFN2 via external binaries, firecode/settings.py);
    # LITEFF remains the fast classical option, XTB the host escape hatch
    "FIRECODE_TPU_CALCULATOR": "GFNFF",
    "FIRECODE_TPU_DEFAULT_LEVEL_LITEFF": "LiteFF",
    "FIRECODE_TPU_DEFAULT_LEVEL_XTB": "GFN2-xTB",
    "FIRECODE_TPU_XTB_PATH": "xtb",
    "FIRECODE_TPU_CREST_PATH": "crest",
    "FIRECODE_TPU_PACKMOL_PATH": "packmol",
    "FIRECODE_TPU_SOLVATION": "alpb",
    "FIRECODE_TPU_CHECKPOINT_FREQ": "50",
    # default dtype for device pipelines ("float32" on TPU; tests use x64)
    "FIRECODE_TPU_DTYPE": "float32",
}


def apply_env_defaults() -> None:
    """Set defaults for unset FIRECODE_TPU_* variables, then apply rc files."""
    for key, value in ENV_VARS.items():
        os.environ.setdefault(key, value)
    for rc in (Path.home() / ".firecodetpurc", Path.cwd() / ".firecodetpurc"):
        if rc.is_file():
            for line in rc.read_text().splitlines():
                line = line.split("#")[0].strip()
                if "=" in line:
                    key, value = line.split("=", 1)
                    os.environ[key.strip()] = value.strip()


def get(name: str, default: str | None = None) -> str | None:
    apply_env_defaults()
    return os.environ.get(name, default)
