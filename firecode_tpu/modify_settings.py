"""Guided settings editor (`firecode-tpu -s` analog).

Capability parity with firecode/modify_settings.py:1-128: walks the known
settings, shows current values, and writes overrides to ~/.firecodetpurc
(instead of rewriting a source file).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

from firecode_tpu.settings import ENV_VARS, apply_env_defaults

RC_PATH = Path.home() / ".firecodetpurc"


def run_setup(interactive: bool | None = None) -> None:
    apply_env_defaults()
    if interactive is None:
        interactive = sys.stdin.isatty()

    overrides: dict[str, str] = {}
    if RC_PATH.is_file():
        for line in RC_PATH.read_text().splitlines():
            line = line.split("#")[0].strip()
            if "=" in line:
                k, v = line.split("=", 1)
                overrides[k.strip()] = v.strip()

    if not interactive:
        print("Current settings (override via ~/.firecodetpurc, key=value lines):")
        for key in ENV_VARS:
            print(f"  {key}={os.environ.get(key)}")
        return

    print("firecode_tpu guided setup — press Enter to keep the current value.\n")
    for key in ENV_VARS:
        current = os.environ.get(key, ENV_VARS[key])
        answer = input(f"{key} [{current}]: ").strip()
        if answer:
            overrides[key] = answer

    if overrides:
        lines = [f"{k}={v}" for k, v in overrides.items()]
        RC_PATH.write_text("\n".join(lines) + "\n")
        print(f"\nWrote {len(overrides)} override(s) to {RC_PATH}")
    else:
        print("\nNo changes.")
