"""Build the _fastxyz C extension in-place.

Usage: python native/build_fastxyz.py
Produces firecode_tpu/io/_fastxyz.*.so; the Python layer falls back to the
pure-Python parser when the extension is absent.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import sysconfig
from pathlib import Path

import numpy as np

ROOT = Path(__file__).parent.parent


def main() -> None:
    src = ROOT / "native" / "fastxyz.c"
    out_dir = ROOT / "firecode_tpu" / "io"
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = out_dir / f"_fastxyz{suffix}"

    include_py = sysconfig.get_path("include")
    include_np = np.get_include()

    cmd = [
        "gcc" if shutil.which("gcc") else "cc",
        "-O3",
        "-shared",
        "-fPIC",
        "-o",
        str(out),
        str(src),
        f"-I{include_py}",
        f"-I{include_np}",
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print(f"built {out}")


if __name__ == "__main__":
    main()
