"""Measure the banded grid MOI engine in isolation at XL scales.

Usage: python scripts/measure_moi_10m.py [n_confs] [dup]
Prints per-pass wall-clock (pass 1 = compile, pass 2 = steady state) and
the keep count, for comparing engine variants on the same chip.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from bench import make_ensemble  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    dup = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from firecode_tpu.prune import cascade, prune_by_moi

    if len(sys.argv) > 3 and sys.argv[3] == "grid":
        cascade._GRID_MIN_B = 0  # force the banded grid engine

    t0 = time.perf_counter()
    atomnos, coords = make_ensemble(n, dup=dup, chunk=min(1_000_000, n))
    coords.block_until_ready()
    print(f"generate: {time.perf_counter() - t0:.1f} s", flush=True)

    r_values = (
        [int(v) for v in sys.argv[4].split(",")]
        if len(sys.argv) > 4
        else [cascade._BAND_R]
    )
    for r in r_values:
        cascade._BAND_R = r
        for label in ("compile", "steady"):
            t0 = time.perf_counter()
            keep = prune_by_moi(coords, atomnos)
            dt = time.perf_counter() - t0
            print(
                f"R={r} {label}: moi_s={dt:.2f} n_kept={int(keep.sum())}",
                flush=True,
            )


if __name__ == "__main__":
    main()
