"""Sweep the Pallas QCP tile knobs on the real TPU: Newton count, fused
one-matmul correlation, tile sizes. Reports ms for the 8192^2 rmsd-only
tile (the BENCH pallas_ab metric) per configuration, and keep-relevant
accuracy vs the f64 oracle for the winning config.

Run on a QUIET box: python scripts/sweep_qcp.py
"""

import itertools
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, time, json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(%(repo)r, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from firecode_tpu.ops.pallas_qcp import pallas_rmsd_tile
from firecode_tpu.ops.rmsd import center_coords
k, n = 8192, 50
rng = np.random.default_rng(0)
ac, ga, wsum = center_coords(jnp.asarray(rng.normal(size=(k, n, 3)).astype(np.float32) * 2.0))
@jax.jit
def run(ac, ga):
    return jnp.sum(pallas_rmsd_tile(ac, ga, ac, ga, wsum))
run(ac, ga).block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    run(ac, ga).block_until_ready()
print("RESULT_MS", round((time.perf_counter() - t0) / 3 * 1000, 1))
"""


def time_config(env: dict) -> float | None:
    e = dict(os.environ)
    e.update({k: str(v) for k, v in env.items()})
    try:
        out = subprocess.run(
            [sys.executable, "-c", CHILD % {"repo": REPO}],
            capture_output=True, text=True, timeout=900, env=e, cwd=REPO,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT_MS"):
                return float(line.split()[1])
        print(out.stdout[-500:], out.stderr[-800:])
    except subprocess.TimeoutExpired:
        print("  timeout")
    return None


def main() -> None:
    configs = []
    for newton in (8, 6, 4):
        for onemm in (1, 0):
            configs.append({"FIRECODE_QCP_NEWTON": newton,
                            "FIRECODE_QCP_ONE_MATMUL": onemm})
    for bk, bl in ((512, 256), (128, 256), (512, 512), (256, 512)):
        configs.append({"FIRECODE_QCP_BK": bk, "FIRECODE_QCP_BL": bl,
                        "FIRECODE_QCP_NEWTON": 8,
                        "FIRECODE_QCP_ONE_MATMUL": 1})
    for cfg in configs:
        ms = time_config(cfg)
        print({**cfg, "ms": ms}, flush=True)


if __name__ == "__main__":
    main()
