"""Test configuration: virtual 8-device CPU mesh + float64 enabled.

Note: this environment pre-registers a TPU-tunnel ('axon') PJRT plugin via
sitecustomize and pins JAX_PLATFORMS=axon, so plain env vars are not enough —
we must override the platform through jax.config before any backend
initializes. XLA_FLAGS must still be set before jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache (shared with bench.py): the suite's wall
# clock is dominated by XLA-CPU compiles on a cold box; a committed warm
# cache cuts it severalfold. Entries are keyed by backend+jax version, so
# CPU-test and TPU-bench entries coexist in the same directory.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_chain_coords(n_atoms: int, rng: np.random.Generator) -> np.ndarray:
    """Random extended-chain geometry with ~1.5 A steps (well-conditioned)."""
    steps = rng.normal(size=(n_atoms, 3))
    steps /= np.linalg.norm(steps, axis=1, keepdims=True)
    return np.cumsum(steps * 1.5, axis=0)


def perturb_ensemble(
    base: np.ndarray, n_confs: int, scale: float, rng: np.random.Generator
) -> np.ndarray:
    """Ensemble of randomly rotated + jittered copies of one structure."""
    from scipy.spatial.transform import Rotation

    out = np.empty((n_confs, *base.shape))
    for b in range(n_confs):
        r = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
        jitter = rng.normal(scale=scale, size=base.shape)
        shift = rng.normal(scale=5.0, size=(1, 3))
        out[b] = (base + jitter) @ r.T + shift
    return out


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound compile-cache memory across the suite: nearly 200 tests of
    accumulated jitted programs can exhaust this host's memory and segfault
    XLA-CPU late in the run (observed at ~190 tests). Clearing per module
    trades a few recompiles for bounded residency."""
    yield
    import jax

    jax.clear_caches()
