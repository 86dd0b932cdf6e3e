"""Neural interatomic potential (MLIP) scaffold: native TPU inference+training.

The reference offloads MLIP inference (AIMNet2/UMA torch models) to CUDA and
forces a serial path (SURVEY.md section 2.3 P2/P5). Here the MLIP is a JAX
model: an E(3)-invariant descriptor (element-embedded radial basis over
neighbor distances with a smooth cutoff) feeding a per-atom MLP, summed to a
total energy. It plugs into the same Calculator protocol, so batched
optimization / NEB / Hessians / thermochemistry work unchanged, and it vmaps
over conformers (removing the reference's biggest serial bottleneck).

`distill` fits the model to any reference calculator (LiteFF, the xtb escape
hatch, ...) on perturbed geometries — an on-device distillation loop with
optax — standing in for loading published MLIP weights, which are not
redistributable here.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from firecode_tpu.calculators.base import Calculator
from firecode_tpu.pt import MAX_Z

N_RBF = 16
CUTOFF = 5.0  # Angstrom
EMBED_DIM = 16
HIDDEN = 64


def _rbf(r: jnp.ndarray) -> jnp.ndarray:
    """Gaussian radial basis with smooth cosine cutoff. r [...,] -> [..., N_RBF]."""
    centers = jnp.linspace(0.5, CUTOFF, N_RBF, dtype=r.dtype)
    gamma = (N_RBF / CUTOFF) ** 2
    basis = jnp.exp(-gamma * (r[..., None] - centers) ** 2)
    fc = 0.5 * (jnp.cos(jnp.pi * jnp.clip(r / CUTOFF, 0.0, 1.0)) + 1.0)
    return basis * fc[..., None]


def init_params(key: jax.Array, seed_scale: float = 0.1) -> dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "embed": seed_scale * jax.random.normal(k1, (MAX_Z + 1, EMBED_DIM)),
        "w1": seed_scale * jax.random.normal(k2, (N_RBF * EMBED_DIM, HIDDEN)),
        "b1": jnp.zeros((HIDDEN,)),
        "w2": seed_scale * jax.random.normal(k3, (HIDDEN, HIDDEN)),
        "b2": jnp.zeros((HIDDEN,)),
        "w3": seed_scale * jax.random.normal(k4, (HIDDEN, 1)),
        "b3": jnp.zeros((1,)),
        "atom_ref": jnp.zeros((MAX_Z + 1,)),  # per-element reference energies
    }


def mlip_energy(params: dict, atomnos: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Total energy of one structure (kcal/mol). Pure; autodiff-safe."""
    n = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    mask = (~jnp.eye(n, dtype=bool)) & (r < CUTOFF)

    basis = _rbf(r) * mask[..., None]  # [N, N, R]
    z_emb = params["embed"][atomnos]  # [N, E]
    # invariant per-atom descriptor: sum_j rbf(r_ij) (x) emb(z_j)
    desc = jnp.einsum("ijr,je->ire", basis, z_emb).reshape(n, -1)

    h = jnp.tanh(desc @ params["w1"] + params["b1"])
    h = jnp.tanh(h @ params["w2"] + params["b2"])
    e_atom = (h @ params["w3"] + params["b3"])[:, 0] + params["atom_ref"][atomnos]
    return jnp.sum(e_atom)


class MLIPCalculator(Calculator):
    def __init__(self, params: dict, atomnos: np.ndarray):
        self.params = jax.tree.map(jnp.asarray, params)
        atomnos_j = jnp.asarray(np.asarray(atomnos), dtype=jnp.int32)
        super().__init__(
            lambda coords: mlip_energy(self.params, atomnos_j, coords), name="mlip"
        )

    def save(self, path: str) -> None:
        flat = {k: np.asarray(v) for k, v in self.params.items()}
        np.savez_compressed(path, **flat)

    @classmethod
    def load(cls, path: str, atomnos: np.ndarray) -> "MLIPCalculator":
        data = np.load(path)
        return cls({k: data[k] for k in data.files}, atomnos)


def distill(
    teacher: Calculator,
    atomnos: np.ndarray,
    base_coords: np.ndarray,
    n_samples: int = 256,
    n_steps: int = 500,
    jitter: float = 0.15,
    force_weight: float = 0.1,
    learning_rate: float = 1e-3,
    seed: int = 0,
    logfunction=None,
) -> MLIPCalculator:
    """Fit the MLIP to a teacher calculator on perturbed geometries."""
    import optax

    log = logfunction or (lambda s: None)
    key = jax.random.PRNGKey(seed)
    k_data, k_init = jax.random.split(key)

    base = jnp.asarray(base_coords, jnp.float32)
    samples = base[None] + jitter * jax.random.normal(
        k_data, (n_samples, *base.shape), jnp.float32
    )
    e_ref, f_ref = teacher.energy_and_forces(samples)
    e_ref = jnp.asarray(e_ref, jnp.float32)
    f_ref = jnp.asarray(f_ref, jnp.float32)

    params = init_params(k_init)
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    atomnos_j = jnp.asarray(np.asarray(atomnos), dtype=jnp.int32)

    def model_e_and_f(p, coords):
        e_fn = lambda c: mlip_energy(p, atomnos_j, c)
        e, g = jax.vmap(jax.value_and_grad(e_fn))(coords)
        return e, -g

    def loss_fn(p):
        e, f = model_e_and_f(p, samples)
        return jnp.mean((e - e_ref) ** 2) + force_weight * jnp.mean(
            (f - f_ref) ** 2
        )

    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    for it in range(n_steps):
        params, opt_state, loss = step(params, opt_state)
        if it % max(n_steps // 5, 1) == 0:
            log(f"    MLIP distillation step {it}: loss {float(loss):.4f}")

    return MLIPCalculator(params, atomnos)
