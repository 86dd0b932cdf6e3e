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
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    return {
        "embed": seed_scale * jax.random.normal(k1, (MAX_Z + 1, EMBED_DIM)),
        # +1 input: the per-atom share of the TOTAL charge (charge/N) — the
        # minimal charge conditioning that lets one parameter set label
        # both neutral and ionic species without corrupting neutral
        # training (an anion and its neutral parent share geometries but
        # not energies; a charge-blind model would average them)
        "w1": seed_scale * jax.random.normal(k2, (N_RBF * EMBED_DIM + 1, HIDDEN)),
        "b1": jnp.zeros((HIDDEN,)),
        # one SchNet-style continuous-filter interaction layer: the filter is
        # a linear map of the pair RBF, the message the filtered neighbor
        # feature; gives each atom view of its environment's ENVIRONMENT
        # (the 3-body information a pure radial descriptor cannot see)
        "wf": seed_scale * jax.random.normal(k5, (N_RBF, HIDDEN)),
        "wm": seed_scale * jax.random.normal(k6, (HIDDEN, HIDDEN)),
        "bm": jnp.zeros((HIDDEN,)),
        "w2": seed_scale * jax.random.normal(k3, (HIDDEN, HIDDEN)),
        "b2": jnp.zeros((HIDDEN,)),
        "w3": seed_scale * jax.random.normal(k4, (HIDDEN, 1)),
        "b3": jnp.zeros((1,)),
        "atom_ref": jnp.zeros((MAX_Z + 1,)),  # per-element reference energies
        "q_ref": jnp.zeros(()),  # linear total-charge baseline (ionization)
    }


def mlip_energy(
    params: dict, atomnos: jnp.ndarray, coords: jnp.ndarray, charge=0.0
) -> jnp.ndarray:
    """Total energy of one structure (kcal/mol). Pure; autodiff-safe.

    charge: total molecular charge, fed to every atom as charge/N_real —
    the conditioning input that separates ionic from neutral labels."""
    n = coords.shape[0]
    diff = coords[:, None, :] - coords[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    mask = (~jnp.eye(n, dtype=bool)) & (r < CUTOFF)

    basis = _rbf(r) * mask[..., None]  # [N, N, R]
    z_emb = params["embed"][atomnos]  # [N, E]
    # invariant per-atom descriptor: sum_j rbf(r_ij) (x) emb(z_j)
    desc = jnp.einsum("ijr,je->ire", basis, z_emb).reshape(n, -1)
    n_real = jnp.maximum(jnp.sum(atomnos > 0), 1)
    q_feat = jnp.full((n, 1), jnp.asarray(charge, desc.dtype) / n_real, desc.dtype)
    desc = jnp.concatenate([desc, q_feat], axis=-1)

    h = jnp.tanh(desc @ params["w1"] + params["b1"])
    # interaction layer: message m_i = sum_j filter(r_ij) * h_j
    filt = basis @ params["wf"]  # [N, N, H]
    msg = jnp.einsum("ijh,jh->ih", filt, h)
    h = h + jnp.tanh(msg @ params["wm"] + params["bm"])
    h = jnp.tanh(h @ params["w2"] + params["b2"])
    e_atom = (h @ params["w3"] + params["b3"])[:, 0] + params["atom_ref"][atomnos]
    # Z = 0 lanes are padding (bucketed variable-size batches): contribute 0
    return jnp.sum(jnp.where(atomnos > 0, e_atom, 0.0)) + jnp.asarray(
        charge, coords.dtype
    ) * params["q_ref"]


class MLIPCalculator(Calculator):
    def __init__(self, params: dict, atomnos: np.ndarray, charge: float = 0.0):
        self.params = jax.tree.map(jnp.asarray, params)
        atomnos_j = jnp.asarray(np.asarray(atomnos), dtype=jnp.int32)
        super().__init__(
            lambda coords: mlip_energy(self.params, atomnos_j, coords, charge),
            name="mlip",
        )

    def save(self, path: str) -> None:
        flat = {k: np.asarray(v) for k, v in self.params.items()}
        np.savez_compressed(path, **flat)

    @classmethod
    def load(
        cls, path: str, atomnos: np.ndarray, charge: float = 0.0
    ) -> "MLIPCalculator":
        data = np.load(path)
        # "__"-prefixed entries are checkpoint metadata (teacher provenance,
        # corpus size), not parameters
        return cls(
            {k: data[k] for k in data.files if not k.startswith("__")},
            atomnos,
            charge,
        )


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


# --------------------------------------------------------------------------
# multi-system distillation + the bundled CHNO checkpoint
# --------------------------------------------------------------------------

DEFAULT_CHECKPOINT = str(
    __import__("pathlib").Path(__file__).parent / "data" / "mlip_chno.npz"
)


def _augmented_samples(z, coords, n_samples, jitter, key) -> np.ndarray:
    """Training geometries beyond Gaussian noise (VERDICT r2 item 2):
    1/2 jittered, 1/4 additionally torsion-displaced (random rotations on
    every rotable bond), 1/4 additionally bond-stretched (+-0.25 A along a
    random bond) — so the student sees conformational AND bond-displacement
    physics, not just basin noise."""
    import networkx as nx

    from firecode_tpu.graphs import graphize
    from firecode_tpu.ops.torsion_ops import rotate_dihedral
    from firecode_tpu.torsions import find_torsions

    z = np.asarray(z)
    coords = np.asarray(coords, dtype=np.float32)
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    n_jit = n_samples // 2
    n_tor = n_samples // 4
    n_str = n_samples - n_jit - n_tor

    base = np.broadcast_to(coords, (n_samples, *coords.shape)).copy()

    graph = graphize(z, coords)
    torsions = find_torsions(graph, z, coords)
    if torsions and n_tor:
        sl = slice(n_jit, n_jit + n_tor)
        work = jnp.asarray(base[sl])
        for t in torsions:
            angles = rng.uniform(-60.0, 60.0, size=n_tor)
            work = rotate_dihedral(
                work, jnp.asarray(np.asarray(t.quadruplet, np.int32)),
                jnp.asarray(angles.astype(np.float32)), jnp.asarray(t.mask),
            )
        base[sl] = np.asarray(work)
    if n_str:
        edges = list(graph.edges)
        for s in range(n_samples - n_str, n_samples):
            i, j = edges[rng.integers(len(edges))]
            g2 = graph.copy()
            g2.remove_edge(i, j)
            side = nx.node_connected_component(g2, j)
            if len(side) > len(z) // 2:
                i, j = j, i
                side = nx.node_connected_component(g2, j)
            d = coords[j] - coords[i]
            d = d / (np.linalg.norm(d) + 1e-12)
            base[s, sorted(side)] += rng.uniform(-0.25, 0.25) * d

    base += jitter * rng.normal(size=base.shape).astype(np.float32)
    return base


def distill_systems(
    teacher_factory,
    systems: list[tuple[np.ndarray, np.ndarray]],
    n_samples: int = 192,
    n_steps: int = 4000,
    jitter: float = 0.12,
    force_weight: float = 0.05,
    learning_rate: float = 3e-3,
    seed: int = 0,
    logfunction=None,
) -> dict:
    """Distill one shared parameter set from a teacher across SEVERAL
    molecules (element-transferable training; VERDICT round-1 item 9).

    teacher_factory(atomnos, coords[, charge=..]) -> Calculator builds the
    teacher per system. Systems are (z, coords) or (z, coords, charge) —
    charged entries use the charge-conditioned student input and a teacher
    built with the system's charge (the site-constrained GFN-FF for ions).
    All systems are padded to a common atom count with Z = 0 lanes (masked
    in mlip_energy) so the whole multi-composition training set is one
    jitted batch. Returns the trained parameter pytree.
    """
    import inspect

    import optax

    log = logfunction or (lambda s: None)
    key = jax.random.PRNGKey(seed)
    # entries: (z, x) | (z, x, charge) | (z, x, charge, site, site_target)
    systems = [
        s if len(s) == 5 else (*s, 0.0, None, None)[:5] for s in systems
    ]
    n_max = max(len(z) for z, *_ in systems)
    takes_charge = "charge" in inspect.signature(teacher_factory).parameters

    all_z, all_x, all_e, all_f, all_q = [], [], [], [], []
    for z, coords, q, site, site_tgt in systems:
        key, k_jit = jax.random.split(key)
        z = np.asarray(z)
        coords = np.asarray(coords, dtype=np.float32)
        teacher = (
            teacher_factory(z, coords, charge=q, site=site, site_tgt=site_tgt)
            if takes_charge
            else teacher_factory(z, coords)
        )
        samples = _augmented_samples(z, coords, n_samples, jitter, k_jit)
        e_ref, f_ref = teacher.energy_and_forces(jnp.asarray(samples))
        pad = n_max - len(z)
        z_pad = np.pad(z, (0, pad))
        # padded atoms parked far away (outside every cutoff), zero forces
        x_pad = np.pad(
            samples, ((0, 0), (0, pad), (0, 0)), constant_values=500.0
        )
        f_pad = np.pad(np.asarray(f_ref), ((0, 0), (0, pad), (0, 0)))
        all_z.append(np.broadcast_to(z_pad, (n_samples, n_max)))
        all_x.append(x_pad)
        all_e.append(np.asarray(e_ref))
        all_f.append(f_pad)
        all_q.append(np.full(n_samples, q, np.float32))

    z_np = np.concatenate(all_z)
    e_np = np.concatenate(all_e)
    q_np = np.concatenate(all_q)

    # per-element baseline energies by least squares FIRST: absolute molecular
    # energies are hundreds of kcal/mol of per-element offset that a 2e-3
    # learning rate could never walk atom_ref across; the network then only
    # has to learn the O(10 kcal/mol) geometric residual. The total charge
    # is one more design column (q_ref): an anion and its neutral parent
    # share element counts but differ by ~a proton affinity.
    counts = np.stack(
        [np.bincount(z_row, minlength=MAX_Z + 1) for z_row in z_np]
    ).astype(np.float64)
    used = counts.sum(axis=0) > 0
    used[0] = False
    design = np.concatenate([counts[:, used], q_np[:, None]], axis=1)
    ref, *_ = np.linalg.lstsq(design, e_np.astype(np.float64), rcond=None)
    atom_ref0 = np.zeros(MAX_Z + 1)
    atom_ref0[used] = ref[:-1]
    q_ref0 = ref[-1]

    z_b = jnp.asarray(z_np, jnp.int32)
    x_b = jnp.asarray(np.concatenate(all_x), jnp.float32)
    e_b = jnp.asarray(e_np, jnp.float32)
    f_b = jnp.asarray(np.concatenate(all_f), jnp.float32)
    q_b = jnp.asarray(q_np, jnp.float32)

    key, k_init = jax.random.split(key)
    params = jax.tree.map(
        lambda x: x.astype(jnp.float32), init_params(k_init)
    )
    params["atom_ref"] = jnp.asarray(atom_ref0, jnp.float32)
    params["q_ref"] = jnp.asarray(q_ref0, jnp.float32)

    def e_and_f(p, z, x, q):
        e_fn = lambda c: mlip_energy(p, z, c, q)
        e, g = jax.value_and_grad(e_fn)(x)
        return e, -g

    n_data = z_b.shape[0]
    minibatch = min(256, n_data)

    def loss_fn(p, idx):
        z, x, q = z_b[idx], x_b[idx], q_b[idx]
        e, f = jax.vmap(lambda zz, xx, qq: e_and_f(p, zz, xx, qq))(z, x, q)
        mask = (z > 0)[..., None]
        return jnp.mean((e - e_b[idx]) ** 2) + force_weight * jnp.mean(
            jnp.where(mask, (f - f_b[idx]) ** 2, 0.0)
        )

    schedule = optax.cosine_decay_schedule(learning_rate, n_steps, alpha=0.02)
    opt = optax.adam(schedule)
    opt_state = opt.init(params)

    # minibatched SGD inside a jitted fori_loop per log interval: full-batch
    # steps are needlessly expensive and a per-step host round trip dominates
    # wall-clock on tunneled backends
    chunk = max(n_steps // 10, 1)

    @jax.jit
    def run_chunk(p, s, key):
        def body(k, carry):
            p, s, _ = carry
            idx = jax.random.randint(
                jax.random.fold_in(key, k), (minibatch,), 0, n_data
            )
            loss, grads = jax.value_and_grad(loss_fn)(p, idx)
            updates, s = opt.update(grads, s)
            return optax.apply_updates(p, updates), s, loss

        return jax.lax.fori_loop(
            0, chunk, body, (p, s, jnp.asarray(0.0, jnp.float32))
        )

    done = 0
    while done < n_steps:
        key, k_chunk = jax.random.split(key)
        params, opt_state, loss = run_chunk(params, opt_state, k_chunk)
        done += chunk
        log(f"    MLIP multi-system distillation step {done}: loss {float(loss):.4f}")
    return params


def _chno_training_systems() -> list[tuple[np.ndarray, np.ndarray]]:
    """Small CHNO molecules, natively pre-relaxed, for the bundled
    checkpoint (labels come from the selected teacher at distillation)."""
    from firecode_tpu.opt.fire import optimize_batch
    from firecode_tpu.sample_molecules import build_alkane

    raw: list[tuple[np.ndarray, np.ndarray]] = [
        (np.array([8, 1, 1]),
         np.array([[0.0, 0, 0.119], [0.0, 0.763, -0.477], [0.0, -0.763, -0.477]])),
        (np.array([7, 1, 1, 1]),
         np.array([[0.0, 0, 0.1], [0.94, 0, -0.27], [-0.47, 0.81, -0.27], [-0.47, -0.81, -0.27]])),
        (np.array([6, 1, 1, 1, 1]),
         np.array([[0.0, 0, 0], [0.63, 0.63, 0.63], [-0.63, -0.63, 0.63], [0.63, -0.63, -0.63], [-0.63, 0.63, -0.63]])),
        (np.array([6, 8, 1, 1]),  # formaldehyde
         np.array([[0.0, 0, 0], [1.21, 0, 0], [-0.55, 0.94, 0], [-0.55, -0.94, 0]])),
        (np.array([6, 8, 1, 1, 1, 1]),  # methanol
         np.array([[0.0, 0, 0], [1.42, 0, 0], [1.75, 0.89, 0],
                   [-0.38, 0.51, 0.89], [-0.38, 0.51, -0.89], [-0.38, -1.02, 0]])),
        (np.array([6, 6, 8, 1, 1, 1, 1, 1, 1]),  # ethanol
         np.array([[0.0, 0, 0], [1.51, 0, 0], [2.0, 1.32, 0], [2.97, 1.3, 0],
                   [-0.4, -0.5, 0.88], [-0.4, -0.5, -0.88], [-0.37, 1.02, 0],
                   [1.88, -0.52, 0.88], [1.88, -0.52, -0.88]])),
        (np.array([6, 6, 1, 1, 1, 1]),  # ethylene
         np.array([[0.0, 0, 0.67], [0, 0, -0.67], [0.92, 0, 1.24],
                   [-0.92, 0, 1.24], [0.92, 0, -1.24], [-0.92, 0, -1.24]])),
        (np.array([6, 7, 1, 1, 1, 1, 1]),  # methylamine
         np.array([[0.0, 0, 0], [1.47, 0, 0], [1.84, 0.82, 0.47],
                   [1.84, -0.82, 0.47], [-0.37, 0.5, 0.89], [-0.37, 0.5, -0.89],
                   [-0.37, -1.02, 0]])),
        (np.array([6, 8, 8, 1, 1]),  # formic acid
         np.array([[0.0, 0, 0], [1.2, 0.2, 0], [-0.8, 1.05, 0],
                   [-0.45, -1.0, 0], [-0.35, 1.9, 0]])),
    ]
    for n_carbons in (2, 3, 4, 5):
        raw.append(build_alkane(n_carbons))

    # widened corpus (VERDICT r2 item 2): conjugation, aromatics, an H-bonded
    # complex, and more O/N compositions from the literature fixture set
    from firecode_tpu.calculators.gfnff import fixtures as fx

    raw.append(fx.formic_acid())
    raw.append(fx.water_dimer())
    raw.append(fx.biphenyl())  # aromatic rings + the inter-ring torsion
    # s-trans butadiene (conjugated C=C-C=C)
    raw.append((
        np.array([6, 6, 6, 6, 1, 1, 1, 1, 1, 1]),
        np.array([
            [0.0, 0.0, 0], [1.34, 0.0, 0], [2.05, 1.24, 0], [3.39, 1.24, 0],
            [-0.55, -0.93, 0], [-0.55, 0.93, 0], [1.89, -0.93, 0],
            [1.50, 2.17, 0], [3.94, 0.31, 0], [3.94, 2.17, 0],
        ]),
    ))
    # acetone
    raw.append((
        np.array([6, 6, 6, 8, 1, 1, 1, 1, 1, 1]),
        np.array([
            [0.0, 0.0, 0], [1.52, 0.0, 0], [2.22, 1.34, 0], [2.12, -1.03, 0],
            [-0.38, -0.51, 0.88], [-0.38, -0.51, -0.88], [-0.38, 1.02, 0],
            [1.89, 1.89, 0.88], [1.89, 1.89, -0.88], [3.30, 1.21, 0],
        ]),
    ))

    # beyond CHNO (VERDICT r4 item 6): sulfur and halogen chemistry from
    # the literature fixture set
    raw.append(fx.h2s())
    raw.append(fx.methanethiol())
    raw.append(fx.dimethyl_sulfide())
    raw.append(fx.thiophene())
    for hal in (9, 17, 35):
        raw.append(fx.methyl_halide(hal))
        raw.append(fx.hydrogen_halide(hal))

    # pre-relax with the native GFN-FF regardless of the teacher: a host-
    # subprocess teacher (XTBHostCalculator) cannot run inside the jitted
    # FIRE while_loop (its energy_and_forces needs concrete arrays), and the
    # teacher then labels the (slightly off-minimum) geometries it is handed
    # — exactly the regime the jitter/torsion/stretch augmentation samples
    from firecode_tpu.calculators.gfnff import GFNFF

    systems = []
    for z, coords in raw:
        calc = GFNFF(np.asarray(z), np.asarray(coords, dtype=np.float64))
        res = optimize_batch(calc, coords[None].astype(np.float64), fmax=0.05, max_steps=2000)
        systems.append((z, np.asarray(res.coords[0], dtype=np.float64)))

    # charged species, relaxed under the site-constrained GFN-FF teacher —
    # the exact geometries/charges the pKa workflow produces
    # (fit_solvation.ion_cases: hydroxide/methoxide/formate/acetate anions,
    # ammonium/methylammonium cations)
    from firecode_tpu.calculators.fit_solvation import ion_cases

    for name, (z, x, charge, site, tgt) in ion_cases().items():
        systems.append((np.asarray(z), np.asarray(x), float(charge), site, tgt))
    return systems


def pick_teacher(name: str = "auto"):
    """Teacher factory + its name. "auto": the real xtb binary when it is
    installed (gated), else the native literature-anchored GFN-FF — NOT the
    LiteFF-R the student was circularly distilled from in round 2
    (VERDICT r2 item 2)."""
    from firecode_tpu.calculators.dispatcher import xtb_available

    if name == "auto":
        name = "xtb" if xtb_available() else "gfnff"
    if name == "xtb":
        from firecode_tpu.calculators.xtb_io import XTBHostCalculator

        return name, (
            lambda z, c, charge=0.0, site=None, site_tgt=None:
            XTBHostCalculator(z, charge=int(charge))
        )
    if name == "gfnff":
        from firecode_tpu.calculators.gfnff import GFNFF

        return name, (
            lambda z, c, charge=0.0, site=None, site_tgt=None: GFNFF(
                z, c, charge=int(charge), charge_site=site,
                site_charge_target=site_tgt,
            )
        )
    from firecode_tpu.calculators.reactive_ff import ReactiveFF

    return "liteff-r", lambda z, c: ReactiveFF(z)


def train_default_checkpoint(
    path: str | None = None, teacher: str = "auto", logfunction=print
) -> str:
    """Train and save the bundled CHNO checkpoint.

    The checkpoint records its teacher in metadata (`__teacher__`) so the
    provenance is auditable; the gated xtb teacher is used automatically
    when the binary is installed."""
    from pathlib import Path

    teacher_name, factory = pick_teacher(teacher)
    logfunction(f"  teacher: {teacher_name}")
    systems = _chno_training_systems()
    params = distill_systems(factory, systems, logfunction=logfunction)
    path = path or DEFAULT_CHECKPOINT
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        __import__("pathlib").Path(path).with_suffix(""),
        __teacher__=np.asarray(teacher_name),
        __n_systems__=np.asarray(len(systems)),
        **{k: np.asarray(v) for k, v in params.items()},
    )
    return path


def evaluate_checkpoint(path: str | None = None, seed: int = 12345) -> dict:
    """Held-out evaluation of a checkpoint (VERDICT r4 item 6) ->
    MLIP_EVAL.json content.

    1. Held-out MAE vs the teacher: FRESH augmented samples (different
       seed than training) for every corpus system, energy MAE and force
       RMSE per family (neutral CHNO / S+halogen / ions).
    2. Anchor subset at <= 2x the GFN-FF tolerance: ethane torsion
       barrier, butane gauche-anti gap, water-dimer binding — the physics
       the pipeline consumes from the in-box tier.
    """
    import os

    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff import GFNFF, fixtures as fx
    from firecode_tpu.opt.fire import optimize_batch

    path = path or DEFAULT_CHECKPOINT
    key = jax.random.PRNGKey(seed)
    _, factory = pick_teacher("gfnff")
    systems = _chno_training_systems()

    def family(z, q):
        if abs(q) > 0.5:
            return "ions"
        if any(int(zz) not in (1, 6, 7, 8) for zz in np.asarray(z)):
            return "s_halogen"
        return "chno"

    held_out: dict[str, dict] = {}
    for entry in systems:
        z, x, q, site, tgt = (*entry, 0.0, None, None)[:5]
        key, k_jit = jax.random.split(key)
        samples = _augmented_samples(z, x, 32, 0.12, k_jit)
        teacher = factory(np.asarray(z), np.asarray(x), charge=q, site=site,
                          site_tgt=tgt)
        e_t, f_t = teacher.energy_and_forces(jnp.asarray(samples))
        student = MLIPCalculator.load(path, np.asarray(z), q)
        e_s, f_s = student.energy_and_forces(jnp.asarray(samples))
        fam = held_out.setdefault(
            family(z, q), {"e_abs_err": [], "f_sq_err": []}
        )
        fam["e_abs_err"].extend(np.abs(np.asarray(e_s - e_t)).tolist())
        fam["f_sq_err"].extend(
            np.mean(np.asarray(f_s - f_t) ** 2, axis=(1, 2)).tolist()
        )
    families = {
        name: {
            "e_mae_kcal": round(float(np.mean(v["e_abs_err"])), 3),
            "f_rmse_kcal_A": round(float(np.sqrt(np.mean(v["f_sq_err"]))), 3),
            "n_samples": len(v["e_abs_err"]),
        }
        for name, v in held_out.items()
    }

    # anchor subset at <= 2x tolerance
    from firecode_tpu.graphs import graphize
    from firecode_tpu.ops.torsion_ops import rotate_dihedral
    from firecode_tpu.torsions import find_torsions

    anchors = {}

    def relax(z, x, q=0.0):
        calc = MLIPCalculator.load(path, np.asarray(z), q)
        res = optimize_batch(calc, jnp.asarray(x, jnp.float32)[None],
                             fmax=0.05, max_steps=2000)
        return np.asarray(res.coords[0]), float(res.energy[0])

    def sp(z, x, q=0.0):
        calc = MLIPCalculator.load(path, np.asarray(z), q)
        e, _ = calc.energy_and_forces(jnp.asarray(x, jnp.float32))
        return float(e)

    def record_anchor(name, value):
        tgt, tol = fx.TARGETS[name]
        anchors[name] = {
            "value": round(value, 3), "target": tgt, "tol_2x": 2 * tol,
            "ok": bool(abs(value - tgt) <= 2 * tol),
        }

    # ethane rigid torsion barrier (the H-only rotor is excluded from
    # find_torsions as a dummy rotation, so build the quadruplet by hand:
    # H-C-C-H with one methyl's hydrogens as the moving set)
    z, x = fx.ethane()
    x0, e0 = relax(z, x)
    graph = graphize(np.asarray(z), np.asarray(x))
    c0, c1 = [i for i in range(len(z)) if z[i] == 6][:2]
    h0 = next(j for j in graph.neighbors(c0) if z[j] == 1)
    h1 = next(j for j in graph.neighbors(c1) if z[j] == 1)
    mask = np.zeros(len(z), bool)
    for j in graph.neighbors(c1):
        if z[j] == 1:
            mask[j] = True
    x_ecl = np.asarray(rotate_dihedral(
        jnp.asarray(x0, jnp.float32)[None],
        jnp.asarray(np.asarray([h0, c0, c1, h1], np.int32)),
        jnp.asarray([60.0], jnp.float32), jnp.asarray(mask),
    )[0])
    record_anchor("ethane_barrier", sp(z, x_ecl) - e0)

    # butane gauche-anti gap
    z, x = fx.butane()
    x_anti, e_anti = relax(z, x)
    graph = graphize(np.asarray(z), np.asarray(x))
    tors = find_torsions(graph, np.asarray(z), np.asarray(x))
    cc = max(tors, key=lambda t: int(np.sum(t.mask)))
    x_g = np.asarray(rotate_dihedral(
        jnp.asarray(x_anti, jnp.float32)[None],
        jnp.asarray(np.asarray(cc.quadruplet, np.int32)),
        jnp.asarray([120.0], jnp.float32), jnp.asarray(cc.mask),
    )[0])
    _, e_g = relax(z, x_g)
    record_anchor("butane_gauche", e_g - e_anti)

    # water dimer binding
    z, x = fx.water_dimer()
    _, e_cplx = relax(z, x)
    x_sep = np.asarray(x, np.float64).copy()
    x_sep[3:] += np.array([40.0, 0.0, 0.0])
    _, e_sep = relax(z, x_sep)
    record_anchor("water_dimer_de", e_sep - e_cplx)

    n_ok = sum(a["ok"] for a in anchors.values())
    meta = {}
    if os.path.exists(path):
        data = np.load(path)
        meta = {
            k.strip("_"): str(data[k]) for k in data.files if k.startswith("__")
        }
    return {
        "checkpoint": os.path.basename(path),
        **meta,
        "held_out": families,
        "anchors": anchors,
        "anchor_pass_rate": round(n_ok / max(len(anchors), 1), 3),
    }


def load_mlip(atomnos: np.ndarray, path: str | None = None) -> MLIPCalculator:
    """Load an MLIP checkpoint (bundled CHNO one by default) for a system."""
    import os
    from pathlib import Path

    from firecode_tpu.errors import MissingExternalError

    path = path or os.environ.get("FIRECODE_TPU_MLIP_PATH", DEFAULT_CHECKPOINT)
    if not Path(path).exists():
        raise MissingExternalError(
            f"MLIP checkpoint not found at {path}. Train one with "
            "`python -m firecode_tpu.calculators.mlip` or point "
            "FIRECODE_TPU_MLIP_PATH at a checkpoint."
        )
    return MLIPCalculator.load(path, atomnos)


if __name__ == "__main__":
    import json
    import sys

    out = train_default_checkpoint()
    print(f"checkpoint written to {out}")
    if "--no-eval" not in sys.argv:
        report = evaluate_checkpoint(out)
        eval_path = __import__("os").path.join(
            __import__("os").path.dirname(__file__), "..", "..", "MLIP_EVAL.json"
        )
        eval_path = __import__("os").path.abspath(eval_path)
        with open(eval_path, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"eval written to {eval_path}")
        print(json.dumps(report, indent=1))
