"""Batched Nudged Elastic Band.

Capability parity with the reference's ASE DyNEB pipeline
(firecode/ase_manipulations.py:453-684): image interpolation (with optional
TS-guess split), improved-tangent NEB forces, climbing image, and the staged
fmax schedule (0.2 -> 0.1 -> 0.05 -> CI with small maxstep).

TPU-first: the image axis is the batch axis — every force evaluation is ONE
batched calculator call over all images, and the whole band relaxes under a
single jitted FIRE loop (the reference evaluates one image at a time through
a shared ASE calculator).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from firecode_tpu.calculators.base import Calculator, efs_for


class NEBResult(NamedTuple):
    images: np.ndarray  # [M, N, 3]
    energies: np.ndarray  # [M]
    converged: bool
    ts_index: int
    ts_coords: np.ndarray
    ts_energy: float


def interpolate_band(
    start: np.ndarray,
    end: np.ndarray,
    n_images: int,
    ts_guess: np.ndarray | None = None,
) -> np.ndarray:
    """Linear interpolation start -> [ts_guess] -> end, n_images total."""
    if ts_guess is None:
        ts = np.linspace(0.0, 1.0, n_images)
        return np.stack([(1 - t) * start + t * end for t in ts])
    half = n_images // 2
    first = interpolate_band(start, ts_guess, half + 1)
    second = interpolate_band(ts_guess, end, n_images - half)
    return np.concatenate([first[:-1], second])


def idpp_interpolate(
    start: np.ndarray,
    end: np.ndarray,
    n_images: int,
    ts_guess: np.ndarray | None = None,
    fmax: float = 0.1,
    max_steps: int = 600,
) -> np.ndarray:
    """Image-Dependent Pair Potential interpolation (Smidstrup et al. 2014).

    Linear interpolation drags atoms through each other when groups rotate;
    IDPP instead relaxes each intermediate image toward interpolated pairwise
    DISTANCES: E_k = sum_{i<j} w_ij (d_ij(x) - t_ij,k)^2 with w = 1/d^4.
    Implemented as ONE batched relaxation: the whole band is a single
    "structure" of M*N atoms with frozen endpoints, reusing the standard
    FIRE machinery. Mirrors the reference's ASE idpp usage
    (firecode/ase_manipulations.py:486-551).
    """
    from firecode_tpu.calculators.base import Calculator
    from firecode_tpu.opt.constraints import Constraints
    from firecode_tpu.opt.fire import optimize_batch

    band = interpolate_band(start, end, n_images, ts_guess)
    m, n, _ = band.shape

    def pdist(c):
        diff = c[:, None, :] - c[None, :, :]
        return np.sqrt(np.sum(diff * diff, axis=-1) + 1e-12)

    d0, d1 = pdist(start), pdist(end)
    lam = np.linspace(0.0, 1.0, m)
    targets = np.stack([(1 - t) * d0 + t * d1 for t in lam])  # [M, N, N]
    weights = 1.0 / np.maximum(targets, 0.5) ** 4
    np.einsum("kii->ki", weights)[:] = 0.0

    targets_j = jnp.asarray(targets, jnp.float32)
    weights_j = jnp.asarray(weights, jnp.float32)

    def idpp_energy(flat_coords: jnp.ndarray) -> jnp.ndarray:
        c = flat_coords.reshape(m, n, 3)
        diff = c[:, :, None, :] - c[:, None, :, :]
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        dev = d - targets_j.astype(flat_coords.dtype)
        return 0.5 * jnp.sum(weights_j.astype(flat_coords.dtype) * dev * dev)

    calc = Calculator(idpp_energy, name="idpp")
    cons = Constraints().freeze_atoms(
        list(range(n)) + list(range((m - 1) * n, m * n))
    )
    res = optimize_batch(
        calc,
        band.reshape(m * n, 3).astype(np.float32),
        constraints=cons,
        fmax=fmax,
        max_steps=max_steps,
    )
    return np.asarray(res.coords, dtype=np.float64).reshape(m, n, 3)


def _neb_forces(efs, images, k_spring, climbing, aux):
    """True NEB forces for the whole band (improved tangent, optional CI).

    efs/aux: the stateful evaluator pair from calculators.base.efs_for —
    bands re-evaluate the calculator every FIRE step, so the GFN-FF
    variational EEQ warm start pays off exactly as in opt/fire.py."""
    e, f, aux = efs(images, aux)
    m = images.shape[0]

    prev_x = images[:-2]
    next_x = images[2:]
    cur_x = images[1:-1]
    e_prev, e_cur, e_next = e[:-2], e[1:-1], e[2:]

    d_next = next_x - cur_x
    d_prev = cur_x - prev_x

    # improved tangent (Henkelman & Jonsson 2000)
    up = (e_next > e_cur) & (e_cur > e_prev)
    down = (e_next < e_cur) & (e_cur < e_prev)
    de_max = jnp.maximum(jnp.abs(e_next - e_cur), jnp.abs(e_prev - e_cur))
    de_min = jnp.minimum(jnp.abs(e_next - e_cur), jnp.abs(e_prev - e_cur))
    higher_next = e_next > e_prev
    mixed = (
        d_next * jnp.where(higher_next, de_max, de_min)[:, None, None]
        + d_prev * jnp.where(higher_next, de_min, de_max)[:, None, None]
    )
    tau = jnp.where(
        up[:, None, None], d_next, jnp.where(down[:, None, None], d_prev, mixed)
    )
    tau = tau / (jnp.sqrt(jnp.sum(tau * tau, axis=(-2, -1), keepdims=True)) + 1e-12)

    f_inner = f[1:-1]
    f_par = jnp.sum(f_inner * tau, axis=(-2, -1), keepdims=True) * tau
    f_perp = f_inner - f_par

    norm_next = jnp.sqrt(jnp.sum(d_next * d_next, axis=(-2, -1), keepdims=True))
    norm_prev = jnp.sqrt(jnp.sum(d_prev * d_prev, axis=(-2, -1), keepdims=True))
    f_spring = k_spring * (norm_next - norm_prev) * tau

    neb_inner = f_perp + f_spring

    # climbing image: the highest-energy inner image inverts its parallel force
    i_max = jnp.argmax(e_cur)
    ci_force = f_inner - 2.0 * jnp.sum(f_inner * tau, axis=(-2, -1), keepdims=True) * tau
    is_ci = (jnp.arange(m - 2) == i_max)[:, None, None] & climbing
    neb_inner = jnp.where(is_ci, ci_force, neb_inner)

    zeros = jnp.zeros_like(images[:1])
    neb_f = jnp.concatenate([zeros, neb_inner, zeros])
    return e, neb_f, aux


@partial(jax.jit, static_argnames=("calc",))
def _neb_fire_jit(images, k_spring, fmax_thr, maxstep, climbing, calc: Calculator, max_steps: int):
    """Global FIRE over the whole band.

    The band forces are carried through the loop state so each iteration
    evaluates the calculator exactly ONCE (an earlier version recomputed
    _neb_forces in the while-loop condition, doubling the dominant cost).
    """
    dt0, dt_max = 0.02, 0.1
    f_inc, f_dec, alpha0, f_alpha, n_min = 1.1, 0.5, 0.25, 0.99, 5

    efs, aux_init = efs_for(calc)

    def step_fn(state):
        imgs, f, v, dt, alpha, n_pos, step, aux = state

        power = jnp.sum(f * v)
        uphill = power <= 0.0
        n_pos = jnp.where(uphill, 0, n_pos + 1)
        grow = (~uphill) & (n_pos > n_min)
        dt = jnp.where(grow, jnp.minimum(dt * f_inc, dt_max), dt)
        dt = jnp.where(uphill, dt * f_dec, dt)
        alpha = jnp.where(grow, alpha * f_alpha, alpha)
        alpha = jnp.where(uphill, alpha0, alpha)
        v = jnp.where(uphill, 0.0, v)

        f_norm = jnp.sqrt(jnp.sum(f * f)) + 1e-12
        v_norm = jnp.sqrt(jnp.sum(v * v))
        v = (1 - alpha) * v + alpha * v_norm * f / f_norm
        v = v + dt * f
        dx = dt * v
        step_len = jnp.sqrt(jnp.sum(dx * dx, axis=-1, keepdims=True)) + 1e-12
        dx = dx * jnp.minimum(1.0, maxstep / step_len)
        imgs = imgs + dx
        _, f_new, aux = _neb_forces(efs, imgs, k_spring, climbing, aux)
        return imgs, f_new, v, dt, alpha, n_pos, step + 1, aux

    def cond(state):
        f, step = state[1], state[6]
        fmax_now = jnp.max(jnp.sqrt(jnp.sum(f * f, axis=-1)))
        return (step < max_steps) & (fmax_now >= fmax_thr)

    aux0 = aux_init(images)
    _, f0, aux0 = _neb_forces(efs, images, k_spring, climbing, aux0)
    state = (
        images,
        f0,
        jnp.zeros_like(images),
        jnp.asarray(dt0, images.dtype),
        jnp.asarray(alpha0, images.dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        aux0,
    )
    state = lax.while_loop(cond, step_fn, state)
    imgs, f = state[0], state[1]
    e = calc.energy(imgs)
    fmax_res = jnp.max(jnp.sqrt(jnp.sum(f * f, axis=-1)))
    return imgs, e, fmax_res, state[6]


def _stage_schedule(climbing_image: bool):
    """The 4-phase fmax/maxstep/steps schedule shared by run_neb and
    run_neb_batch (mirrors the reference's DyNEB phases) — one definition so
    the two paths cannot silently diverge."""
    stages = [
        (0.2, 0.2, False, 1500),
        (0.1, 0.1, False, 1500),
        (0.05, 0.05, False, 2000),
    ]
    if climbing_image:
        stages.append((0.05, 0.01, True, 3000))
    return stages


def idpp_interpolate_batch(
    starts: np.ndarray,
    ends: np.ndarray,
    n_images: int,
    fmax: float = 0.1,
    max_steps: int = 600,
) -> np.ndarray:
    """IDPP interpolation of R bands AT ONCE: [R, N, 3] x2 -> [R, M, N, 3].

    Every band flattens to one (M*N)-atom "structure" and all R relax as a
    single optimize_batch call — a sequential per-band loop would serialize
    the setup of the batched NEB at exactly the ensemble scale it targets."""
    from firecode_tpu.calculators.base import Calculator
    from firecode_tpu.opt.constraints import Constraints
    from firecode_tpu.opt.fire import optimize_batch

    starts = np.asarray(starts, dtype=np.float64)
    ends = np.asarray(ends, dtype=np.float64)
    r, n, _ = starts.shape
    m = n_images
    bands = np.stack(
        [interpolate_band(s, e, m) for s, e in zip(starts, ends)]
    )  # [R, M, N, 3]

    def pdist(c):  # [R, N, 3] -> [R, N, N]
        diff = c[:, :, None, :] - c[:, None, :, :]
        return np.sqrt(np.sum(diff * diff, axis=-1) + 1e-12)

    d0, d1 = pdist(starts), pdist(ends)
    lam = np.linspace(0.0, 1.0, m)[None, :, None, None]
    targets = (1 - lam) * d0[:, None] + lam * d1[:, None]  # [R, M, N, N]
    weights = 1.0 / np.maximum(targets, 0.5) ** 4
    np.einsum("rkii->rki", weights)[:] = 0.0

    targets_j = jnp.asarray(targets, jnp.float32)
    weights_j = jnp.asarray(weights, jnp.float32)

    def idpp_energy(flat_coords: jnp.ndarray, band_id: jnp.ndarray) -> jnp.ndarray:
        c = flat_coords.reshape(m, n, 3)
        diff = c[:, :, None, :] - c[:, None, :, :]
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        dev = d - targets_j[band_id].astype(flat_coords.dtype)
        return 0.5 * jnp.sum(weights_j[band_id].astype(flat_coords.dtype) * dev * dev)

    # the per-band targets ride along as a virtual "atom" carrying the band
    # index, so one Calculator serves all bands under the standard vmap
    def energy_with_tag(flat_plus_tag: jnp.ndarray) -> jnp.ndarray:
        band_id = flat_plus_tag[-1, 0].astype(jnp.int32)
        return idpp_energy(flat_plus_tag[:-1], band_id)

    calc = Calculator(energy_with_tag, name="idpp-batch")
    cons = Constraints().freeze_atoms(
        list(range(n)) + list(range((m - 1) * n, m * n)) + [m * n]
    )
    flat = bands.reshape(r, m * n, 3).astype(np.float32)
    tags = np.zeros((r, 1, 3), dtype=np.float32)
    tags[:, 0, 0] = np.arange(r)
    res = optimize_batch(
        calc,
        np.concatenate([flat, tags], axis=1),
        constraints=cons,
        fmax=fmax,
        max_steps=max_steps,
    )
    out = np.asarray(res.coords, dtype=np.float64)[:, :-1]
    return out.reshape(r, m, n, 3)


class NEBBatchResult(NamedTuple):
    images: np.ndarray  # [R, M, N, 3]
    energies: np.ndarray  # [R, M]
    converged: np.ndarray  # bool[R]
    ts_index: np.ndarray  # i[R]
    ts_coords: np.ndarray  # [R, N, 3]
    ts_energy: np.ndarray  # f[R]


@partial(jax.jit, static_argnames=("calc",))
def _neb_fire_batch_jit(
    images_b, k_spring, fmax_thr, maxstep, climbing, calc: Calculator, max_steps: int
):
    """FIRE over MANY bands at once: images_b [R, M, N, 3].

    Each band carries its own FIRE state (dt, alpha, n_pos) and freezes when
    its residual drops below fmax_thr — R independent reactions relax as one
    device program (no per-reaction host loop)."""
    dt0, dt_max = 0.02, 0.1
    f_inc, f_dec, alpha0, f_alpha, n_min = 1.1, 0.5, 0.25, 0.99, 5
    r = images_b.shape[0]

    efs, aux_init = efs_for(calc)

    def band_forces(x, aux):
        def one(im, a):
            _, f, a2 = _neb_forces(efs, im, k_spring, climbing, a)
            return f, a2

        return jax.vmap(one)(x, aux)

    def band_fmax(f):
        return jnp.max(jnp.sqrt(jnp.sum(f * f, axis=-1)), axis=(-2, -1))  # [R]

    def step_fn(state):
        x, f, v, dt, alpha, n_pos, step, aux = state
        done = band_fmax(f) < fmax_thr  # [R]

        power = jnp.sum(f * v, axis=(-3, -2, -1))  # [R]
        uphill = power <= 0.0
        n_pos = jnp.where(uphill, 0, n_pos + 1)
        grow = (~uphill) & (n_pos > n_min)
        dt = jnp.where(grow, jnp.minimum(dt * f_inc, dt_max), dt)
        dt = jnp.where(uphill, dt * f_dec, dt)
        alpha = jnp.where(grow, alpha * f_alpha, alpha)
        alpha = jnp.where(uphill, alpha0, alpha)
        v = jnp.where(uphill[:, None, None, None], 0.0, v)

        f_norm = jnp.sqrt(jnp.sum(f * f, axis=(-3, -2, -1), keepdims=True)) + 1e-12
        v_norm = jnp.sqrt(jnp.sum(v * v, axis=(-3, -2, -1), keepdims=True))
        a_col = alpha[:, None, None, None]
        dt_col = dt[:, None, None, None]
        v = (1 - a_col) * v + a_col * v_norm * f / f_norm
        v = v + dt_col * f
        dx = dt_col * v
        step_len = jnp.sqrt(jnp.sum(dx * dx, axis=-1, keepdims=True)) + 1e-12
        dx = dx * jnp.minimum(1.0, maxstep / step_len)
        dx = jnp.where(done[:, None, None, None], 0.0, dx)
        x = x + dx
        f, aux = band_forces(x, aux)
        return x, f, v, dt, alpha, n_pos, step + 1, aux

    def cond(state):
        f, step = state[1], state[6]
        return (step < max_steps) & jnp.any(band_fmax(f) >= fmax_thr)

    aux0 = aux_init(images_b)
    f0, aux0 = band_forces(images_b, aux0)
    state = (
        images_b,
        f0,
        jnp.zeros_like(images_b),
        jnp.full((r,), dt0, images_b.dtype),
        jnp.full((r,), alpha0, images_b.dtype),
        jnp.zeros((r,), jnp.int32),
        jnp.asarray(0, jnp.int32),
        aux0,
    )
    x, f, *_ = lax.while_loop(cond, step_fn, state)
    e = calc.energy(x)  # [R, M] (Calculator.energy vmaps all leading dims)
    return x, e, band_fmax(f)


def run_neb_batch(
    calc: Calculator,
    starts: np.ndarray,
    ends: np.ndarray,
    n_images: int = 7,
    k_spring: float = 10.0,
    climbing_image: bool = True,
    interpolation: str = "idpp",
    logfunction=None,
) -> NEBBatchResult:
    """NEB over a whole BATCH of reactions [R, N, 3] x2 in one device
    program per stage — the ensemble-scale TS search the reference's
    one-band-at-a-time ASE pipeline cannot express."""
    log = logfunction or (lambda s: None)
    starts = np.asarray(starts, dtype=np.float64)
    ends = np.asarray(ends, dtype=np.float64)
    if interpolation == "idpp":
        bands = idpp_interpolate_batch(starts, ends, n_images)
    else:
        bands = np.stack(
            [interpolate_band(s, e, n_images) for s, e in zip(starts, ends)]
        )
    band = jnp.asarray(bands)

    stages = _stage_schedule(climbing_image)

    for fmax, maxstep, climb, max_steps in stages:
        band, e, fmax_res = _neb_fire_batch_jit(
            band,
            jnp.asarray(k_spring, band.dtype),
            jnp.asarray(fmax, band.dtype),
            jnp.asarray(maxstep, band.dtype),
            jnp.asarray(climb),
            calc,
            max_steps,
        )
        n_conv = int(jnp.sum(fmax_res < fmax))
        log(
            f"    batched NEB stage fmax={fmax}{' CI' if climb else ''}: "
            f"{n_conv}/{band.shape[0]} bands converged"
        )

    band_np = np.asarray(band, dtype=np.float64)
    e_np = np.asarray(e, dtype=np.float64)
    conv = np.asarray(fmax_res < stages[-1][0])
    ts_idx = np.argmax(e_np[:, 1:-1], axis=1) + 1
    rows = np.arange(len(band_np))
    return NEBBatchResult(
        images=band_np,
        energies=e_np,
        converged=conv,
        ts_index=ts_idx,
        ts_coords=band_np[rows, ts_idx],
        ts_energy=e_np[rows, ts_idx],
    )


def run_neb(
    calc: Calculator,
    start: np.ndarray,
    end: np.ndarray,
    n_images: int = 7,
    ts_guess: np.ndarray | None = None,
    images: np.ndarray | None = None,
    k_spring: float = 10.0,
    climbing_image: bool = True,
    interpolation: str = "idpp",
    logfunction=None,
) -> NEBResult:
    """Staged NEB relaxation; returns band + TS pick (argmax image energy)."""
    log = logfunction or (lambda s: None)
    if images is None:
        if interpolation == "idpp":
            images = idpp_interpolate(start, end, n_images, ts_guess)
        else:
            images = interpolate_band(start, end, n_images, ts_guess)
    band = jnp.asarray(images)

    # staged schedule mirroring the reference's 4 phases
    stages = _stage_schedule(climbing_image)

    converged = False
    for fmax, maxstep, climb, max_steps in stages:
        band, e, fmax_res, n_steps = _neb_fire_jit(
            band,
            jnp.asarray(k_spring, band.dtype),
            jnp.asarray(fmax, band.dtype),
            jnp.asarray(maxstep, band.dtype),
            jnp.asarray(climb),
            calc,
            max_steps,
        )
        converged = bool(fmax_res < fmax)
        log(
            f"    NEB stage fmax={fmax}{' CI' if climb else ''}: "
            f"residual {float(fmax_res):.3f} after {int(n_steps)} steps"
        )
        if not converged:
            break

    band_np = np.asarray(band, dtype=np.float64)
    e_np = np.asarray(e, dtype=np.float64)
    ts_index = int(np.argmax(e_np[1:-1])) + 1
    return NEBResult(
        images=band_np,
        energies=e_np,
        converged=converged,
        ts_index=ts_index,
        ts_coords=band_np[ts_index],
        ts_energy=float(e_np[ts_index]),
    )
