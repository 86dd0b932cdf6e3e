"""Batched FIRE optimizer with per-lane ragged convergence.

Replaces the reference's per-structure ASE LBFGS/FIRE loops dispatched over a
process pool (firecode/embedder.py:2085-2242): here the whole ensemble is one
jitted while_loop — converged lanes freeze via masks, every live lane shares
the same compiled step, and the calculator evaluates all conformers at once.
FIRE needs no line search or history, which makes it the natural vmap choice
(SURVEY.md section 7, stage 5).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from firecode_tpu.calculators.base import Calculator, efs_for


class OptResult(NamedTuple):
    coords: jnp.ndarray  # f[B, N, 3]
    energy: jnp.ndarray  # f[B]
    fmax: jnp.ndarray  # f[B] residual max force component norm
    converged: jnp.ndarray  # bool[B]
    n_steps: jnp.ndarray  # i32 total steps taken


class _FireState(NamedTuple):
    coords: jnp.ndarray
    v: jnp.ndarray
    dt: jnp.ndarray  # f[B]
    alpha: jnp.ndarray  # f[B]
    n_pos: jnp.ndarray  # i32[B]
    converged: jnp.ndarray  # bool[B]
    step: jnp.ndarray  # i32
    n_live0: jnp.ndarray = ()  # i32: lanes live at the round's first step
    aux: tuple = ()  # calculator warm-start state (empty for stateless)


_DT_START = 0.02
_DT_MAX = 0.1
_F_INC = 1.1
_F_DEC = 0.5
_ALPHA0 = 0.25
_F_ALPHA = 0.99
_N_MIN = 5
_MAXSTEP = 0.2  # max per-atom displacement per step, Angstrom


def _fire_step(efs, move_mask, fmax_thr, real_mask, state: _FireState) -> _FireState:
    coords, v = state.coords, state.v
    _, f, aux = efs(coords, state.aux)
    f = f * move_mask[..., None]

    # convergence is judged at the CURRENT coords, before moving, so lanes
    # freeze exactly at the first geometry that satisfies fmax
    per_atom_f = jnp.sqrt(jnp.sum(f * f, axis=-1))
    fmax_now = jnp.max(per_atom_f, axis=-1)
    converged = state.converged | (fmax_now < fmax_thr)
    # live-lane count at the round's first step: the early-exit fraction is
    # measured against THIS set, so lanes already converged on entry (e.g.
    # the full-batch no-compaction path in later rounds) don't inflate it.
    # Only REAL lanes count — compaction ghost-pads buckets with duplicates
    # and the mesh path pads to the device count; counting those would shift
    # the exit step with the batch makeup and break the bit-identity of
    # compacted vs uncompacted runs.
    n_live0 = jnp.where(
        state.step == 0,
        jnp.sum(~converged & real_mask).astype(state.n_live0.dtype),
        state.n_live0,
    )

    f_norm = jnp.sqrt(jnp.sum(f * f, axis=(-2, -1), keepdims=True)) + 1e-12
    v_norm = jnp.sqrt(jnp.sum(v * v, axis=(-2, -1), keepdims=True))
    power = jnp.sum(f * v, axis=(-2, -1))  # [B]

    uphill = power <= 0.0
    n_pos = jnp.where(uphill, 0, state.n_pos + 1)
    grow = (~uphill) & (n_pos > _N_MIN)
    dt = jnp.where(grow, jnp.minimum(state.dt * _F_INC, _DT_MAX), state.dt)
    dt = jnp.where(uphill, state.dt * _F_DEC, dt)
    alpha = jnp.where(grow, state.alpha * _F_ALPHA, state.alpha)
    alpha = jnp.where(uphill, _ALPHA0, alpha)

    v = jnp.where(uphill[:, None, None], 0.0, v)
    a = alpha[:, None, None]
    v = (1.0 - a) * v + a * v_norm * f / f_norm
    v = v + dt[:, None, None] * f

    dx = dt[:, None, None] * v
    # per-atom step clipping
    step_len = jnp.sqrt(jnp.sum(dx * dx, axis=-1, keepdims=True)) + 1e-12
    dx = dx * jnp.minimum(1.0, _MAXSTEP / step_len)

    live = ~converged
    coords = coords + dx * live[:, None, None]
    v = v * live[:, None, None]

    return _FireState(
        coords, v, dt, alpha, n_pos, converged, state.step + 1, n_live0, aux
    )


@partial(jax.jit, static_argnames=("calc",))
def _optimize_batch_jit(
    coords, move_mask, fmax_thr, calc: Calculator, max_steps: int,
    exit_frac=1.0, real_mask=None,
):
    b = coords.shape[0]
    if real_mask is None:
        real_mask = jnp.ones((b,), dtype=bool)
    # stateful calculators (GFN-FF variational EEQ) carry a warm-start
    # state through the loop: the inner solve restarts from the previous
    # step's solution, cutting its per-step cost several-fold
    efs, aux_init = efs_for(calc)
    aux0 = aux_init(coords)

    state = _FireState(
        coords=coords,
        v=jnp.zeros_like(coords),
        dt=jnp.full((b,), _DT_START, dtype=coords.dtype),
        alpha=jnp.full((b,), _ALPHA0, dtype=coords.dtype),
        n_pos=jnp.zeros((b,), dtype=jnp.int32),
        converged=jnp.zeros((b,), dtype=bool),
        step=jnp.asarray(0, dtype=jnp.int32),
        n_live0=jnp.asarray(b, dtype=jnp.int32),
        aux=aux0,
    )

    step_fn = partial(_fire_step, efs, move_mask, fmax_thr, real_mask)
    # a round may end once the live set has shrunk to (1 - exit_frac) of its
    # first-step size — survivors continue next round (usually compacted)
    # with a fresh FIRE restart, which the stall measurements favor anyway.
    # exit_frac=1.0 reduces exactly to the all-converged criterion.
    frac = jnp.asarray(exit_frac, coords.dtype)

    def cond(s: _FireState):
        still_live = jnp.sum(~s.converged & real_mask).astype(jnp.int32)
        floor = ((1.0 - frac) * s.n_live0.astype(coords.dtype)).astype(jnp.int32)
        return (s.step < max_steps) & (still_live > floor)

    state = lax.while_loop(cond, lambda s: step_fn(s), state)

    e, f, _ = efs(state.coords, state.aux)
    f = f * move_mask[..., None]
    fmax_res = jnp.max(jnp.sqrt(jnp.sum(f * f, axis=-1)), axis=-1)
    return OptResult(
        coords=state.coords,
        energy=e,
        fmax=fmax_res,
        converged=state.converged | (fmax_res < fmax_thr),
        n_steps=state.step,
    )


# --- Newton-CG polish for straggler lanes -----------------------------------
#
# FIRE's step length is capped by the stiffest modes, so lanes whose residual
# force lives in a shallow mode (soft torsions, H-bond librations) crawl: on
# TPU GFN-FF ensembles a tail of lanes stalls at fmax 1.1-1.5x the threshold
# for thousands of steps. Near the minimum Newton's method is quadratically
# convergent and mode-stiffness-blind; the Hessian is never materialized —
# CG solves H s = f with Hessian-vector products (jvp of the autodiff
# forces), Steihaug-style: on negative curvature the lane bails out along the
# current descent direction. A 4-point backtracking line accepts the longest
# non-energy-raising scale, so the polish can never un-relax a structure.

_POLISH_NEWTON = 6
_POLISH_CG = 12
_POLISH_TRUST = 0.15  # max per-atom displacement in one Newton step, Angstrom


def _lane_dot(a, b):
    return jnp.sum(a * b, axis=(-2, -1))


@partial(jax.jit, static_argnames=("calc", "n_newton", "cg_iters"))
def _newton_polish_jit(coords, converged, move_mask, fmax_thr, calc: Calculator,
                       n_newton: int, cg_iters: int):
    mask3 = move_mask[..., None]

    def masked_forces(c):
        return calc.energy_and_forces(c)[1] * mask3

    scales = jnp.asarray([1.0, 0.5, 0.25, 0.125], coords.dtype)

    def newton_iter(_, carry):
        x, converged = carry
        e0, f = calc.energy_and_forces(x)
        f = f * mask3
        fmax_now = jnp.max(jnp.sqrt(jnp.sum(f * f, axis=-1)), axis=-1)
        converged = converged | (fmax_now < fmax_thr)
        live = ~converged
        b = f
        b_norm = jnp.sqrt(_lane_dot(b, b))

        def hvp(p):
            return -jax.jvp(masked_forces, (x,), (p,))[1]

        def cg_body(_, cg):
            s, r, p, rs, active = cg
            ap = hvp(p)
            curv = _lane_dot(p, ap)
            ok = active & (curv > 1e-12)
            alpha = jnp.where(ok, rs / jnp.maximum(curv, 1e-12), 0.0)
            s = s + alpha[:, None, None] * p
            r = r - alpha[:, None, None] * ap
            rs_new = _lane_dot(r, r)
            active = ok & (jnp.sqrt(rs_new) > 1e-4 * b_norm)
            beta = jnp.where(active, rs_new / jnp.maximum(rs, 1e-30), 0.0)
            p = r + beta[:, None, None] * p
            return s, r, p, rs_new, active

        s0 = jnp.zeros_like(x)
        rs0 = _lane_dot(b, b)
        active0 = live & (rs0 > 0.0)
        s, _, _, _, _ = lax.fori_loop(
            0, cg_iters, cg_body, (s0, b, b, rs0, active0)
        )
        # negative curvature on the very first CG step leaves s = 0: bail out
        # along the (descent) gradient instead so the lane still moves
        s_is_zero = _lane_dot(s, s) == 0.0
        s = jnp.where((s_is_zero & live)[:, None, None], b, s)

        # trust region: uniform per-lane rescale so no atom moves > trust
        max_atom = jnp.max(jnp.sqrt(jnp.sum(s * s, axis=-1)), axis=-1)
        s = s * jnp.minimum(1.0, _POLISH_TRUST / (max_atom + 1e-12))[:, None, None]
        s = s * live[:, None, None]

        # backtracking: longest scale that does not raise the energy
        def scan_scale(found, sc):
            e_try = calc.energy(x + sc * s)
            ok = (e_try <= e0 + 1e-6) & live & (found < 0.0)
            return jnp.where(ok, sc, found), None

        found, _ = lax.scan(scan_scale, jnp.full(e0.shape, -1.0, coords.dtype), scales)
        x = x + jnp.maximum(found, 0.0)[:, None, None] * s
        return x, converged

    coords, converged = lax.fori_loop(0, n_newton, newton_iter, (coords, converged))
    e, f = calc.energy_and_forces(coords)
    f = f * mask3
    fmax_res = jnp.max(jnp.sqrt(jnp.sum(f * f, axis=-1)), axis=-1)
    return coords, e, fmax_res, converged | (fmax_res < fmax_thr)


# (calc, constraint-content) -> composed calculator, so repeated
# optimize_batch calls reuse one jit cache entry. Keys hold the calculator
# OBJECT (identity hash keeps it alive, so ids cannot be recycled into
# aliased entries) plus the constraint tables BY VALUE; the cache is bounded.
_COMPOSED: "dict" = {}
_COMPOSED_MAX = 64


def _composed_calc(calc: Calculator, constraints) -> Calculator:
    key = (calc, constraints.signature())
    hit = _COMPOSED.get(key)
    if hit is None:
        if len(_COMPOSED) >= _COMPOSED_MAX:
            _COMPOSED.pop(next(iter(_COMPOSED)))
        hit = _COMPOSED[key] = calc.with_extra(constraints.energy_fn())
    return hit


def optimize_batch_host(
    calc: Calculator,
    coords,
    constraints=None,
    fmax: float = 0.05,
    max_steps: int = 1000,
    atom_mask=None,
) -> OptResult:
    """Batched FIRE on a HOST calculator (xtb subprocesses, AIMNet2/UMA torch
    models, ASE objects): the same update rule as the jitted device loop,
    driven in numpy with ONE batched calc.energy_and_forces call per step —
    the torch/subprocess cost amortizes over the whole batch exactly like the
    reference running ASE's FIRE on its ML calculators
    (firecode/ase_manipulations.py:171-260).

    Constraint penalties and their gradients are evaluated with jax (the
    same differentiable terms as the device path) and added on host, so
    constrained optimization works identically on host calculators."""
    import numpy as _np

    coords = _np.array(coords, dtype=_np.float64)
    squeeze = coords.ndim == 2
    if squeeze:
        coords = coords[None]
    b, n = coords.shape[0], coords.shape[1]
    move = (
        _np.asarray(constraints.move_mask(n), dtype=bool)
        if constraints is not None
        else _np.ones(n, dtype=bool)
    )
    if atom_mask is not None:
        move = move & _np.asarray(atom_mask, dtype=bool)
    move_b = _np.broadcast_to(move, (b, n))[..., None].astype(_np.float64)

    pen_eg = None
    if constraints is not None:
        pen_fn = constraints.energy_fn()
        pen_eg = jax.jit(jax.vmap(jax.value_and_grad(pen_fn)))

    def efs(c):
        e, f = calc.energy_and_forces(c)
        e = _np.asarray(e, dtype=_np.float64)
        f = _np.asarray(f, dtype=_np.float64)
        if pen_eg is not None:
            pe, pg = pen_eg(jnp.asarray(c))
            e = e + _np.asarray(pe)
            f = f - _np.asarray(pg)
        return e, f * move_b

    v = _np.zeros_like(coords)
    dt = _np.full(b, _DT_START)
    alpha = _np.full(b, _ALPHA0)
    n_pos = _np.zeros(b, dtype=int)
    converged = _np.zeros(b, dtype=bool)
    dead = _np.zeros(b, dtype=bool)  # lanes that went non-finite
    prev = coords.copy()
    e = _np.zeros(b)
    steps = 0
    for steps in range(max_steps):
        e_now, f = efs(coords)
        # a lane whose host model returns NaN/Inf (atoms driven into a
        # singularity of the PES) is frozen at its last finite geometry and
        # reported unconverged — mirrors the driver's 1e10 failure masks
        bad = ~(
            _np.isfinite(f).all(axis=(-2, -1)) & _np.isfinite(e_now)
        ) & ~dead
        if bad.any():
            coords = _np.where(bad[:, None, None], prev, coords)
            f = _np.where(bad[:, None, None], 0.0, f)
            e_now = _np.where(bad, e, e_now)
            dead |= bad
        prev = coords.copy()
        e = _np.where(converged | dead, e, e_now)
        fmax_now = _np.sqrt((f * f).sum(-1)).max(-1)
        converged |= (fmax_now < fmax) & ~dead
        if (converged | dead).all():
            break
        f_norm = _np.sqrt((f * f).sum((-2, -1), keepdims=True)) + 1e-12
        v_norm = _np.sqrt((v * v).sum((-2, -1), keepdims=True))
        power = (f * v).sum((-2, -1))
        uphill = power <= 0.0
        n_pos = _np.where(uphill, 0, n_pos + 1)
        grow = (~uphill) & (n_pos > _N_MIN)
        dt = _np.where(grow, _np.minimum(dt * _F_INC, _DT_MAX), dt)
        dt = _np.where(uphill, dt * _F_DEC, dt)
        alpha = _np.where(grow, alpha * _F_ALPHA, alpha)
        alpha = _np.where(uphill, _ALPHA0, alpha)
        v = _np.where(uphill[:, None, None], 0.0, v)
        a = alpha[:, None, None]
        v = (1.0 - a) * v + a * v_norm * f / f_norm
        v = v + dt[:, None, None] * f
        dx = dt[:, None, None] * v
        step_len = _np.sqrt((dx * dx).sum(-1, keepdims=True)) + 1e-12
        dx = dx * _np.minimum(1.0, _MAXSTEP / step_len)
        live = (~converged & ~dead)[:, None, None]
        coords = coords + dx * live
        v = v * live

    e_res, f_res = efs(coords)
    fmax_res = _np.sqrt((f_res * f_res).sum(-1)).max(-1)
    res = OptResult(
        coords=jnp.asarray(coords),
        energy=jnp.asarray(e_res),
        fmax=jnp.asarray(fmax_res),
        converged=jnp.asarray(converged | (fmax_res < fmax)),
        n_steps=jnp.asarray(steps + 1, dtype=jnp.int32),
    )
    if squeeze:
        res = OptResult(
            res.coords[0], res.energy[0], res.fmax[0], res.converged[0], res.n_steps
        )
    return res


def optimize_batch(
    calc: Calculator,
    coords,
    constraints=None,
    fmax: float = 0.05,
    max_steps: int = 1000,
    batch_chunk: int = 16384,
    restarts: int = 4,
    mesh=None,
    atom_mask=None,
    polish: bool = True,
    compact: bool | None = None,
    tail_cycles: int = 2,
    round_exit_frac: float = 0.9,
) -> OptResult:
    """FIRE-relax a conformer batch [B, N, 3] on the given calculator.

    constraints: optional firecode_tpu.opt.constraints.Constraints — penalty
    terms are added to the energy and frozen atoms masked out of the update.
    fmax in kcal/mol/A (max per-atom force norm). Batches larger than
    batch_chunk are processed in chunks to bound device memory.

    atom_mask: optional bool[N] or bool[B, N] — False lanes are padding
    (bucketed variable-size molecules): they are frozen out of the update
    and excluded from the convergence criterion.

    mesh: optional jax.sharding.Mesh with an "ens" axis — the batch axis is
    sharded over it and the whole FIRE while_loop runs data-parallel across
    the devices (XLA propagates the input sharding; the only collective is
    the all-converged reduction in the loop predicate). This is the TPU
    replacement for the reference's ProcessPoolExecutor over structures
    (firecode/embedder.py:2085-2242).

    polish: after the FIRE rounds, lanes still above fmax get a few
    matrix-free Newton-CG steps (Hessian-vector products via jvp of the
    autodiff forces, Steihaug negative-curvature bail-out, energy-monotone
    backtracking). FIRE's dt is capped by the stiffest modes, so residual
    force in a shallow mode decays slowly; Newton is stiffness-blind and
    finishes those straggler lanes in a handful of iterations.

    The step budget is split into `restarts` rounds with velocities re-zeroed
    between rounds: FIRE's dt collapses after uphill events and regrows
    slowly, so periodic restarts substantially improve tail convergence on
    mixed stiff/soft mode spectra (empirically ~3x more converged lanes at
    the same total step count for long alkanes).

    compact: gather unconverged lanes into power-of-2 buckets between
    rounds (and before the polish) so later rounds don't pay full-batch
    compute for frozen lanes. Rounds reset all per-lane state, so lane
    trajectories (coords, convergence) are bit-identical either way;
    reported energies/fmax agree to f32 reduction-order noise (different
    batch shapes fuse reductions differently — measured ~1e-7 relative).
    Each new bucket size costs one compile. Default (None): on for
    unsharded batches >= 512.

    tail_cycles: extra fresh-restart passes over the (gathered) stalled
    tail after the scheduled rounds + polish — a stalled FIRE lane almost
    always converges given a fresh full budget. Each cycle costs
    ~bucket/B of a full pass; stops early on an all-stalled cycle.

    round_exit_frac: intermediate rounds may end once this fraction of
    their first-step live lanes has converged — the surviving tail moves
    to the next round (compacted, freshly restarted) instead of holding
    the full batch on device. The last round and the tail cycles always
    run to full convergence or budget. 1.0 disables the early exit.

    Host calculators (calc.host_only — xtb subprocesses, AIMNet2/UMA torch
    models) are not traceable and route to optimize_batch_host.
    """
    if getattr(calc, "host_only", False):
        return optimize_batch_host(
            calc,
            coords,
            constraints=constraints,
            fmax=fmax,
            max_steps=max_steps,
            atom_mask=atom_mask,
        )
    coords = jnp.asarray(coords)
    squeeze = coords.ndim == 2
    if squeeze:
        coords = coords[None]
    if coords.shape[0] > batch_chunk:
        parts = [
            optimize_batch(
                calc,
                coords[start : start + batch_chunk],
                constraints=constraints,
                fmax=fmax,
                max_steps=max_steps,
                batch_chunk=batch_chunk,
                mesh=mesh,
                polish=polish,
                compact=compact,
                tail_cycles=tail_cycles,
                atom_mask=(
                    atom_mask[start : start + batch_chunk]
                    if atom_mask is not None and jnp.ndim(atom_mask) == 2
                    else atom_mask
                ),
            )
            for start in range(0, coords.shape[0], batch_chunk)
        ]
        import numpy as _np

        return OptResult(
            coords=jnp.concatenate([p.coords for p in parts]),
            energy=jnp.concatenate([p.energy for p in parts]),
            fmax=jnp.concatenate([p.fmax for p in parts]),
            converged=jnp.concatenate([p.converged for p in parts]),
            n_steps=jnp.asarray(int(_np.max([int(p.n_steps) for p in parts]))),
        )
    b_in = coords.shape[0]
    pad = 0
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(mesh.devices.size)
        pad = (-b_in) % n_dev
        if pad:
            coords = jnp.concatenate([coords, coords[-1:].repeat(pad, axis=0)])
            if atom_mask is not None and jnp.ndim(atom_mask) == 2:
                atom_mask = jnp.concatenate(
                    [atom_mask, atom_mask[-1:].repeat(pad, axis=0)]
                )
        coords = jax.device_put(coords, NamedSharding(mesh, P("ens")))
    n = coords.shape[-2]
    if constraints is not None:
        calc = _composed_calc(calc, constraints)
        move = jnp.asarray(constraints.move_mask(n))
    else:
        move = jnp.ones((n,), dtype=bool)
    if atom_mask is not None:
        # padded lanes are frozen and never count toward fmax convergence
        move = move & jnp.asarray(atom_mask)
    # rounds shorter than ~1000 steps reset dt before FIRE builds momentum;
    # clamp so restarts only kick in for generous budgets
    restarts = max(1, min(restarts, max_steps // 1000))
    steps_per_round = max(max_steps // restarts, 1)
    fmax_arr = jnp.asarray(fmax, coords.dtype)
    total_steps = 0

    # Between-round compaction: converged lanes are frozen but still COST
    # full compute under SPMD, so once a round converges >=25% of the batch
    # the survivors are gathered into a power-of-2 bucket (ghost-padded with
    # a duplicate of one live lane) and later rounds run on the smaller
    # batch. Rounds reset all per-lane FIRE state, so lane trajectories agree
    # with the uncompacted run to convergence precision (tested; XLA may
    # tile per-lane reductions differently per batch shape, so not
    # strictly bitwise); buckets are powers
    # of two to bound the number of distinct compiled shapes. Disabled under
    # a mesh (resharding mid-run is not worth it) and for small batches.
    b = coords.shape[0]
    if compact is None:
        compact = mesh is None and b >= 512 and restarts > 1
    else:
        compact = compact and mesh is None
    import numpy as _np

    final_coords = coords
    final_energy = jnp.zeros((b,), coords.dtype)
    final_fmax = jnp.full((b,), jnp.inf, coords.dtype)
    final_conv = jnp.zeros((b,), bool)
    cur_coords = coords
    cur_move = move
    cur_idx = _np.arange(b)  # original-batch index of each REAL lane
    # mesh-pad lanes (b_in..b) are duplicates and must not count toward the
    # round early-exit fraction; compaction refreshes this per bucket
    cur_real = _np.ones(b, dtype=bool)
    cur_real[b_in:] = False

    def _scatter(res, n_real):
        nonlocal final_coords, final_energy, final_fmax, final_conv
        idx = jnp.asarray(cur_idx)
        # explicit casts: under x64 the calculator may return f64 while the
        # accumulators carry the caller's dtype — an implicit f64->f32
        # scatter is a FutureWarning today and a hard error in future JAX
        final_coords = final_coords.at[idx].set(
            res.coords[:n_real].astype(final_coords.dtype)
        )
        final_energy = final_energy.at[idx].set(
            res.energy[:n_real].astype(final_energy.dtype)
        )
        final_fmax = final_fmax.at[idx].set(
            res.fmax[:n_real].astype(final_fmax.dtype)
        )
        final_conv = final_conv.at[idx].set(res.converged[:n_real])

    for r in range(restarts):
        # intermediate rounds may hand their stalled tail to the next
        # (compacted, freshly-restarted) round early; the last scheduled
        # round always runs to full convergence or budget
        frac = round_exit_frac if r < restarts - 1 else 1.0
        res = _optimize_batch_jit(
            cur_coords, cur_move, fmax_arr, calc, steps_per_round, frac,
            jnp.asarray(cur_real),
        )
        total_steps += int(res.n_steps)
        n_real = len(cur_idx)
        _scatter(res, n_real)
        conv_host = _np.asarray(res.converged[:n_real])
        if conv_host.all() or r == restarts - 1:
            break
        live = _np.where(~conv_host)[0]
        bucket = max(256, 1 << int(_np.ceil(_np.log2(len(live)))))
        if compact and conv_host.mean() >= 0.25 and bucket < n_real:
            padded = _np.concatenate(
                [live, _np.repeat(live[:1], bucket - len(live))]
            )
            cur_coords = jnp.take(res.coords, jnp.asarray(padded), axis=0)
            if cur_move.ndim == 2:
                cur_move = jnp.take(cur_move, jnp.asarray(padded), axis=0)
            cur_idx = cur_idx[live]
            cur_real = _np.zeros(bucket, dtype=bool)
            cur_real[: len(live)] = True
        else:
            cur_coords = res.coords

    if polish and not bool(jnp.all(final_conv)):
        # straggler lanes: a few matrix-free Newton-CG steps finish what
        # FIRE's stiff-mode-capped dt cannot (see _newton_polish_jit);
        # compacted the same way as the rounds
        conv_host = _np.asarray(final_conv)
        live = _np.where(~conv_host)[0]
        bucket = max(256, 1 << int(_np.ceil(_np.log2(len(live)))))
        if compact and bucket < b:
            padded = _np.concatenate(
                [live, _np.repeat(live[:1], bucket - len(live))]
            )
            pidx = jnp.asarray(padded)
            p_move = (
                jnp.take(move, pidx, axis=0) if move.ndim == 2 else move
            )
            p_coords, p_e, p_fmax, p_conv = _newton_polish_jit(
                jnp.take(final_coords, pidx, axis=0),
                jnp.zeros((bucket,), bool),
                p_move, fmax_arr, calc, _POLISH_NEWTON, _POLISH_CG,
            )
            lidx = jnp.asarray(live)
            n_live = len(live)
            final_coords = final_coords.at[lidx].set(p_coords[:n_live])
            final_energy = final_energy.at[lidx].set(p_e[:n_live])
            final_fmax = final_fmax.at[lidx].set(p_fmax[:n_live])
            final_conv = final_conv.at[lidx].set(p_conv[:n_live])
        else:
            p_coords, p_e, p_fmax, p_conv = _newton_polish_jit(
                final_coords, final_conv, move, fmax_arr, calc,
                _POLISH_NEWTON, _POLISH_CG,
            )
            final_coords, final_energy, final_fmax, final_conv = (
                p_coords, p_e, p_fmax, p_conv,
            )
    # Adaptive tail cycles: lanes that exhaust the scheduled rounds almost
    # always converge when given a FRESH full-budget restart (measured:
    # 23/24 f32 stragglers on a torsion-displaced alkane ensemble — the
    # fixed round schedule, not precision, was the blocker). The tail is
    # gathered into a power-of-2 bucket, so each extra cycle costs
    # ~bucket/B of a full pass. Runs whether or not mid-run compaction is
    # on (same gather machinery); skipped when the tail is not actually
    # small (bucket >= batch) or under a mesh.
    for _cycle in range(tail_cycles if mesh is None else 0):
        conv_host = _np.asarray(final_conv)
        if conv_host.all():
            break
        live = _np.where(~conv_host)[0]
        bucket = max(256, 1 << int(_np.ceil(_np.log2(len(live)))))
        if bucket >= b:
            break
        padded = _np.concatenate([live, _np.repeat(live[:1], bucket - len(live))])
        pidx = jnp.asarray(padded)
        cur = jnp.take(final_coords, pidx, axis=0)
        mv = jnp.take(move, pidx, axis=0) if move.ndim == 2 else move
        n_live = len(live)
        res = None
        for _ in range(restarts):
            res = _optimize_batch_jit(cur, mv, fmax_arr, calc, steps_per_round)
            cur = res.coords
            total_steps += int(res.n_steps)
            if bool(jnp.all(res.converged[:n_live])):
                break
        e_l, f_l, c_l = res.energy, res.fmax, res.converged
        if polish and not bool(jnp.all(res.converged[:n_live])):
            cur, e_l, f_l, c_l = _newton_polish_jit(
                cur, res.converged, mv, fmax_arr, calc,
                _POLISH_NEWTON, _POLISH_CG,
            )
        lidx = jnp.asarray(live)
        final_coords = final_coords.at[lidx].set(cur[:n_live])
        final_energy = final_energy.at[lidx].set(e_l[:n_live])
        final_fmax = final_fmax.at[lidx].set(f_l[:n_live])
        final_conv = final_conv.at[lidx].set(c_l[:n_live])
        if not bool(_np.asarray(c_l[:n_live]).any()):
            break  # no lane converged this cycle: stop burning budget

    res = OptResult(
        final_coords, final_energy, final_fmax, final_conv,
        jnp.asarray(total_steps),
    )
    if pad:
        res = OptResult(
            res.coords[:b_in],
            res.energy[:b_in],
            res.fmax[:b_in],
            res.converged[:b_in],
            res.n_steps,
        )
    if squeeze:
        res = OptResult(res.coords[0], res.energy[0], res.fmax[0], res.converged[0], res.n_steps)
    return res
