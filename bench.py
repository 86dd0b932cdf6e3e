"""North-star benchmark: full similarity-prune cascade wall-clock.

Generates a synthetic conformer ensemble of a 50-atom alkane on device
(random rigid rotations + coordinate jitter of clustered duplicates), then
times the full device cascade: MOI prune -> greedy QCP-RMSD prune (with
max-deviation criterion) -> rotamer-corrected RMSD on <=1e3 survivors.

Baseline target (BASELINE.md): 100k conformers through the cascade in < 10 s
on TPU. Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 10/seconds}

The timed pass is the second (steady-state) run; the first pass pays
compilation. Set FIRECODE_BENCH_CONFS to change the ensemble size.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _setup_compile_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache inside the repo.

    The round-4 driver bench lost every optional lane because the 1M stage's
    cold compile took 605 s in the driver environment (61 s on the builder's
    warmed session). The builder warms this cache during the round and commits
    it, so a driver run on the same backend/jax version hits warm compiles.
    Entries are small (~10-100 KB each). Override with
    JAX_COMPILATION_CACHE_DIR; disable with FIRECODE_BENCH_NO_CACHE=1.
    """
    if os.environ.get("FIRECODE_BENCH_NO_CACHE") == "1":
        return
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass


def make_ensemble(n_confs: int, seed: int = 0, dup: int = 4, chunk: int = 0):
    """Synthetic conformer ensemble with real structural diversity:
    n_confs/dup distinct ROTAMERS of hexadecane (random angles on every
    rotable torsion, driven on device) x dup near-duplicate copies each, plus
    random rigid motions — so both the MOI and the RMSD stages do real work.

    chunk > 0 generates in fixed-shape chunks written into a DONATED output
    buffer, so peak HBM stays coords + O(chunk) — the 1e7-conformer ensemble
    (6 GB of f32 coordinates) cannot afford the single-shot path's repeat/
    jitter/rotate/permute transients (5x coords)."""
    import jax
    import jax.numpy as jnp

    from firecode_tpu.graphs import graphize
    from firecode_tpu.ops.torsion_ops import rotate_dihedral
    from firecode_tpu.sample_molecules import build_alkane
    from firecode_tpu.torsions import find_torsions

    atomnos, base = build_alkane(16)  # 50 atoms
    n_distinct = max(n_confs // dup, 1)

    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    base = jnp.asarray(base, dtype=jnp.float32)
    n_atoms = base.shape[0]

    graph = graphize(atomnos, np.asarray(base))
    torsions = find_torsions(graph, atomnos, np.asarray(base))
    quads = jnp.asarray(np.stack([t.quadruplet for t in torsions]))
    masks = jnp.asarray(np.stack([t.mask for t in torsions]))

    @jax.jit
    def gen_distinct(base, k1):
        distinct = jnp.broadcast_to(base, (n_distinct, n_atoms, 3))
        keys = jax.random.split(k1, len(torsions))
        for t in range(len(torsions)):
            angles = jax.random.choice(
                keys[t], jnp.asarray([0.0, 120.0, 240.0], jnp.float32), (n_distinct,)
            )
            distinct = rotate_dihedral(distinct, quads[t], angles, masks[t])
        return distinct

    if not chunk:

        @jax.jit
        def generate(base, k1, k2, k3, k4):
            # ONE compiled program for the whole generation pipeline (per-op
            # eager dispatch is expensive on tunneled backends)
            from firecode_tpu.ops.algebra import quaternion_to_matrix

            distinct = gen_distinct(base, k1)
            reps = jnp.repeat(distinct, dup, axis=0)[:n_confs]
            reps = reps + 0.02 * jax.random.normal(k2, reps.shape, jnp.float32)

            quat = jax.random.normal(k3, (n_confs, 4), jnp.float32)
            quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
            rot = quaternion_to_matrix(quat)
            shift = 10.0 * jax.random.normal(k4, (n_confs, 1, 3), jnp.float32)
            coords = jnp.einsum("bxy,bny->bnx", rot, reps) + shift
            return coords[jax.random.permutation(k1, n_confs)]

        return atomnos, generate(base, k1, k2, k3, k4)

    # ---- chunked path ----
    from functools import partial

    from firecode_tpu.ops.algebra import quaternion_to_matrix

    distinct = gen_distinct(base, k1)
    # shuffle via a HOST permutation of (structure -> rotamer) assignments:
    # duplicates end up scattered exactly as the single-shot permutation
    # would scatter them, with no device-side 2x-coords permutation gather
    perm = np.random.default_rng(seed).permutation(n_confs).astype(np.int32)

    @partial(jax.jit, donate_argnums=(0,))
    def fill(out, distinct, idx, key, start):
        k2, k3, k4 = jax.random.split(key, 3)
        src = jnp.take(distinct, idx, axis=0)  # [chunk, N, 3]
        src = src + 0.02 * jax.random.normal(k2, src.shape, jnp.float32)
        quat = jax.random.normal(k3, (chunk, 4), jnp.float32)
        quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
        rot = quaternion_to_matrix(quat)
        shift = 10.0 * jax.random.normal(k4, (chunk, 1, 3), jnp.float32)
        c = jnp.einsum("bxy,bny->bnx", rot, src) + shift
        return jax.lax.dynamic_update_slice(out, c, (start, 0, 0))

    out = jnp.zeros((n_confs, n_atoms, 3), dtype=jnp.float32)
    n_full = n_confs // chunk
    starts = [i * chunk for i in range(n_full)]
    if n_confs % chunk:
        # one extra full-shape chunk over the tail rows (same compiled
        # program; the overlapped rows are simply regenerated)
        starts.append(n_confs - chunk)
    keys = jax.random.split(k2, len(starts))
    for i, s in enumerate(starts):
        idx = jnp.asarray(perm[s : s + chunk] // dup)
        out = fill(out, distinct, idx, keys[i], jnp.int32(s))
    return atomnos, out


def run_cascade(
    coords, atomnos: np.ndarray, block: int, perms: np.ndarray | None = None
) -> tuple[int, float, dict]:
    """Device-resident cascade: coordinates stay in HBM; only keep masks cross
    to host, and stage-to-stage compaction is a device gather.

    ALL three stages run unconditionally — the reference's CPU-era scale
    ceilings (MOI/RMSD <=1e5, rot-corr <=1e3) are exactly what this framework
    deletes. Returns (n_kept, total_s, per-stage breakdown)."""
    import jax.numpy as jnp

    from firecode_tpu.prune import prune_by_moi, prune_by_rmsd, prune_by_rmsd_rot_corr

    import jax

    coords = jnp.asarray(coords)
    coords.block_until_ready()
    n_dev = len(jax.devices())
    stages: dict = {"n_in": int(len(coords))}

    def compact(coords, keep):
        # device-side survivor gather: only ONE scalar (the count) crosses
        # to the host — shipping the 10 MB keep mask + index list through
        # the tunnel cost ~2 s per stage at the 1e7 point
        keep = jnp.asarray(keep)
        n = int(jnp.sum(keep))
        idx = jnp.sort(jnp.where(keep, jnp.arange(keep.shape[0]), keep.shape[0]))[:n]
        return jnp.take(coords, idx, axis=0)

    t0 = time.perf_counter()
    # the cheap MOI similarity favours LARGER blocks than the RMSD stages
    # (fewer triangular-loop iterations at 1e6): swept 512/1024/2048/4096 ->
    # 6.1/3.0/4.1/5.7 s for the 1M MOI stage (bigger blocks lose to the
    # sequential in-block resolve); the log-space ratio kernel then cut
    # 1024 to ~2.0 s
    keep = prune_by_moi(coords, atomnos, block=max(block, 1024), as_numpy=False)
    coords = compact(coords, keep)
    coords.block_until_ready()
    t1 = time.perf_counter()
    stages["moi_s"] = round(t1 - t0, 3)
    stages["n_after_moi"] = int(len(coords))

    if n_dev > 1 and len(coords) >= 1024 * n_dev:
        # multi-chip: distribute the column axis over the ICI mesh
        from firecode_tpu.parallel.sharded_prune import prune_by_rmsd_sharded

        keep = prune_by_rmsd_sharded(coords, rmsd_thr=0.5, block=min(block, 512))
    else:
        keep = prune_by_rmsd(coords, atomnos, rmsd_thr=0.5, block=block, as_numpy=False)
    coords = compact(coords, keep)
    coords.block_until_ready()
    t2 = time.perf_counter()
    stages["rmsd_s"] = round(t2 - t1, 3)
    stages["n_after_rmsd"] = int(len(coords))

    keep = prune_by_rmsd_rot_corr(
        coords, atomnos, permutations=perms, rmsd_thr=0.5, block=min(block, 256),
        as_numpy=False,
    )
    coords = compact(coords, keep)
    coords.block_until_ready()
    t3 = time.perf_counter()
    stages["rot_corr_s"] = round(t3 - t2, 3)
    stages["n_kept"] = int(len(coords))
    return len(coords), t3 - t0, stages


def bench_csearch(n_candidates: int | None = None) -> dict:
    """Secondary metric (BASELINE.md): torsion-scan geometries/sec/chip.

    Drives the full systematic angle grid of hexadecane (13 rotors) with the
    batched dihedral-driving kernel including the clash back-off, and reports
    steady-state geometries/second. Run with FIRECODE_BENCH_MODE=csearch.
    """
    import jax.numpy as jnp

    from firecode_tpu.csearch import _angle_grid, _drive_torsions, _torsion_masks
    from firecode_tpu.graphs import graphize
    from firecode_tpu.sample_molecules import build_alkane
    from firecode_tpu.torsions import find_torsions

    if n_candidates is None:
        n_candidates = int(os.environ.get("FIRECODE_BENCH_CONFS", "65536"))
    atomnos, coords = build_alkane(16)
    graph = graphize(atomnos, coords)
    torsions = find_torsions(graph, atomnos, coords)
    rng = np.random.default_rng(0)
    angles = _angle_grid(torsions, rng, n_candidates, shuffle=False)
    quads, moving, static = _torsion_masks(torsions, len(atomnos))

    def run(angle_arr):
        out, n_rot = _drive_torsions(
            jnp.asarray(coords, jnp.float32),
            jnp.asarray(quads),
            jnp.asarray(moving),
            jnp.asarray(static),
            jnp.asarray(angle_arr, jnp.float32),
            len(torsions),
        )
        out.block_until_ready()
        return out

    run(angles)  # compile
    # fresh (jittered) inputs per timed pass to defeat any result caching
    t0 = time.perf_counter()
    n_pass = 3
    for k in range(n_pass):
        run(angles + 0.001 * (k + 1))
    elapsed = (time.perf_counter() - t0) / n_pass
    rate = len(angles) / elapsed
    return {
        "metric": "torsion-scan geometries/sec/chip (13 rotors, 50 atoms, clash back-off)",
        "value": round(rate, 0),
        "unit": "geoms/s",
        "vs_baseline": round(rate / 1000.0, 2),
        "n_candidates": len(angles),
        "elapsed_s": round(elapsed, 3),
    }


def bench_gfnff_opt(batch: int | None = None, big: bool = True) -> dict:
    """Batched-optimization throughput of the default calculator (GFN-FF,
    variational EEQ included): conformer*steps/second for a hexadecane
    ensemble under batched FIRE. Run with FIRECODE_BENCH_MODE=gfnff."""
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff import GFNFF
    from firecode_tpu.opt.fire import optimize_batch
    from firecode_tpu.sample_molecules import build_alkane

    if batch is None:
        batch = int(os.environ.get("FIRECODE_BENCH_CONFS", "1024"))
    n_steps = 200
    rng = np.random.default_rng(0)

    def rate_for(atomnos, coords, eeq: str, nb: int) -> tuple[float, float]:
        ens = (
            coords[None] + 0.05 * rng.normal(size=(nb, *coords.shape))
        ).astype(np.float32)
        calc = GFNFF(atomnos, coords, eeq=eeq)

        def run(x):
            # fixed step budget (fmax 0 never converges a lane early) with the
            # straggler Newton polish off, so the measurement is exactly
            # nb * n_steps force evaluations
            res = optimize_batch(
                calc, jnp.asarray(x), fmax=0.0, max_steps=n_steps, restarts=1,
                polish=False,
            )
            res.coords.block_until_ready()

        run(ens)  # compile
        t0 = time.perf_counter()
        run(ens + 0.001)
        elapsed = time.perf_counter() - t0
        return nb * n_steps / elapsed, elapsed

    atomnos, coords = build_alkane(16)  # 50 atoms
    rate, elapsed = rate_for(atomnos, coords, "variational", batch)
    rate_topo, _ = rate_for(atomnos, coords, "topo", batch)

    record = {
        "metric": "GFN-FF batched FIRE throughput (50 atoms, EEQ solve per step)",
        "value": round(rate, 0),
        "unit": "conformer-steps/s",
        "vs_baseline": round(rate / 1000.0, 2),
        "batch": batch,
        "n_steps": n_steps,
        "elapsed_s": round(elapsed, 3),
        "topo_charges_value": round(rate_topo, 0),
    }
    if big:
        # production-scale lane: catalysis-size molecule (~200 atoms, 256
        # lanes). Per-step EEQ cost grows ~N^2 but is [N,N]@[N,2] MXU work,
        # so the big system amortizes far better than linear-in-atoms
        big_nc = int(os.environ.get("FIRECODE_BENCH_GFNFF_BIG_CARBONS", "66"))
        z_big, x_big = build_alkane(big_nc)  # 3*nc + 2 atoms (200 at nc=66)
        rate_big, _ = rate_for(z_big, x_big, "variational", 256)
        rate_big_topo, _ = rate_for(z_big, x_big, "topo", 256)
        record.update(
            {
                "big_n_atoms": int(len(z_big)),
                "big_batch": 256,
                "big_value": round(rate_big, 0),
                "big_topo_value": round(rate_big_topo, 0),
            }
        )
    return record


def bench_mtd() -> dict:
    """Native batched-metadynamics throughput: walker-steps/second for an
    RMSD-CV MTD swarm on the default calculator (GFN-FF, warm-started
    variational EEQ; two force evaluations per BAOAB step). The capability
    the CPU reference outsources to CREST one trajectory at a time
    (reference interfaces/crest.py:444). Run with FIRECODE_BENCH_MODE=mtd."""
    import jax
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff import GFNFF
    from firecode_tpu.md.metadynamics import _FS, _mtd_run
    from firecode_tpu.pt import MASSES
    from firecode_tpu.sample_molecules import build_alkane

    n_walkers = int(os.environ.get("FIRECODE_BENCH_MTD_WALKERS", "256"))
    n_steps = int(os.environ.get("FIRECODE_BENCH_MTD_STEPS", "2000"))
    dep_every = 100
    atomnos, coords = build_alkane(8)  # 26 atoms: csearch-size molecule
    calc = GFNFF(atomnos, coords)
    rng = np.random.default_rng(0)
    walkers = (
        coords[None] + 0.02 * rng.normal(size=(n_walkers, *coords.shape))
    ).astype(np.float32)
    masses = jnp.asarray(MASSES[np.asarray(atomnos)], jnp.float32)
    n_gauss = n_steps // dep_every + 1

    def run(x, seed):
        out = _mtd_run(
            jnp.asarray(x), masses, jax.random.PRNGKey(seed),
            jnp.asarray(500.0, jnp.float32), jnp.asarray(1.0 * _FS, jnp.float32),
            jnp.asarray(0.02 / _FS, jnp.float32), jnp.asarray(3.0, jnp.float32),
            jnp.asarray(0.6, jnp.float32), calc, n_steps, dep_every, n_gauss,
        )
        out[0].block_until_ready()

    run(walkers, 0)  # compile
    t0 = time.perf_counter()
    run(walkers, 1)
    elapsed = time.perf_counter() - t0
    return {
        "metric": "batched RMSD-metadynamics throughput (26 atoms, GFN-FF)",
        "value": round(n_walkers * n_steps / elapsed, 0),
        "unit": "walker-steps/s",
        "vs_baseline": round(n_walkers * n_steps / elapsed / 1000.0, 2),
        "n_walkers": n_walkers,
        "n_steps": n_steps,
        "elapsed_s": round(elapsed, 3),
    }


def bench_e2e(n_out: int | None = None) -> dict:
    """End-to-end conformer-pipeline wall-clock — the product loop the
    reference distributes over a CPU cluster (SURVEY.md section 3.3 +
    optimization_refining), here one device program chain on one chip:
    torsion csearch -> MOI/RMSD cascade -> batched loose GFN-FF FIRE ->
    energy window -> tight FIRE -> final rot-corr cascade.
    Run with FIRECODE_BENCH_MODE=e2e."""
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff import GFNFF
    from firecode_tpu.csearch import csearch
    from firecode_tpu.opt.fire import optimize_batch
    from firecode_tpu.prune import (
        prune_by_moi,
        prune_by_rmsd,
        prune_by_rmsd_rot_corr,
    )
    from firecode_tpu.sample_molecules import build_alkane

    if n_out is None:
        n_out = int(os.environ.get("FIRECODE_BENCH_E2E_CONFS", "2048"))
    z, x = build_alkane(12)  # 38 atoms, 9 rotatable C-C bonds
    calc = GFNFF(z, x)

    def pipeline() -> dict:
        t: dict = {}
        t0 = time.perf_counter()
        ens = csearch(z, x, n_out=n_out, seed=1)
        t["n_generated"] = int(len(ens))
        t["csearch_s"] = round(time.perf_counter() - t0, 3)

        t1 = time.perf_counter()
        ens = jnp.asarray(ens, jnp.float32)
        ens = ens[np.asarray(prune_by_moi(ens, z))]
        ens = ens[np.asarray(prune_by_rmsd(ens, z, rmsd_thr=0.3))]
        t["n_after_prune"] = int(ens.shape[0])
        t["prune_s"] = round(time.perf_counter() - t1, 3)

        t2 = time.perf_counter()
        loose = optimize_batch(calc, ens, fmax=0.5, max_steps=2000)  # production loose threshold (driver/embedder.py:1202)
        t["loose_converged"] = int(np.count_nonzero(np.asarray(loose.converged)))
        t["loose_s"] = round(time.perf_counter() - t2, 3)

        t3 = time.perf_counter()
        e = np.asarray(loose.energy)
        window = e < e.min() + 10.0  # kcal/mol
        kept = jnp.asarray(np.asarray(loose.coords)[window])
        tight = optimize_batch(calc, kept, fmax=0.05, max_steps=3000)  # production tight threshold
        t["n_in_window"] = int(kept.shape[0])
        t["tight_converged"] = int(np.count_nonzero(np.asarray(tight.converged)))
        t["tight_s"] = round(time.perf_counter() - t3, 3)

        t4 = time.perf_counter()
        final = tight.coords
        energies = tight.energy
        keep = np.asarray(prune_by_rmsd_rot_corr(
            final, z, energies=energies, max_dE=1.0
        ))
        t["n_final"] = int(np.count_nonzero(keep))
        t["final_prune_s"] = round(time.perf_counter() - t4, 3)
        t["total_s"] = round(time.perf_counter() - t0, 3)
        return t

    pipeline()  # compile pass (deterministic seed -> identical shapes)
    t = pipeline()  # steady state
    return {
        "metric": "end-to-end conformer pipeline (38 atoms: csearch -> prune -> loose+tight GFN-FF FIRE -> rot-corr prune)",
        "value": t["total_s"],
        "unit": "s",
        "vs_baseline": round(t["n_generated"] / t["total_s"], 1),
        **t,
    }


def bench_recall() -> dict:
    """Conformer-search completeness: recall of the native batched MTD
    against the exhaustive-csearch ground-truth conformer-type set of
    butane (the CREST-completeness check, tests/test_search_completeness.py
    at bench scale). Run with FIRECODE_BENCH_MODE=recall."""
    import jax.numpy as jnp

    from firecode_tpu.calculators.gfnff import GFNFF
    from firecode_tpu.csearch import csearch
    from firecode_tpu.md.metadynamics import run_mtd
    from firecode_tpu.opt.fire import optimize_batch
    from firecode_tpu.ops.algebra import dihedral
    from firecode_tpu.sample_molecules import build_alkane

    z, x = build_alkane(4)
    calc = GFNFF(z, x)
    quad = np.asarray([[0, 1, 2, 3]], dtype=np.int32)

    def types_of(pool):
        res = optimize_batch(calc, jnp.asarray(pool), fmax=0.05, max_steps=3000)
        ok = np.asarray(res.converged)
        e = np.asarray(res.energy)[ok]
        c = np.asarray(res.coords)[ok]
        c = c[e < e.min() + 6.0]
        phis = np.asarray(dihedral(jnp.asarray(c)[:, quad[0]]))
        return {"a" if abs(p) > 120.0 else "g" for p in np.ravel(phis)}

    t0 = time.perf_counter()
    truth = types_of(csearch(z, x, n_out=50, mode=1, seed=0))
    pool = run_mtd(calc, z, x, n_walkers=4, n_steps=1500, dep_every=100, seed=3)
    found = types_of(pool)
    recall = len(truth & found) / max(len(truth), 1)
    return {
        "metric": "native-MTD conformer recall vs exhaustive csearch (butane)",
        "value": recall,
        "unit": "recall",
        "vs_baseline": recall,
        "truth_types": sorted(truth),
        "found_types": sorted(found),
        "elapsed_s": round(time.perf_counter() - t0, 3),
    }


def bench_pallas_ab() -> dict:
    """Isolated A/B of the fused Pallas QCP tile vs the jnp path: the full
    8192^2 minimum-RMSD matrix (rmsd-only, the Pallas production use case).
    Returns {} off-TPU (interpret mode would measure nothing useful).

    Methodology (r5): each path runs REPS times inside ONE jitted fori_loop
    with per-rep perturbed inputs, and the per-rep wall is reported. The
    r2-r4 shape (3 sequential dispatches of the same call) measured the
    TUNNEL dispatch latency, not the kernel: on this box the identical
    kernel reads 29-33 ms dispatched eagerly vs 7.9 ms per rep in-loop.
    Per-rep input perturbation also defeats any backend request caching."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    if jax.default_backend() != "tpu":
        return {}
    from firecode_tpu.ops.pallas_qcp import pallas_rmsd_tile
    from firecode_tpu.ops.rmsd import (
        _pairwise_correlation,
        _qcp_lambda_max,
        _rmsd_from_lambda,
        center_coords,
    )

    k, n = 8192, 50
    rng = np.random.default_rng(0)
    ac, ga, wsum = center_coords(
        jnp.asarray(rng.normal(size=(k, n, 3)).astype(np.float32) * 2.0)
    )

    def jnp_once(ac, ga):
        s = _pairwise_correlation(ac, ac)
        lam = _qcp_lambda_max(s, ga[:, None], ga[None, :])
        return jnp.sum(_rmsd_from_lambda(ga[:, None], ga[None, :], lam, wsum))

    def pallas_once(ac, ga):
        return jnp.sum(pallas_rmsd_tile(ac, ga, ac, ga, wsum))

    def looped(once, reps):
        @jax.jit
        def run(ac, ga):
            def body(i, acc):
                aci = ac + 1e-4 * i.astype(ac.dtype)
                return acc + once(aci, ga)

            return lax.fori_loop(0, reps, body, jnp.float32(0))

        return run

    out = {}
    for name, once, reps in (("jnp", jnp_once, 3), ("pallas", pallas_once, 10)):
        fn = looped(once, reps)
        fn(ac, ga).block_until_ready()  # compile
        t0 = time.perf_counter()
        fn(ac, ga).block_until_ready()
        out[f"rmsd_8k_{name}_ms"] = round(
            (time.perf_counter() - t0) / reps * 1000, 1
        )
    return out


def _rotamer_perms(atomnos, base_coords) -> np.ndarray:
    from firecode_tpu.torsions import rotamer_permutations

    return rotamer_permutations(np.asarray(atomnos), np.asarray(base_coords))


def main() -> None:
    _setup_compile_cache()
    mode = os.environ.get("FIRECODE_BENCH_MODE")
    if mode in ("csearch", "gfnff", "mtd", "e2e", "recall"):
        fn = {
            "csearch": bench_csearch,
            "gfnff": bench_gfnff_opt,
            "mtd": bench_mtd,
            "e2e": bench_e2e,
            "recall": bench_recall,
        }[mode]
        print(json.dumps(fn()), flush=True)
        return
    import jax

    # Wall-clock budget for the OPTIONAL stages. The driver runs
    # `python bench.py` under a timeout and parses the LAST complete JSON
    # line of stdout — so the headline record is printed (and flushed) the
    # moment it exists, and every optional stage re-prints the enriched
    # record as a fresh last line. A kill mid-stage can only cost the stage
    # in flight, never the headline (round-3 lesson: rc=124, parsed=null).
    # 900 s default (was 420): the record is re-emitted after every stage,
    # so an external kill only costs the stage in flight — a larger budget
    # can never lose lanes, it can only capture more of them. With the
    # committed warm cache the full set completes in ~6-8 min.
    budget_s = float(os.environ.get("FIRECODE_BENCH_BUDGET_S", "900"))
    t_start = time.perf_counter()

    def remaining() -> float:
        return budget_s - (time.perf_counter() - t_start)

    def emit(record: dict) -> None:
        print(json.dumps(record), flush=True)

    n_confs = int(os.environ.get("FIRECODE_BENCH_CONFS", "100000"))
    block = int(os.environ.get("FIRECODE_BENCH_BLOCK", "512"))  # swept 512/1024/2048 on v5e: 0.722/0.738/0.986 s
    block = min(block, max(n_confs // 2, 2))

    t_gen0 = time.perf_counter()
    atomnos, coords = make_ensemble(n_confs)
    perms = _rotamer_perms(atomnos, np.asarray(coords[0]))

    # pass 1: compile; pass 2: steady-state timing
    n_kept, compile_pass_s, _ = run_cascade(coords, atomnos, block, perms)
    n_kept2, elapsed, stages = run_cascade(coords, atomnos, block, perms)
    assert n_kept == n_kept2

    record = {
        "metric": f"{n_confs}-conformer MOI+RMSD+rot-corr full prune cascade wall-clock",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / elapsed, 2),
        "n_kept": n_kept,
        "n_confs": n_confs,
        "n_rotamer_perms": int(len(perms)),
        "compile_pass_s": round(compile_pass_s, 3),
        "stages": stages,
    }
    emit(record)  # headline is now safe regardless of what follows

    on_tpu = jax.default_backend() == "tpu"

    # Adaptive stage-cost estimates (round-4 lesson: hard-coded estimates
    # from a warmed builder session under-predicted the driver's cold
    # compiles 10x, so the 1M stage ate the whole budget and every later
    # lane was skipped). Each estimate is the stage's MEASURED warm-cache
    # wall on the build box, scaled by how expensive THIS run's 100k
    # cascade compile pass was vs its warm-cache baseline — the probe that
    # tracks tunnel/compile slowness without the generation-transfer noise
    # (generation wall varies 4x run-to-run on tunneled backends and is
    # not representative of stage compiles).
    REF_COMPILE_PASS_S = 12.0  # warm committed cache, this repo's TPU box
    compile_scale = max(1.0, compile_pass_s / REF_COMPILE_PASS_S)
    record["compile_scale"] = round(compile_scale, 2)

    def stage(name: str, warm_wall_s: float, fn) -> None:
        if not on_tpu:
            return
        est_s = warm_wall_s * compile_scale
        if remaining() < est_s:
            record[name] = {
                "skipped": f"budget ({remaining():.0f}s left, est {est_s:.0f}s)"
            }
            emit(record)
            return
        t_stage = time.perf_counter()
        try:
            record[name] = fn()
        except Exception as err:  # noqa: BLE001 — scale/HW-fault-prone stages
            record[name] = {"skipped": repr(err)[:200]}
        if isinstance(record[name], dict):
            record[name]["wall_s"] = round(time.perf_counter() - t_stage, 1)
        emit(record)

    if os.environ.get("FIRECODE_BENCH_SKIP_PALLAS_AB") != "1":
        stage("pallas_ab", 45, bench_pallas_ab)
        ab = record.get("pallas_ab")
        if isinstance(ab, dict) and "skipped" not in ab:
            record.update(ab)  # rmsd_8k_{jnp,pallas}_ms at top level (r2/r3 shape)
            record.pop("pallas_ab", None)

    # Side lanes FIRST (round-4 lesson: the expensive 1M/10M stages ran
    # before these and blew the budget, leaving csearch/gfnff/e2e skipped
    # two rounds running). One-line summaries of CSEARCH_BENCH.json /
    # GFNFF_BENCH.json / the e2e lane, sized to fit the budget; full-size
    # lanes remain under FIRECODE_BENCH_MODE=...
    stage("csearch", 15, lambda: bench_csearch(n_candidates=65536))
    stage("gfnff", 50, lambda: bench_gfnff_opt(batch=1024, big=False))
    stage("e2e", 110, lambda: bench_e2e(n_out=1024))

    # 1M-conformer scale demonstration (the thesis of the rebuild: the
    # reference SKIPS pruning above 1e5 structures; here the full cascade,
    # rot-corr included, runs at 1e6). Higher duplication (x20) models the
    # production embed regime where generation massively oversamples.
    def _xl():
        atomnos_xl, coords_xl = make_ensemble(1_000_000, dup=20)
        # pass 1 pays the (shape-specific) compiles; pass 2 is steady-state
        _, compile_pass, _ = run_cascade(coords_xl, atomnos_xl, block, perms)
        _, total_xl, stages_xl = run_cascade(coords_xl, atomnos_xl, block, perms)
        stages_xl["total_s"] = round(total_xl, 3)
        stages_xl["compile_pass_s"] = round(compile_pass, 3)
        return stages_xl

    if os.environ.get("FIRECODE_BENCH_XL", "1") != "0" and n_confs == 100000:
        del coords
        stage("stages_1m", 40, _xl)

    # 10M-conformer scale demonstration: 100x the reference's hard prune
    # ceiling. 6 GB of f32 coordinates — generation is chunked into a
    # donated buffer and the grid MOI engine row-chunks its candidate
    # gathers, so the whole cascade fits one 16 GB chip. dup=100 models
    # heavy embed oversampling. Set FIRECODE_BENCH_XXL=0 to skip, or raise
    # FIRECODE_BENCH_BUDGET_S to make room for it.
    def _xxl():
        atomnos_xxl, coords_xxl = make_ensemble(10_000_000, dup=100, chunk=1_000_000)
        _, compile_10m, _ = run_cascade(coords_xxl, atomnos_xxl, block, perms)
        _, total_10m, stages_10m = run_cascade(coords_xxl, atomnos_xxl, block, perms)
        stages_10m["total_s"] = round(total_10m, 3)
        stages_10m["compile_pass_s"] = round(compile_10m, 3)
        return stages_10m

    if os.environ.get("FIRECODE_BENCH_XXL", "1") != "0" and n_confs == 100000:
        stage("stages_10m", 170, _xxl)


if __name__ == "__main__":
    main()
