"""Production batched solver: Pallas-fused sweeps, half-field layout.

``solve_batch_fused`` is the throughput path (f32, TPU): it operates on
explicitly batched (B, ...) arrays, runs the wide per-order work in two
Pallas kernels (ops/pallas_sweeps.py) and keeps the radiance field as
(down, up) halves so no concatenation pass is ever needed — the Jₙ
matmul consumes the halves directly:

    Jₙ = down @ A[:M] + up @ A[M:]            (same FLOPs, no concat)

``sos_rt_tpu.solver.solve_column`` remains the reference implementation
(f64 oracle parity, arbitrary dtypes); this module must match it — see
tests/test_fused.py (Pallas kernels run in interpret mode on CPU).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from sos_rt_tpu.config import (GridSpec, MATMUL_PRECISION, Scene,
                               SolverOptions)
from sos_rt_tpu.grids import tau_profile
from sos_rt_tpu.ops.first_order import first_order, first_order_mega_inputs
from sos_rt_tpu.ops.pallas_sweeps import (
    build_pack,
    down_sweep_pallas,
    up_sweep_smooth_pallas,
)
from sos_rt_tpu.ops.source import source_operator
from sos_rt_tpu.ops.sweeps import (
    EXP_CLAMP,
    band_choice,
    build_stencils,
    polyfit_band_variants,
    select_band_choice,
    stencils_for,
)
from sos_rt_tpu.solver import PhaseTables, Solution


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SweepSummary:
    """Reduced sweep solution: only the physically-read-out rows.

    For batched sweep workloads (BASELINE config 5, critical-albedo
    forcing) every downstream reduction uses the TOA and surface angle
    rows — TOA up-flux, surface down-flux, Haywood ΔF, critical albedo —
    so the (B, L, 2M) field never needs to leave the chip (at 1e5
    col/s that write-back alone is ~25 GB/s of HBM+host traffic).
    """

    i_toa: Any          # (B, 2M) total radiance row at τ=0
    i_surface: Any      # (B, 2M) total radiance row at τ*
    n_orders: Any       # (B,)
    converged: Any      # (B,) bool
    tau: Any            # (B, L)
    idx_up: Any
    idx_down: Any


def _to_summary(sol: Solution) -> SweepSummary:
    """Reduce a full Solution to the summary read-set (fallback paths)."""
    return SweepSummary(i_toa=sol.i_total[:, 0, :],
                        i_surface=sol.i_total[:, -1, :],
                        n_orders=sol.n_orders, converged=sol.converged,
                        tau=sol.tau, idx_up=sol.idx_up,
                        idx_down=sol.idx_down)


PREDICT_MIN_BATCH = 4096      # below this the predictor solve isn't worth it
PREDICT_ANGLES = 8            # coarse predictor grid (µ nodes per half)
PREDICT_LAYERS = 16


def predict_order_count(scenes: Scene, tables: PhaseTables, grid: GridSpec,
                        opts: SolverOptions, interpret: bool | None = None,
                        min_batch: int | None = None):
    """Per-column scattering-order prediction by a coarse-grid solve.

    The block/bucket sort key decides how homogeneous each mega block's
    convergence is; r5 measured ~26% of the headline wall time as
    straggler cost (each 128-column block runs to its slowest member)
    under the closed-form heuristic (mesh.order_count_score).  Solving
    the SAME physics on a µ/τ-subsampled grid predicts the true order
    counts far better (corr 0.95 vs the fine solve; per-128-block
    straggler sum 6213 → ~4750 vs the ideal 4119 on the headline batch,
    BASELINE r5) at ~0.2 µs/column: the coarse tables are SUBSAMPLED
    from the caller's tables (uniform grids where (M-1) divides by
    (PREDICT_ANGLES-1) — no phase-model specs needed), and the coarse
    mega solve runs C=1024 lane-filled blocks.

    Returns the (B,) coarse order counts, or None when prediction does
    not apply (float64 runs, non-uniform grids, small batches) — the
    caller falls back to the heuristic.  When (M-1) is not divisible by
    (PREDICT_ANGLES-1) the subsample uses the nearest fine nodes
    (rounded linspace): the coarse tables are then sampled at slightly
    offset µ than the coarse GridSpec assumes, which perturbs the
    predicted physics a little but not the count correlation — only
    order counts leave this function.
    """
    m = grid.nb_angles
    mc, lc = PREDICT_ANGLES, PREDICT_LAYERS
    B = jnp.shape(jnp.asarray(scenes.mu0))[0]
    if min_batch is None:
        min_batch = PREDICT_MIN_BATCH
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if (B < min_batch or getattr(grid, "spacing", "uniform") != "uniform"
            or m <= mc
            or (opts.dtype == "float64" and not interpret)):
        # compiled f64 excluded: the coarse solve would run the mega
        # kernel in f64 on TPU (a verification-only dtype; not worth a
        # predictor)
        return None
    if (m - 1) % (mc - 1) == 0:
        idx = np.arange(0, m, (m - 1) // (mc - 1))
    else:
        idx = np.round(np.linspace(0, m - 1, mc)).astype(np.int64)
    full_idx = np.concatenate([idx, m + idx])
    cg = GridSpec(nb_angles=mc, nb_layers=lc)
    ct = PhaseTables(
        p0_atm=jnp.asarray(tables.p0_atm)[..., full_idx],
        p_atm=jnp.asarray(tables.p_atm)[np.ix_(full_idx, full_idx)],
        p0_aer=jnp.asarray(tables.p0_aer)[..., full_idx],
        p_aer=jnp.asarray(tables.p_aer)[np.ix_(full_idx, full_idx)])
    sol = solve_batch_mega(scenes, ct, cg, opts, outputs="summary",
                           cols_per_block=None if interpret else 1024,
                           interpret=interpret, sort=False)
    return sol.n_orders


def solve_batch_mega(scenes: Scene, tables: PhaseTables, grid: GridSpec,
                     opts: SolverOptions, cols_per_block: int | None = None,
                     interpret: bool | None = None, sort: bool = True,
                     mm: str | None = None, ablate: str = "",
                     outputs: str = "full", i1: str = "kernel",
                     allow_small: bool = False,
                     stream: bool | None = None):
    """Whole-solve Pallas path: the entire order loop runs on-chip.

    One kernel invocation per batch; each block of ``cols_per_block``
    columns converges independently (see ops/megakernel.py).  Falls back
    to :func:`solve_batch_fused` when the grid needs the small-µ machinery
    (``mega_supported`` false).

    ``sort`` pre-sorts columns by an order-count key so each block is
    convergence-homogeneous (blocks exit their while_loop together instead
    of dragging fast columns to a slow straggler's trip count); results
    are returned in the caller's order, per-column values unchanged.
    ``True`` keys on the closed-form proxy (mesh.order_count_score);
    ``'predict'`` keys on a coarse-grid order-count pre-solve
    (:func:`predict_order_count` — ~20% less straggler cost on the
    headline batch, falling back to the proxy when inapplicable).

    ``mm`` selects the matmul precision mode: 'bf16x3' (manual 3-pass
    bf16 decomposition, ~1e-7 relative — the f32 default) or 'highest'
    (6-pass, used automatically for f64).

    ``i1`` selects where the first order is evaluated: 'kernel' (default
    — inside the Pallas kernel from compact per-column inputs, see
    ops/first_order.py::first_order_mega_inputs) or 'host' (the vmapped
    closed form materializing (B, L, 2M) half-fields in HBM; kept for
    ablation and as the Solution.i1 provider).  With i1='kernel' and
    outputs='full', Solution.i1 is None.

    ``allow_small`` asserts that every column's µ→0⁻ polyfit band covers
    the grid's small-µ columns, making the windowed/Taylor machinery
    provably dead (see megakernel.py scope note) — verified eagerly by
    sos_rt_tpu.parallel.mesh.mega_small_ok; without it, grids with
    small-µ columns fall back to the fused path.

    ``stream`` selects the HBM-streaming execution of the same kernel
    math (ops/megastream.py): half-fields resident in HBM, two
    grid-pipelined Pallas passes per order, convergence loop at the XLA
    level.  Default (None): auto-enabled exactly when the whole-field
    VMEM-resident kernel is infeasible for the grid (e.g. the canonical
    501×800 production grid, SOS_Aer_main_lambertian.py:33,57 — the
    VERDICT r4 item-1 path, previously a fused-engine fallback at ~300
    col/s).  Both i1 modes work streamed; 'kernel' (default) evaluates
    I₁ in a streamed init pass (ops/megastream._passI_kernel) instead
    of materializing (B, L, 2M) host-side (~30% of the canonical solve,
    r5 ablation).
    """
    from sos_rt_tpu.ops import megakernel as mk

    if outputs not in ("full", "summary"):
        raise ValueError(f"unknown outputs mode {outputs!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    stencils = stencils_for(grid)
    if not mk.mega_supported(grid, stencils, allow_small=allow_small):
        sol = solve_batch_fused(scenes, tables, grid, opts)
        return _to_summary(sol) if outputs == "summary" else sol

    if sort:
        from sos_rt_tpu.parallel.mesh import order_count_score

        key = None
        if sort == "predict":
            key = predict_order_count(scenes, tables, grid, opts,
                                      interpret=interpret)
        if key is None:
            key = order_count_score(scenes)
        else:
            # secondary score ordering within equal predicted counts;
            # the 1024 gap keeps the O(0.1–1) score term above f32 ulp
            # at count-scale magnitudes (a 1e-6·score term would vanish
            # below half-ulp and do nothing)
            key = (key.astype(jnp.float32) * 1024.0
                   + order_count_score(scenes))
        perm = jnp.argsort(key)
        inv = jnp.argsort(perm)
        scenes = jax.tree_util.tree_map(lambda x: x[perm], scenes)
        if jnp.ndim(tables.p0_atm) == 2:
            tables = dataclasses.replace(
                tables, p0_atm=tables.p0_atm[perm], p0_aer=tables.p0_aer[perm])
        sol = solve_batch_mega(scenes, tables, grid, opts,
                               cols_per_block=cols_per_block,
                               interpret=interpret, sort=False,
                               mm=mm, ablate=ablate, outputs=outputs, i1=i1,
                               allow_small=allow_small, stream=stream)
        return jax.tree_util.tree_map(lambda x: x[inv], sol)

    dtype = jnp.dtype(opts.dtype)
    if mm is None:                      # explicit arg wins over opts.mm
        # opts.mm only applies to f32 — bf16-splitting f64 operators
        # would silently destroy the precision the user asked for (the
        # fused/reference engines guard the same way); the explicit
        # mm= argument is kept unguarded for tests.
        mm = opts.mm if dtype == jnp.float32 else None
    if mm is None:
        mm = "bf16x3" if dtype == jnp.float32 else "highest"
    L, M = grid.nb_layers, grid.nb_angles
    MP = mk.pad_angles(M)
    mu = jnp.asarray(grid.mu(), dtype)
    w_mu_np = np.asarray(grid.trapz_weights(), np.float64)
    w_mu = jnp.asarray(w_mu_np, dtype)
    B = jnp.shape(jnp.asarray(scenes.mu0))[0]
    user_cpb = cols_per_block      # None = caller left the block size to us
    if cols_per_block is None:
        if interpret:
            cols_per_block = min(B, 64)
        else:
            # VMEM-aware block size: 8 whole-field scratch planes of
            # (L, MP, C) f32 must fit comfortably (~90 MB leaves room
            # for the padded operators); one full lane tile when it fits
            budget = 90e6
            fit = int(budget / (L * MP * 4 * 8))
            cols_per_block = max(4, min(128, 1 << max(0, fit.bit_length() - 1)))
    C = min(cols_per_block, B) if interpret else cols_per_block
    if stream is None:
        # Whole-field viability at the default/requested C decides the
        # execution strategy: blocked lane dims must be multiples of 128
        # (Mosaic) and narrow blocks waste ≥75% of each vreg — grids
        # whose whole field cannot fit VMEM at C ≥ 32 (e.g. the
        # canonical 501×800 at ANY C: 800·504·C·4·8 planes) run the
        # HBM-STREAMING variant of the same kernel math instead
        # (ops/megastream.py; until r4 this fell back to the fused
        # engine at ~300 col/s — VERDICT r4 item 1).
        if interpret:
            stream = False
        else:
            g_ok0 = [d for d in (16, 8, 4, 2, 1)
                     if L % d == 0 and d * C <= 1024 and (d * C) % 128 == 0]
            stream = C < 32 or not g_ok0
    stream = bool(stream)
    if stream:
        if user_cpb is None:
            # the whole-field VMEM heuristic above does NOT apply to the
            # streamed execution (fields live in HBM) — use a full lane
            # tile of columns (r5 bug: reusing the heuristic's C=4 made
            # g_ok empty and silently fell back to the fused engine)
            C = min(B, 64) if interpret else 128
        elif not interpret:
            # C > 128 gives no extra lanes (G shrinks to keep G·C ≤
            # 1024) and at canonical sizes makes the compiler
            # materialize a full field plane in VMEM (measured r5:
            # C=256 → 412 MB 'scratch operand' OOM); larger batches
            # should raise B (blocks run under lax.map: B=512 →
            # 1,093 col/s canonical) — not C
            C = min(C, 128)
    if not interpret:
        g_ok = [d for d in (16, 8, 4, 2, 1)
                if L % d == 0 and d * C <= 1024 and (d * C) % 128 == 0]
        if not g_ok or (not stream and C < 32):
            sol = solve_batch_fused(scenes, tables, grid, opts)
            return _to_summary(sol) if outputs == "summary" else sol
    pad = (-B) % C
    if pad:
        scenes = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])]), scenes)
        if jnp.ndim(tables.p0_atm) == 2:
            tables = dataclasses.replace(
                tables,
                p0_atm=jnp.concatenate(
                    [tables.p0_atm,
                     jnp.broadcast_to(tables.p0_atm[-1:],
                                      (pad,) + tables.p0_atm.shape[1:])]),
                p0_aer=jnp.concatenate(
                    [tables.p0_aer,
                     jnp.broadcast_to(tables.p0_aer[-1:],
                                      (pad,) + tables.p0_aer.shape[1:])]))
    Bp = B + pad
    nblk = Bp // C
    # layers per chunk: fill the lane tile without exceeding ~1024 lanes
    # or unrolling too far (the pass bodies unroll over G in Python);
    # the compiled-path candidates were computed (and checked non-empty)
    # by the viability gate above
    if interpret:
        G = next(d for d in (16, 8, 4, 2, 1)
                 if L % d == 0 and d * C <= 1024)
    else:
        G = g_ok[0]
    NG = L // G

    tau, idx_up, idx_down = jax.vmap(
        lambda ta, tr, z0, zu, zd: tau_profile(ta, tr, z0, zu, zd, L)
    )(jnp.asarray(scenes.tau_star_atm, dtype),
      jnp.asarray(scenes.tau_star_aer, dtype),
      jnp.asarray(scenes.z0, dtype), jnp.asarray(scenes.z_up, dtype),
      jnp.asarray(scenes.z_down, dtype))
    tau = tau.astype(dtype)
    dtau_aer = scenes.tau_star_aer / (idx_down + 1 - idx_up)
    dtau_atm = scenes.tau_star_atm / L
    w_atm = (dtau_atm / (dtau_atm + dtau_aer)).astype(dtype)
    w_aer = (dtau_aer / (dtau_atm + dtau_aer)).astype(dtype)

    p0_batched = jnp.ndim(tables.p0_atm) == 2
    p0a_ax = 0 if p0_batched else None
    if i1 == "kernel":
        i1_pack, i1_tiles, colc_pk, i1_const, astack = first_order_mega_inputs(
            opts.surface, tau, mu, M, scenes.mu0, scenes.grd_alb,
            scenes.alb_atm, scenes.alb_aer, tables.p0_atm, tables.p_atm,
            tables.p0_aer, tables.p_aer, idx_up, idx_down, w_atm, w_aer,
            w_mu, dtype)
        i1t = None
    else:
        i1t = jax.vmap(
            lambda tv, mu0, ra, aa, ar, iu, idn, wa, wr, p0a, p0r:
            first_order(
                opts.surface, tv, mu, M, mu0, ra, aa, ar, p0a,
                tables.p_atm, p0r, tables.p_aer, iu, idn, wa, wr, w_mu),
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, p0a_ax, p0a_ax),
            out_axes=1,
        )(tau, jnp.asarray(scenes.mu0, dtype),
          jnp.asarray(scenes.grd_alb, dtype),
          jnp.asarray(scenes.alb_atm, dtype),
          jnp.asarray(scenes.alb_aer, dtype),
          idx_up, idx_down, w_atm, w_aer, tables.p0_atm, tables.p0_aer)
        # i1t: (L, B, 2M)

    def to_lanes(x_lb):
        """(L, B) → (NG, G·B) in the kernel's (chunk, block·layer·col)
        lane layout (block i lanes [i·G·C, ...), lane = k·C + c)."""
        x = x_lb.reshape(NG, G, nblk, C)
        return x.transpose(0, 2, 1, 3).reshape(NG, nblk * G * C)

    def half_to_lanes(x_lbm):
        """(L, B, M) → (NG, MP, G·B) angle-major half field (angle pad)."""
        if MP != M:
            x_lbm = jnp.pad(x_lbm, ((0, 0), (0, 0), (0, MP - M)))
        x = x_lbm.reshape(NG, G, nblk, C, MP)
        return x.transpose(0, 4, 2, 1, 3).reshape(NG, MP, nblk * G * C)

    def half_from_lanes(x):
        """(NG, MP, G·B) → (B, L, M) (angle pad stripped)."""
        y = x.reshape(NG, MP, nblk, G, C)
        return y.transpose(2, 4, 0, 3, 1).reshape(Bp, L, MP)[:, :, :M]

    # ---- pack rows (L, B) → (NG, PK_W, G·B) ----
    t_idx = jnp.arange(L)[:, None]
    iu = idx_up[None, :]
    idn = idx_down[None, :]
    tau_t = tau.T                                           # (L, B)
    drop = ((t_idx == idn) | (t_idx == iu - 1)
            | (t_idx == L - 1)).astype(dtype)
    ch2 = (t_idx < iu).astype(dtype)
    r1 = (t_idx == idn + 1).astype(dtype)
    r2 = (t_idx == iu).astype(dtype)
    dt = tau_t[1:] - tau_t[:-1]
    zrow = jnp.zeros((1, Bp), dtype)
    hdt_dn = jnp.concatenate([zrow, 0.5 * dt], axis=0)
    hdt_up = jnp.concatenate([0.5 * dt, zrow], axis=0)
    in_layer = ((t_idx >= iu) & (t_idx <= idn))
    alb_atm = jnp.asarray(scenes.alb_atm, dtype)[None, :]
    alb_aer = jnp.asarray(scenes.alb_aer, dtype)[None, :]
    coef_atm = jnp.where(in_layer, w_atm[None, :] * alb_atm / 4.0,
                         alb_atm / 4.0)
    coef_aer = jnp.where(in_layer, w_aer[None, :] * alb_aer / 4.0, 0.0)
    choice_a = band_choice(jnp.take_along_axis(
        tau, (idx_up - 1)[:, None], axis=1)[:, 0]).astype(dtype)
    choice_bc = band_choice(jnp.take_along_axis(
        tau, idx_down[:, None], axis=1)[:, 0]).astype(dtype)
    ones_l = jnp.ones((L, 1), dtype)
    # localized affine-scan sources (see ops/megakernel.py sweep comments):
    # down  c_t = (hdt_dn+hdt_up)_t · jₙ_t
    # up    c_t = (d_t·hdt_up_t + gs_t)·ivup·jₙ_t,  gs_t = d_{t-1}·hdt_up_{t-1}
    cdn = hdt_dn + hdt_up
    dw = (1.0 - drop) * hdt_up
    gs = jnp.concatenate([zrow, dw[:-1]], axis=0)
    cup = dw + gs
    # resolved polyfit-band choice per (layer, column): variant A above
    # the aerosol layer, variant B/C below (ch2 = t < idx_up)
    choice_res = jnp.where(ch2 > 0.5, ones_l * choice_a[None, :],
                           ones_l * choice_bc[None, :])
    zeros_lb = jnp.zeros((L, Bp), dtype)
    rows = [tau_t, hdt_dn, hdt_up, coef_atm, coef_aer, cdn, cup, gs,
            r1, r2, choice_res]
    if i1 == "kernel":
        rows += [i1_pack[k] for k in mk.I1_PACK_KEYS]
    rows += [zeros_lb] * (mk.PK_W - len(rows))
    pack = jnp.stack([to_lanes(x) for x in rows], axis=1)

    grd = jnp.asarray(scenes.grd_alb, dtype)
    zb = jnp.zeros((Bp,), dtype)
    const_row = i1_const.astype(dtype) if i1 == "kernel" else zb
    cpar = jnp.stack([grd, const_row] + [zb] * (mk.CP_W - 2), axis=0)

    a_atm = source_operator(tables.p_atm.astype(dtype), w_mu)
    a_aer = source_operator(tables.p_aer.astype(dtype), w_mu)
    ws = mk.stack_source_operator(a_atm, a_aer, M, mm, dtype)
    ops = mk.build_static_operators(grid, stencils, opts.surface,
                                    w_mu_np, dtype, mm)

    if i1 == "kernel":
        if MP != M:            # angle-pad the in-kernel I₁ inputs
            i1_tiles = jnp.pad(i1_tiles, ((0, 0), (0, MP - M), (0, 0)))
            colc_pk = jnp.pad(colc_pk, ((0, 0), (0, MP - M)))
            if astack is not None:
                astack = mk._pad_blocks(jnp.asarray(astack, dtype),
                                        M, MP, 4, 1)
        if astack is None:     # specular: no surface-integral operator
            zsplit = (jnp.zeros((1, 1), dtype),) * 2
            astk = zsplit
        elif mm != "highest":
            astk = mk._split_bf16(astack)
        else:
            astk = (jnp.asarray(astack, dtype), jnp.zeros((1, 1), dtype))
        call_kw = dict(i1c=dict(tiles=i1_tiles, astk=astk, colc_pk=colc_pk),
                       surface=opts.surface)
    else:
        call_kw = dict(i1dn=half_to_lanes(i1t[:, :, :M]),
                       i1up=half_to_lanes(i1t[:, :, M:]))
    if stream:
        from sos_rt_tpu.ops import megastream as ms

        if i1 == "kernel":
            init_kw = dict(i1c=call_kw["i1c"], surface=opts.surface)
            init_args = ()
        else:
            init_kw = {}
            init_args = (half_to_lanes(i1t[:, :, :M]),
                         half_to_lanes(i1t[:, :, M:]))
        res = ms.stream_order_loop(
            pack, cpar, ops, ws, *init_args,
            nb_angles=M, tol=float(opts.tol),
            max_orders=int(opts.max_orders), cols_per_block=C, mm=mm,
            interpret=interpret, outputs=outputs, ablate=ablate,
            **init_kw)
        stats = res[-1]
        n_orders = stats[mk.ST_N].astype(jnp.int32)
        converged = stats[mk.ST_CONV] > 0.5
        if outputs == "summary":
            return SweepSummary(
                i_toa=jnp.concatenate([res[0][:M].T, res[1][:M].T],
                                      axis=1)[:B],
                i_surface=jnp.concatenate([res[2][:M].T, res[3][:M].T],
                                          axis=1)[:B],
                n_orders=n_orders[:B], converged=converged[:B],
                tau=tau[:B], idx_up=idx_up[:B], idx_down=idx_down[:B])
        i_total = jnp.concatenate(
            [half_from_lanes(res[0]), half_from_lanes(res[1])], axis=2)[:B]
        i1_out = None if i1t is None else jnp.swapaxes(i1t, 0, 1)[:B]
        return Solution(i_total=i_total, i1=i1_out,
                        n_orders=n_orders[:B], converged=converged[:B],
                        tau=tau[:B], idx_up=idx_up[:B],
                        idx_down=idx_down[:B])

    if outputs == "summary":
        toadn, toaup, srfdn, srfup, stats = mk.mega_call(
            pack, cpar, ops, ws,
            nb_angles=M, tol=float(opts.tol), max_orders=int(opts.max_orders),
            cols_per_block=C, mm=mm, interpret=interpret, ablate=ablate,
            summary=True, **call_kw)
        return SweepSummary(
            i_toa=jnp.concatenate([toadn[:M].T, toaup[:M].T], axis=1)[:B],
            i_surface=jnp.concatenate([srfdn[:M].T, srfup[:M].T],
                                      axis=1)[:B],
            n_orders=stats[mk.ST_N, :B].astype(jnp.int32),
            converged=stats[mk.ST_CONV, :B] > 0.5,
            tau=tau[:B], idx_up=idx_up[:B], idx_down=idx_down[:B])
    itd, itu, stats = mk.mega_call(
        pack, cpar, ops, ws,
        nb_angles=M, tol=float(opts.tol), max_orders=int(opts.max_orders),
        cols_per_block=C, mm=mm, interpret=interpret, ablate=ablate,
        **call_kw)

    i_total = jnp.concatenate(
        [half_from_lanes(itd), half_from_lanes(itu)], axis=2)[:B]
    i1_out = None if i1t is None else jnp.swapaxes(i1t, 0, 1)[:B]
    n_orders = stats[mk.ST_N, :B].astype(jnp.int32)
    converged = stats[mk.ST_CONV, :B] > 0.5
    return Solution(i_total=i_total, i1=i1_out, n_orders=n_orders,
                    converged=converged, tau=tau[:B],
                    idx_up=idx_up[:B], idx_down=idx_down[:B])


def solve_batch_fused(scenes: Scene, tables: PhaseTables, grid: GridSpec,
                      opts: SolverOptions, block_b: int = 32,
                      interpret: bool | None = None):
    """Batched SOS solve over (B,)-leaved ``scenes``.

    ``interpret`` forces Pallas interpreter mode (auto: on except on TPU).
    B is padded to a multiple of the kernels' effective batch block
    (the Pallas grid = B // block silently TRUNCATES otherwise, leaving
    garbage in the trailing columns) and outputs are sliced back.
    """
    from sos_rt_tpu.ops.pallas_sweeps import effective_block

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    stencils = stencils_for(grid)
    dtype = jnp.dtype(opts.dtype)
    L, M = grid.nb_layers, grid.nb_angles
    mu = jnp.asarray(grid.mu(), dtype)
    w_mu = jnp.asarray(grid.trapz_weights(), dtype)
    B0 = jnp.shape(jnp.asarray(scenes.mu0))[0]
    eff = min(effective_block(L, M, block_b, interpret), B0)
    pad = (-B0) % eff
    if pad:
        scenes = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])]), scenes)
        if jnp.ndim(tables.p0_atm) == 2:
            tables = dataclasses.replace(
                tables,
                p0_atm=jnp.concatenate(
                    [tables.p0_atm,
                     jnp.broadcast_to(tables.p0_atm[-1:],
                                      (pad,) + tables.p0_atm.shape[1:])]),
                p0_aer=jnp.concatenate(
                    [tables.p0_aer,
                     jnp.broadcast_to(tables.p0_aer[-1:],
                                      (pad,) + tables.p0_aer.shape[1:])]))
    B = B0 + pad

    # ---- per-column geometry (vmapped over the batch) ----
    tau, idx_up, idx_down = jax.vmap(
        lambda ta, tr, z0, zu, zd: tau_profile(ta, tr, z0, zu, zd, L)
    )(jnp.asarray(scenes.tau_star_atm, dtype),
      jnp.asarray(scenes.tau_star_aer, dtype),
      jnp.asarray(scenes.z0, dtype), jnp.asarray(scenes.z_up, dtype),
      jnp.asarray(scenes.z_down, dtype))
    tau = tau.astype(dtype)
    dtau_aer = scenes.tau_star_aer / (idx_down + 1 - idx_up)
    dtau_atm = scenes.tau_star_atm / L
    w_atm = (dtau_atm / (dtau_atm + dtau_aer)).astype(dtype)
    w_aer = (dtau_aer / (dtau_atm + dtau_aer)).astype(dtype)

    # P0 may be batched over µ0 (one row per column) — only P0 depends on
    # µ0; the P matrices are shared (BASELINE config-5 µ0 sweeps)
    p0_batched = jnp.ndim(tables.p0_atm) == 2
    p0a_ax = 0 if p0_batched else None
    i1 = jax.vmap(
        lambda tv, mu0, ra, aa, ar, iu, idn, wa, wr, p0a, p0r: first_order(
            opts.surface, tv, mu, M, mu0, ra, aa, ar, p0a,
            tables.p_atm, p0r, tables.p_aer, iu, idn, wa, wr, w_mu),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, p0a_ax, p0a_ax),
    )(tau, jnp.asarray(scenes.mu0, dtype), jnp.asarray(scenes.grd_alb, dtype),
      jnp.asarray(scenes.alb_atm, dtype), jnp.asarray(scenes.alb_aer, dtype),
      idx_up, idx_down, w_atm, w_aer, tables.p0_atm, tables.p0_aer)

    a_full_atm = source_operator(tables.p_atm.astype(dtype), w_mu)
    a_full_aer = source_operator(tables.p_aer.astype(dtype), w_mu)
    a1_atm, a2_atm = a_full_atm[:M], a_full_atm[M:]
    a1_aer, a2_aer = a_full_aer[:M], a_full_aer[M:]

    # matmul precision mode for the Jₙ dots (the dominant FLOPs on
    # canonical-width grids): None/'highest' = 6-pass XLA HIGHEST (the
    # fidelity default for this engine); 'bf16x3'/'bf16x5' = the split
    # decompositions of ops/precision.py (measured r4: 3.8× on the
    # canonical grid at identical median field)
    mm = opts.mm if dtype == jnp.float32 else None
    if mm in ("bf16x3", "bf16x5"):
        from sos_rt_tpu.ops.precision import make_split_dot

        dots = [make_split_dot(a, mm, dtype) for a in
                (a1_atm, a2_atm, a1_aer, a2_aer)]
        dot_mm = lambda which, x: dots[which](x)
    else:
        def dot_mm(which, x):
            a = (a1_atm, a2_atm, a1_aer, a2_aer)[which]
            return jnp.dot(x, a, precision=MATMUL_PRECISION)

    # ---- loop-invariant batched masks ----
    t_idx = jnp.arange(L)
    in_layer = ((t_idx[None, :] >= idx_up[:, None])
                & (t_idx[None, :] <= idx_down[:, None]))[..., None]
    alb_atm = jnp.asarray(scenes.alb_atm, dtype)[:, None, None]
    alb_aer = jnp.asarray(scenes.alb_aer, dtype)[:, None, None]
    wa3 = w_atm[:, None, None]
    wr3 = w_aer[:, None, None]

    mu_down_safe = np.where(np.asarray(grid.mu()[:M]) == 0, -1.0,
                            np.asarray(grid.mu()[:M]))
    mu_down_safe = jnp.asarray(mu_down_safe, dtype)
    mu_up_row = jnp.concatenate([jnp.zeros((1,), dtype), mu[M + 1:]])

    pack, cparams = build_pack(tau, idx_up, idx_down, dtype)

    # small-µ machinery (loop-invariant)
    small_cols = jnp.asarray(stencils.small_cols)
    has_small = stencils.small_cols.size > 0
    if has_small:
        mu_s = mu[small_cols]
        taylor_mask = jnp.asarray(stencils.taylor_mask)
        region_start = jnp.where(
            t_idx[None, :] < idx_up[:, None], 0,
            jnp.where(t_idx[None, :] <= idx_down[:, None], idx_up[:, None],
                      idx_down[:, None] + 1))               # (B, L)
        cutoff = tau[:, :, None] - 5.0 * jnp.abs(mu_s)[None, None, :]
        first_k = jax.vmap(lambda tv, cu: jnp.searchsorted(
            tv, cu.T, side="left").T)(tau, cutoff)
        k0 = jnp.minimum(jnp.maximum(first_k, region_start[:, :, None]),
                         t_idx[None, :, None])
        tau_k0 = jnp.take_along_axis(
            jnp.broadcast_to(tau[:, :, None], k0.shape), k0, axis=1)
        att_k0 = jnp.exp(jnp.clip(
            (tau[:, :, None] - tau_k0) / mu_s[None, None, :], EXP_CLAMP, 0.0))
        prev_t = jnp.clip(t_idx - 1, 0, L - 1)
        taylor_den = jnp.where(t_idx[None, :, None] > 0,
                               (tau - tau[:, prev_t])[:, :, None], 1.0)
        taylor_on = (t_idx[None, :] > region_start)[:, :, None]

    # polyfit band selection
    choice_a = band_choice(jnp.take_along_axis(tau, (idx_up - 1)[:, None],
                                               axis=1)[:, 0])
    choice_bc = band_choice(jnp.take_along_axis(tau, idx_down[:, None],
                                                axis=1)[:, 0])
    pmask = jnp.stack([jnp.asarray(stencils.poly_mask[c]) for c in range(4)])
    valid_a = select_band_choice(pmask, choice_a[:, None])   # (B, band_max)
    valid_bc = select_band_choice(pmask, choice_bc[:, None])
    in_a_col = (t_idx[None, :] < idx_up[:, None])[..., None]
    band_valid = jnp.where(in_a_col, valid_a[:, None, :], valid_bc[:, None, :])
    band_cols = M - 1 - jnp.arange(stencils.band_max)

    mirror_bc = np.arange(M - 2, -1, -1)                     # cols M-2..0
    grd = jnp.asarray(scenes.grd_alb, dtype)
    lamb_w = (w_mu[:M] * mu[:M])[None, :]

    down_p = functools.partial(down_sweep_pallas, block_b=block_b,
                               interpret=interpret)
    up_p = functools.partial(up_sweep_smooth_pallas, block_b=block_b,
                             interpret=interpret)

    def source_fn(dn, up):
        jn_atm = dot_mm(0, dn) + dot_mm(1, up)
        jn_aer = dot_mm(2, dn) + dot_mm(3, up)
        jn_atm = (alb_atm / 4.0) * jn_atm
        jn_aer = (alb_aer / 4.0) * jn_aer
        return jnp.where(in_layer, wa3 * jn_atm + wr3 * jn_aer, jn_atm)

    def narrow_down_fixes(raw, jn):
        if has_small:
            raw_s = raw[:, :, small_cols]
            windowed = raw_s - att_k0 * jnp.take_along_axis(raw_s, k0, axis=1)
            jn_s = jn[:, :, small_cols]
            dj = jnp.where(taylor_on, (jn_s - jn_s[:, prev_t]) / taylor_den,
                           0.0)
            taylor = -jn_s + mu_s[None, None, :] * dj
            raw = raw.at[:, :, small_cols].set(
                jnp.where(taylor_mask[None, None, :], taylor, windowed))
        raw = raw.at[:, :, M - 1].set(0.0)
        polys, _ = jax.vmap(lambda r: polyfit_band_variants(r, stencils))(raw)
        poly = jnp.where(in_a_col,
                         select_band_choice(polys.swapaxes(0, 1),
                                            choice_a[:, None, None]),
                         select_band_choice(polys.swapaxes(0, 1),
                                            choice_bc[:, None, None]))
        cur = raw[:, :, band_cols]
        return raw.at[:, :, band_cols].set(jnp.where(band_valid, poly, cur))

    def order_step(dn_prev, up_prev):
        with jax.named_scope("sos.source_jn"):
            jn = source_fn(dn_prev, up_prev)
        with jax.named_scope("sos.down_sweep"):
            raw = down_p(jn[:, :, :M], pack, mu_down_safe)
            dn = narrow_down_fixes(raw, jn)
        with jax.named_scope("sos.up_sweep_bc"):
            surf = dn[:, L - 1, :]
            if opts.surface == "lambertian":
                f_down = -jnp.sum(lamb_w * surf, axis=1)
                bc = jnp.broadcast_to((2.0 * grd * f_down)[:, None], (B, M))
            else:
                bc = grd[:, None] * surf[:, mirror_bc]
                bc = jnp.concatenate([jnp.zeros((B, 1), dtype), bc], axis=1)
            up = up_p(jn[:, :, M:], pack, cparams, mu_up_row, bc)
        return dn, up

    tol = jnp.asarray(opts.tol, dtype)

    def ratio_fn(dn_new, up_new, dn_tot, up_tot):
        # 0/0 → 0 (treated converged): degenerate scenes with zero
        # radiance at a TOA/surface angle must not poison the criterion
        div = lambda a, b: jnp.where(b != 0, a / jnp.where(b != 0, b, 1.0),
                                     0.0)
        r_toa = jnp.max(div(up_new[:, 0, :], up_tot[:, 0, :]), axis=1)
        r_srf = jnp.max(div(dn_new[:, L - 1, :], dn_tot[:, L - 1, :]),
                        axis=1)
        return jnp.maximum(r_toa, r_srf)

    def cond(carry):
        _, _, _, _, ratio, n = carry
        return jnp.any(ratio >= tol) & (jnp.max(n) < opts.max_orders)

    def body(carry):
        dn_prev, up_prev, dn_tot, up_tot, ratio, n = carry
        dn_new, up_new = order_step(dn_prev, up_prev)
        active = (ratio >= tol)[:, None, None]
        dn_tot = jnp.where(active, dn_tot + dn_new, dn_tot)
        up_tot = jnp.where(active, up_tot + up_new, up_tot)
        new_ratio = ratio_fn(dn_new, up_new, dn_tot, up_tot)
        ratio = jnp.where(active[:, 0, 0], new_ratio, ratio)
        n = n + jnp.where(active[:, 0, 0], 1, 0)
        return dn_new, up_new, dn_tot, up_tot, ratio, n

    dn1, up1 = i1[:, :, :M], i1[:, :, M:]
    # explicit above-tol seed (the loop must take ≥1 step); max(1/I1)
    # would be inf/NaN for any zero I1 entry in degenerate scenes
    ratio0 = jnp.full((B,), 2.0 * float(opts.tol), i1.dtype)
    carry = (dn1, up1, dn1, up1, ratio0, jnp.ones((B,), jnp.int32))
    _, _, dn_tot, up_tot, ratio, n = jax.lax.while_loop(cond, body, carry)

    sol = Solution(
        i_total=jnp.concatenate([dn_tot, up_tot], axis=-1), i1=i1,
        n_orders=n, converged=ratio < tol, tau=tau,
        idx_up=idx_up, idx_down=idx_down)
    if pad:
        sol = jax.tree_util.tree_map(lambda x: x[:B0], sol)
    return sol
