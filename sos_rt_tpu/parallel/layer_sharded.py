"""Layer-sharded whole-column SOS solve (the long-context solver mode).

``solve_column_layer_sharded`` runs the FULL order loop with the τ/layer
axis sharded contiguously over a mesh axis — the production form of the
``sharded_affine_scan`` primitive (SURVEY.md §5 "long-context analogue")
for grids whose layer count exceeds one chip's memory.  Per order,
entirely inside one ``shard_map``:

1. Jₙ source — layer-parallel matmuls (operators replicated);
2. quadrature sources — each layer needs its *neighbor's* Jₙ row: ONE
   `ppermute` halo exchange per direction;
3. both affine sweeps — local pair-scans + one small `all_gather` of the
   per-shard affine compositions (the monoid combine of
   parallel/layer_scan.py), then a local carry application;
4. the surface BC, the two region-join smoothing deltas and the
   convergence rows are single layer rows of a sharded field — each is
   read with a masked `psum` (one-hot over the owning shard), costing
   one (2M,)-sized collective;
5. the µ→0⁻ polyfit band and the µ→0⁺ smoothing walk are layer-local.

Scope: grids WITHOUT live small-µ machinery (the windowed integral
gathers arbitrary upstream layers — the same eligibility rule as the
mega kernel: no |µ| < MU_THRESHOLD columns, or every column's polyfit
band overwrites them).  Exact vs ``solve_column`` up to scan
reassociation (f64: ≤1e-12; tests/test_layer_sharded.py).

Reference match: the same order loop as sos_rt_tpu/solver.py
(SOS_Aer_main_lambertian.py:311-460), re-laid-out for cross-chip layer
sharding.

Crossover (when to use): a single column's order step moves ~10 (L, 2M)
planes through HBM; one v5e chip fits L ≈ 250k·(501/M)·(800/L-norm)
layers before HBM pressure (BASELINE.md scaling note), so this mode is
for extreme-L profiles (line-by-line spectral stacks, exoplanet GCM
columns) or for latency-sharding one huge column; batched throughput
workloads should keep DP over columns.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sos_rt_tpu.config import GridSpec, MATMUL_PRECISION, Scene, SolverOptions
from sos_rt_tpu.grids import tau_profile
from sos_rt_tpu.ops.first_order import first_order
from sos_rt_tpu.ops.source import source_operator
from sos_rt_tpu.ops.sweeps import (
    band_choice,
    build_stencils,
    polyfit_band_variants,
    select_band_choice,
    smooth_up_rows,
)
from sos_rt_tpu.solver import PhaseTables, Solution


def _pair_scan(a, b, reverse=False):
    def combine(left, right):
        al, bl = left
        ar, br = right
        return al * ar, bl * ar + br

    return jax.lax.associative_scan(combine, (a, b), axis=0, reverse=reverse)


def _sharded_scan(a_loc, b_loc, axis, reverse=False):
    """S_t = a_t·S_{t-1} + b_t across shards (S before the first row = 0);
    local monoid pair-scan + one all_gather of shard compositions."""
    A, B = _pair_scan(a_loc, b_loc, reverse=reverse)
    edge = 0 if reverse else -1
    tots = jax.lax.all_gather((A[edge], B[edge]), axis)
    ta, tb = tots
    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    carry_a = jnp.ones_like(ta[0])
    carry_b = jnp.zeros_like(tb[0])
    rng = range(d - 1, -1, -1) if reverse else range(d)
    for k in rng:                      # d is the (small) mesh axis size
        take = (k > idx) if reverse else (k < idx)
        na = carry_a * ta[k]
        nb = carry_b * ta[k] + tb[k]
        carry_a = jnp.where(take, na, carry_a)
        carry_b = jnp.where(take, nb, carry_b)
    return B + A * carry_b


def _row_at(field_loc, row_global, axis, rows_per_shard):
    """Extract global layer row ``row_global`` of a layer-sharded field
    as a replicated (2M,) vector: masked one-hot sum + psum."""
    idx = jax.lax.axis_index(axis)
    local = row_global - idx * rows_per_shard
    t = jnp.arange(rows_per_shard)
    onehot = (t == local).astype(field_loc.dtype)[:, None]
    return jax.lax.psum(jnp.sum(field_loc * onehot, axis=0), axis)


def _shift_from_prev(x_loc, axis, fill=0.0):
    """y_t = x_{t-1} across the global layer axis (halo from the
    previous shard via one ppermute); y_0 = fill."""
    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    last = x_loc[-1]
    halo = jax.lax.ppermute(last, axis,
                            [(i, (i + 1) % d) for i in range(d)])
    halo = jnp.where(idx == 0, fill, halo)
    return jnp.concatenate([halo[None], x_loc[:-1]], axis=0)


def _shift_from_next(x_loc, axis, fill=0.0):
    """y_t = x_{t+1} across the global layer axis; y_{L-1} = fill."""
    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    first = x_loc[0]
    halo = jax.lax.ppermute(first, axis,
                            [(i, (i - 1) % d) for i in range(d)])
    halo = jnp.where(idx == d - 1, fill, halo)
    return jnp.concatenate([x_loc[1:], halo[None]], axis=0)


def layer_sharded_supported(grid: GridSpec, stencils=None) -> bool:
    """Same small-µ eligibility rule as the mega kernel: the windowed
    integral's arbitrary-layer gathers are the one cross-shard-hostile
    stage; grids without live small-µ columns are exact here."""
    if stencils is None:
        stencils = build_stencils(grid.mu(), grid.nb_angles)
    return stencils.small_cols.size == 0


def solve_column_layer_sharded(scene: Scene, tables: PhaseTables,
                               grid: GridSpec, opts: SolverOptions,
                               mesh: Mesh, axis: str = "data"):
    """One-column SOS solve with layers sharded over ``mesh[axis]``.

    Returns a :class:`Solution` whose field arrays are layer-sharded
    jax.Arrays.  L must divide the mesh axis size.  Requires
    ``layer_sharded_supported(grid)``.
    """
    stencils = build_stencils(grid.mu(), grid.nb_angles)
    if not layer_sharded_supported(grid, stencils):
        raise ValueError(
            "layer-sharded solve requires a grid without live small-µ "
            "columns (same eligibility as the mega kernel)")
    dtype = jnp.dtype(opts.dtype)
    L, M = grid.nb_layers, grid.nb_angles
    d = mesh.shape[axis]
    if L % d:
        raise ValueError(f"nb_layers {L} not divisible by mesh axis {d}")
    rows = L // d
    mu = jnp.asarray(grid.mu(), dtype)
    w_mu = jnp.asarray(grid.trapz_weights(), dtype)

    tau, idx_up, idx_down = tau_profile(
        scene.tau_star_atm, scene.tau_star_aer, scene.z0, scene.z_up,
        scene.z_down, L)
    tau = tau.astype(dtype)
    dtau_aer = scene.tau_star_aer / (idx_down + 1 - idx_up)
    dtau_atm = scene.tau_star_atm / L
    w_atm = dtau_atm / (dtau_atm + dtau_aer)
    w_aer = dtau_aer / (dtau_atm + dtau_aer)

    i1 = first_order(opts.surface, tau, mu, M, scene.mu0, scene.grd_alb,
                     scene.alb_atm, scene.alb_aer, tables.p0_atm,
                     tables.p_atm, tables.p0_aer, tables.p_aer,
                     idx_up, idx_down, w_atm, w_aer, w_mu)

    a_atm = source_operator(tables.p_atm.astype(dtype), w_mu)
    a_aer = source_operator(tables.p_aer.astype(dtype), w_mu)

    # ---- loop-invariant per-layer arrays, built densely then sharded
    # (O(L·M) once; for L beyond one host's memory this precompute would
    # itself be sharded — the loop below only ever touches local rows) --
    t_idx = jnp.arange(L)
    mu_d = mu[:M]
    safe_mu_d = jnp.where(mu_d == 0, -1.0, mu_d)
    mu_u = mu[M + 1:]
    # per-layer sweep coefficients in "row t" form:
    #   down: S_t = A_t S_{t-1} + B_t, A_t = e^{Δτ_{t-1,t}/µ} (A_0=1),
    #         B_t = ½Δτ·(jn_{t-1}·A_t + jn_t)
    #   up:   S_t = A_t S_{t+1} + B_t, A_t = e^{-Δτ_{t,t+1}/µ} (A_{L-1}=1)
    dtau_prev = jnp.concatenate([jnp.zeros((1,), dtype), jnp.diff(tau)])
    dtau_next = jnp.concatenate([jnp.diff(tau), jnp.zeros((1,), dtype)])
    a_down = jnp.exp(dtau_prev[:, None] / safe_mu_d[None, :])    # (L, M)
    a_up = jnp.where((t_idx == L - 1)[:, None], 1.0,
                     jnp.exp(-dtau_next[:, None] / mu_u[None, :]))
    join = (t_idx == idx_down) | (t_idx == idx_up - 1) | (t_idx == L - 1)
    c_up = jnp.where(join[:, None], 0.0,
                     0.5 * dtau_next[:, None] / mu_u[None, :])   # (L, M-1)
    in_layer = ((t_idx >= idx_up) & (t_idx <= idx_down))[:, None]

    choice_a = band_choice(tau[idx_up - 1])
    choice_bc = band_choice(tau[idx_down])
    pmask = jnp.stack([jnp.asarray(stencils.poly_mask[c]) for c in range(4)])
    valid_a = select_band_choice(pmask, choice_a)
    valid_bc = select_band_choice(pmask, choice_bc)
    in_a_col = (t_idx < idx_up)[:, None]
    band_valid = jnp.where(in_a_col, valid_a[None, :], valid_bc[None, :])
    band_cols = M - 1 - jnp.arange(stencils.band_max)

    mirror_up = 2 * M - 1 - jnp.arange(M + 1, 2 * M)
    lamb_w = w_mu[:M] * mu[:M]
    att_join1 = jnp.exp(-jnp.maximum(tau[idx_down + 1] - tau, 0.0)[:, None]
                        / mu_u[None, :])
    att_join2 = jnp.exp(-jnp.maximum(tau[idx_up] - tau, 0.0)[:, None]
                        / mu_u[None, :])
    mask_join1 = (t_idx <= idx_down)[:, None]
    mask_join2 = (t_idx < idx_up)[:, None]

    tol = jnp.asarray(opts.tol, dtype)
    spec = P(axis)
    repl = P()

    def local_solve(i1_loc, a_down_loc, a_up_loc, c_up_loc, in_layer_loc,
                    band_valid_loc, dtau_prev_loc, att_j1_loc, att_j2_loc,
                    mask_j1_loc, mask_j2_loc):
        def source_fn(in_prev):
            jn_atm = (scene.alb_atm / 4.0) * jnp.dot(
                in_prev, a_atm, precision=MATMUL_PRECISION)
            jn_aer = (scene.alb_aer / 4.0) * jnp.dot(
                in_prev, a_aer, precision=MATMUL_PRECISION)
            return jnp.where(in_layer_loc, w_atm * jn_atm + w_aer * jn_aer,
                             jn_atm)

        def compute_down(jn):
            jn_d = jn[:, :M]
            jn_prev = _shift_from_prev(jn_d, axis)           # jn_{t-1}
            b = 0.5 * dtau_prev_loc[:, None] * (jn_prev * a_down_loc + jn_d)
            s = _sharded_scan(a_down_loc, b, axis)
            raw = -s / safe_mu_d[None, :]
            raw = raw.at[:, M - 1].set(0.0)
            polys, _ = polyfit_band_variants(raw, stencils)
            poly = jnp.where(in_a_col_loc,
                             select_band_choice(polys, choice_a),
                             select_band_choice(polys, choice_bc))
            cur = raw[:, band_cols]
            return raw.at[:, band_cols].set(
                jnp.where(band_valid_loc, poly, cur))

        def compute_up(jn, down):
            down_last = _row_at(down, L - 1, axis, rows)     # (M,)
            if opts.surface == "lambertian":
                f_down = -jnp.sum(lamb_w * down_last)
                bc = jnp.full((M - 1,), 2.0 * scene.grd_alb * f_down, dtype)
            else:
                full_last = jnp.concatenate(
                    [down_last, jnp.zeros((M,), dtype)])
                bc = scene.grd_alb * full_last[mirror_up]
            jn_u = jn[:, M + 1:]
            jn_next = _shift_from_next(jn_u, axis)           # jn_{t+1}
            b = c_up_loc * (jn_u + jn_next * a_up_loc)
            # surface row carries the BC: a_{L-1}=1, c dropped there
            is_last = (jax.lax.axis_index(axis) == jax.lax.axis_size(axis)
                       - 1)
            t_loc = jnp.arange(rows)
            last_row = (t_loc == rows - 1)[:, None] & is_last
            b = jnp.where(last_row, bc[None, :], b)
            raw = _sharded_scan(a_up_loc, b, axis, reverse=True)

            field = jnp.concatenate(
                [jnp.zeros_like(jn[:, :M]), jn[:, M:M + 1], raw], axis=1)

            def delta_at(field_now, row):
                r = _row_at(field_now, row, axis, rows)[None, :]
                return (smooth_up_rows(r, mu, M)[0] - r[0])[M + 1:]

            d1 = delta_at(field, idx_down + 1)
            field = field.at[:, M + 1:].add(
                jnp.where(mask_j1_loc, d1[None, :] * att_j1_loc, 0.0))
            d2 = delta_at(field, idx_up)
            field = field.at[:, M + 1:].add(
                jnp.where(mask_j2_loc, d2[None, :] * att_j2_loc, 0.0))
            return smooth_up_rows(field, mu, M)

        in_a_col_loc = jnp.take(
            in_a_col, jax.lax.axis_index(axis) * rows + jnp.arange(rows),
            axis=0)

        def order_step(in_prev):
            jn = source_fn(in_prev)
            down = compute_down(jn)
            up = compute_up(jn, down)
            return jnp.concatenate([down[:, :M], up[:, M:]], axis=1)

        def ratio_fn(in_cur, i_tot):
            div = lambda a, b: jnp.where(
                b != 0, a / jnp.where(b != 0, b, 1.0), 0.0)
            top_new = _row_at(in_cur, 0, axis, rows)
            top_tot = _row_at(i_tot, 0, axis, rows)
            bot_new = _row_at(in_cur, L - 1, axis, rows)
            bot_tot = _row_at(i_tot, L - 1, axis, rows)
            r_toa = jnp.max(div(top_new[M:], top_tot[M:]))
            r_srf = jnp.max(div(bot_new[:M], bot_tot[:M]))
            return jnp.maximum(r_toa, r_srf)

        def cond(carry):
            _, _, ratio, n = carry
            return (ratio >= tol) & (n < opts.max_orders)

        def body(carry):
            in_prev, i_tot, ratio, n = carry
            in_new = order_step(in_prev)
            i_tot = i_tot + in_new
            ratio = ratio_fn(in_new, i_tot)
            return in_new, i_tot, ratio, n + 1

        ratio0 = jnp.asarray(2.0 * opts.tol, i1_loc.dtype)
        carry = (i1_loc, i1_loc, ratio0, jnp.asarray(1, jnp.int32))
        _, i_tot, ratio, n = jax.lax.while_loop(cond, body, carry)
        return i_tot, n, ratio < tol

    fn = jax.shard_map(
        local_solve, mesh=mesh,
        in_specs=(spec,) * 11,
        out_specs=(spec, repl, repl), check_vma=False)

    put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    with jax.set_mesh(mesh):
        i_tot, n, conv = jax.jit(fn)(
            put(i1), put(a_down), put(a_up), put(c_up),
            put(in_layer), put(band_valid), put(dtau_prev),
            put(att_join1), put(att_join2),
            put(jnp.broadcast_to(mask_join1, (L, 1))),
            put(jnp.broadcast_to(mask_join2, (L, 1))))
    return Solution(i_total=i_tot, i1=i1, n_orders=n, converged=conv,
                    tau=tau, idx_up=idx_up, idx_down=idx_down)
