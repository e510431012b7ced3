"""Layer-axis (sequence/context-parallel) sharded affine scan.

SURVEY.md §5 "long-context analogue": the solver's τ-axis recurrence
    S_t = a_t·S_{t-1} + b_t
is the structural equivalent of a sequence dimension.  The default
keeps all L layers on-chip (one `lax.associative_scan`); this module is
the cross-chip variant for grids with L far beyond VMEM: layers are
sharded contiguously over a mesh axis, each device scans its local
shard, and the per-shard affine compositions are combined with ONE
all-gather (the affine maps form a monoid: (a,b)∘(a',b') = (aa',
a'b+b')), after which every device applies its incoming carry locally —
O(L/D) work, one small collective, exact same floating-point story as a
blocked sequential scan.

This is deliberately XLA-collective-based (all_gather over the mesh
axis) rather than a hand-rolled Pallas `make_async_remote_copy` ring:
the gathered per-shard summaries are (D, ...)-tiny, so latency is one
ICI hop and XLA overlaps it with the local scans.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _pair_scan(a, b, reverse=False):
    """Local associative scan of affine pairs; returns (A_t, B_t) with
    S_t = B_t + A_t·S_in for a carry S_in entering the shard."""
    def combine(left, right):
        al, bl = left
        ar, br = right
        return al * ar, bl * ar + br

    return jax.lax.associative_scan(combine, (a, b), axis=0, reverse=reverse)


def sharded_affine_scan(a, b, mesh: Mesh, axis: str = "data",
                        reverse: bool = False):
    """S_t = a_t·S_{t-1} + b_t (S_{-1}=0) with the LAYER axis (axis 0)
    sharded over ``mesh`` axis ``axis``.

    a, b: (L, ...) arrays (or already-sharded jax.Arrays); L must divide
    evenly by the mesh axis size.  Returns S with the same sharding.
    With ``reverse=True`` computes S_t = a_t·S_{t+1} + b_t (the upward
    sweep direction).
    """
    spec = P(axis)

    def local(a_loc, b_loc):
        # (A, B) prefix composition within the shard
        A, B = _pair_scan(a_loc, b_loc, reverse=reverse)
        edge = 0 if reverse else -1
        # per-shard total composition, gathered from every shard
        tots = jax.lax.all_gather((A[edge], B[edge]), axis)   # (D, ...)
        ta, tb = tots
        d = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        # exclusive prefix composition of the OTHER shards' totals:
        # carry entering this shard (identity = (1, 0))
        carry_a = jnp.ones_like(ta[0])
        carry_b = jnp.zeros_like(tb[0])
        if reverse:
            rng = range(d - 1, -1, -1)
        else:
            rng = range(d)
        for k in rng:                        # D is tiny (mesh axis size)
            take = (k < idx) if not reverse else (k > idx)
            na = carry_a * ta[k]
            nb = carry_b * ta[k] + tb[k]
            carry_a = jnp.where(take, na, carry_a)
            carry_b = jnp.where(take, nb, carry_b)
        return B + A * carry_b

    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec),
                       out_specs=spec, check_vma=False)
    with jax.set_mesh(mesh):
        a = jax.device_put(a, NamedSharding(mesh, spec))
        b = jax.device_put(b, NamedSharding(mesh, spec))
        return fn(a, b)
