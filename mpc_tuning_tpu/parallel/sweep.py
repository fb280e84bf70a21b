"""Sharded candidate sweeps over a 1-D device mesh.

Data-parallel axis = tuning candidates.  Constants (plant matrices,
prediction tensors) are replicated; the batched args (r, N, Nu, delta,
lambda) are sharded on axis 0.  XLA inserts the collectives; the final
objective argmin is an explicit `shard_map` reduction over ICI
(psum/pmin-style) so multi-host sweeps return the global incumbent without
host round-trips.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["candidate_mesh", "shard_candidates", "sharded_argmin_sweep",
           "pad_to_multiple"]


def candidate_mesh(devices=None, axis: str = "cand") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (axis,))


def pad_to_multiple(arr: np.ndarray, k: int, axis: int = 0):
    """Pad axis 0 to a multiple of k by repeating the last element."""
    n = arr.shape[axis]
    pad = (-n) % k
    if pad == 0:
        return arr, n
    last = np.take(arr, [-1], axis=axis)
    reps = [1] * arr.ndim
    reps[axis] = pad
    return np.concatenate([arr, np.tile(last, reps)], axis=axis), n


def _cand_spec(mesh: Mesh, ndim: int) -> P:
    """Axis-0 sharded over ALL mesh axes flattened (works for the 1-D
    'cand' mesh and the multihost ('host', 'ici') mesh alike)."""
    axes = tuple(mesh.axis_names)
    first = axes[0] if len(axes) == 1 else axes
    return P(first, *([None] * (ndim - 1)))


def shard_candidates(mesh: Mesh, *arrays):
    """Materialize each host array with axis-0 sharded over the mesh
    (arrays must already be padded to a multiple of the mesh size).

    Uses make_array_from_callback so the same path serves single-process
    meshes AND multi-host meshes where most shards are non-addressable —
    every process passes the IDENTICAL global array (deterministic host
    code) and only its local shards are built."""
    out = []
    for a in arrays:
        a = np.asarray(a)
        sh = NamedSharding(mesh, _cand_spec(mesh, a.ndim))
        out.append(jax.make_array_from_callback(
            a.shape, sh, lambda idx, a=a: a[idx]))
    return tuple(out)


def replicate_to_host(mesh: Mesh, arr) -> np.ndarray:
    """All-gather a candidate-sharded global array to full replication and
    return it as a host numpy array (valid on every process of a
    multi-host mesh — the jitted identity with a replicated out_sharding
    makes XLA insert the gather collective)."""
    sh = NamedSharding(mesh, P())
    gathered = jax.jit(lambda x: x, out_shardings=sh)(arr)
    return np.asarray(gathered.addressable_shards[0].data)


def sharded_argmin_sweep(mesh: Mesh, eval_fn, F_args, B_true: int):
    """Evaluate F = eval_fn(*F_args) with candidate-sharded inputs and
    reduce to (argmin index, min value) with an in-mesh collective.

    eval_fn: jax-traceable (batched args) -> (B,) objective values.
    F_args: already sharded/padded device arrays.
    """
    axis = mesh.axis_names[0]
    nd = mesh.devices.size

    @partial(jax.jit)
    def run(*args):
        F = eval_fn(*args)
        # mask padded lanes
        idx = jnp.arange(F.shape[0])
        F = jnp.where(idx < B_true, F, jnp.inf)
        best = jnp.argmin(F)
        return F, best, F[best]

    F, best, val = run(*F_args)
    return np.asarray(F)[:B_true], int(best), float(val)


def global_argmin_shard_map(mesh: Mesh, F_local_fn, args, B_true: int):
    """Explicit shard_map argmin: each shard computes its local objectives,
    then a pmin + index-select collective picks the global incumbent.
    Demonstrates the ICI reduction path (used by dryrun_multichip)."""
    axis = mesh.axis_names[0]
    nd = mesh.devices.size

    def body(*sharded):
        F = F_local_fn(*sharded)  # (B/nd,) local
        li = jnp.argmin(F)
        lv = F[li]
        shard_id = jax.lax.axis_index(axis)
        gi = li + shard_id * F.shape[0]
        vmin = jax.lax.pmin(lv, axis)
        # winner broadcasts its global index
        is_winner = (lv == vmin).astype(jnp.int32)
        gidx = jax.lax.pmax(jnp.where(is_winner > 0, gi, -1), axis)
        return vmin[None], gidx[None]

    in_specs = tuple(P(axis, *([None] * (np.ndim(a) - 1))) for a in args)
    f = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                      out_specs=(P(axis), P(axis)), check_vma=False)
    vmin, gidx = f(*args)
    return float(np.asarray(vmin)[0]), int(np.asarray(gidx)[0])
