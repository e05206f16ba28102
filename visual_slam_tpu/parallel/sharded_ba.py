"""Distributed bundle adjustment: observation-sharded Schur-CG over a mesh.

The BASELINE.json north-star component: partition the observation table
(equivalently, map-point blocks' measurement rows) across devices/hosts;
each shard builds its partial normal-equation blocks and Schur-matvec
contributions from its rows; `jax.lax.psum` over the mesh combines them
into the replicated reduced camera system — collectives ride ICI within a
slice, DCN across hosts. The math lives in models/ba.py (axis_name-aware);
this module wraps it in shard_map over a Mesh.

Scaling semantics preserved from the reference: the result is numerically
identical to single-device `ba.optimize` — sharding only changes where the
segment-sums run (test_parallel.py asserts this).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import ba as ba_mod


def shard_problem(p: ba_mod.BAProblem, n_shards: int) -> ba_mod.BAProblem:
    """Pad the observation table so O divides the shard count (w=0 padding)."""
    O = p.uv.shape[0]
    target = ((O + n_shards - 1) // n_shards) * n_shards
    if target == O:
        return p
    pad = target - O
    return p._replace(
        cam=jnp.concatenate([p.cam, jnp.zeros(pad, p.cam.dtype)]),
        pnt=jnp.concatenate([p.pnt, jnp.zeros(pad, p.pnt.dtype)]),
        uv=jnp.concatenate([p.uv, jnp.zeros((pad, 2), p.uv.dtype)]),
        w=jnp.concatenate([p.w, jnp.zeros(pad, p.w.dtype)]),
    )


def optimize_sharded(
    p: ba_mod.BAProblem,
    mesh: Mesh,
    n_iters: int = 10,
    cg_iters: int = 24,
    points_fixed: bool = False,
):
    """Run LM-Schur-CG bundle adjustment with the observation table sharded
    over `mesh` (axis name taken from the mesh's single axis)."""
    (axis,) = mesh.axis_names
    n = mesh.devices.size
    p = shard_problem(p, n)

    rep = P()
    obs = P(axis)
    in_specs = ba_mod.BAProblem(
        R=rep, t=rep, X=rep, cam=obs, pnt=obs, uv=obs, w=obs, intr=rep,
        cam_fixed=rep, se_i=rep, se_j=rep, se_meas=rep, se_w=rep,
    )
    out_specs = (in_specs._replace(cam=obs, pnt=obs, uv=obs, w=obs), rep)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(in_specs,),
        out_specs=out_specs,
    )
    def _run(prob):
        return ba_mod.optimize(
            prob,
            n_iters=n_iters,
            cg_iters=cg_iters,
            points_fixed=points_fixed,
            axis_name=axis,
        )

    return _run(p)
