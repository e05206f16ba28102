"""Pose-graph optimization: Gauss-Newton over SE(3) relative-pose edges and
scale edges, batched over the edge table.

TPU-native replacement for the reference's g2o pose-graph pieces:
`add_edge_between_poses` (EdgeSE3 with DCS robust kernel, LocalBA.py:97-113)
and `AddScalingEdge` (EdgeSBAScale measuring the relative-translation norm,
LocalBA.py:115-131), used to stabilize monocular scale across the keyframe
chain — the scale-drift correction mode of BASELINE.json config #4.

Residuals:
  SE3 edge (i,j) with measurement Z_ij (j-from-i):  r = log(Z_ij^{-1} T_i T_j^{-1})
    for world->camera poses T: T_i T_j^{-1} maps cam-j coords to cam-i.
  Scale edge (i,j) with measurement s_ij:           r = ||t of (T_i T_j^{-1})|| - s_ij

All edges are processed as one batched table (edge_i, edge_j, Z, w); the
Jacobians come from jax.jacfwd on the per-edge residual, and the normal
equations assemble with segment-sums — the same fixed-shape pattern as
models/ba.py. The solve is a dense 6K Cholesky (keyframe counts are small;
a CG variant drops in for large graphs).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie


class PoseGraph(NamedTuple):
    R: jnp.ndarray  # (K,3,3) world->camera
    t: jnp.ndarray  # (K,3)
    e_i: jnp.ndarray  # (E,) int32 first vertex
    e_j: jnp.ndarray  # (E,) int32 second vertex
    Z_R: jnp.ndarray  # (E,3,3) measured relative rotation (cam_j -> cam_i)
    Z_t: jnp.ndarray  # (E,3) measured relative translation
    w: jnp.ndarray  # (E,) edge weights (0 = padding)
    s_i: jnp.ndarray  # (S,) scale-edge first vertex
    s_j: jnp.ndarray  # (S,) scale-edge second vertex
    s_meas: jnp.ndarray  # (S,) measured ||t_rel||
    s_w: jnp.ndarray  # (S,) scale-edge weights
    fixed: jnp.ndarray  # (K,) bool


def _rel(R, t, i, j):
    """T_i T_j^{-1}: (R_rel, t_rel) mapping cam-j coords into cam-i."""
    Ri, ti = R[i], t[i]
    Rj, tj = R[j], t[j]
    R_rel = Ri @ Rj.swapaxes(-1, -2)
    t_rel = ti - jnp.einsum("...ij,...j->...i", R_rel, tj)
    return R_rel, t_rel


def _se3_residual(g: PoseGraph, R, t):
    R_rel, t_rel = _rel(R, t, g.e_i, g.e_j)
    dR = jnp.einsum("eji,ejk->eik", g.Z_R, R_rel)  # Z^T @ R_rel
    dt = jnp.einsum("eji,ej->ei", g.Z_R, t_rel - g.Z_t)
    # Chordal rotation residual vee(dR - dR^T)/2 instead of so3_log: it is
    # zero exactly where log is, agrees to first order, and — unlike log,
    # whose arccos derivative blows up at the identity — stays smooth under
    # jacfwd right where converged edges live.
    r_rot = lie.vee(dR - jnp.swapaxes(dR, -1, -2)) * 0.5
    return jnp.concatenate([r_rot, dt], axis=-1)  # (E,6)


def _scale_residual(g: PoseGraph, R, t):
    _, t_rel = _rel(R, t, g.s_i, g.s_j)
    # Epsilon-safe norm: padded/identity edges sit at t_rel == 0, where the
    # norm's derivative is NaN under jacfwd even at weight 0.
    return jnp.sqrt(jnp.sum(t_rel * t_rel, axis=-1) + 1e-12) - g.s_meas  # (S,)


def _total_residuals(g: PoseGraph, delta):
    """Residual vector as a function of per-pose se3 deltas (K,6)."""
    dR, dt = lie.se3_exp(delta)
    R = dR @ g.R
    t = jnp.einsum("kij,kj->ki", dR, g.t) + dt
    r_se3 = _se3_residual(g, R, t) * jnp.sqrt(g.w)[:, None]
    r_s = _scale_residual(g, R, t) * jnp.sqrt(g.s_w)
    return jnp.concatenate([r_se3.reshape(-1), r_s])


@partial(jax.jit, static_argnames=("n_iters",))
def optimize(g: PoseGraph, n_iters: int = 10, damping: float = 1e-6):
    """Gauss-Newton pose-graph solve. Returns updated (R, t) and final cost.

    The Jacobian of the full (6E+S,) residual w.r.t. the (K,6) deltas is
    formed with jacfwd — the graph is keyframe-sized, so the dense J and the
    6K x 6K normal system are small; XLA maps the solve onto the MXU.
    """
    K = g.R.shape[0]
    free = (~g.fixed).astype(g.R.dtype)

    def step(carry, _):
        g_cur = carry

        def res_fn(delta):
            return _total_residuals(g_cur, delta.reshape(K, 6))

        d0 = jnp.zeros(K * 6, g.R.dtype)
        r = res_fn(d0)
        J = jax.jacfwd(res_fn)(d0)  # (R, 6K)
        # Project out fixed poses.
        mask = jnp.repeat(free, 6)
        J = J * mask[None, :]
        H = J.T @ J + damping * jnp.eye(K * 6, dtype=J.dtype)
        grad = J.T @ r
        delta = -jnp.linalg.solve(H, grad) * mask
        dR, dt = lie.se3_exp(delta.reshape(K, 6))
        R_new = dR @ g_cur.R
        t_new = jnp.einsum("kij,kj->ki", dR, g_cur.t) + dt
        return g_cur._replace(R=R_new, t=t_new), jnp.sum(r * r)

    g_out, costs = jax.lax.scan(step, g, None, length=n_iters)
    return g_out.R, g_out.t, costs[-1]


def from_keyframe_chain(
    R: jnp.ndarray,
    t: jnp.ndarray,
    valid: jnp.ndarray,
    scale_meas: jnp.ndarray | None = None,
) -> PoseGraph:
    """Build a chain pose graph from consecutive keyframes, with optional
    scale edges (≙ the parent->child AddScalingEdge chain, LocalBA.py:159-162
    and frame parent links frame.py:71-76)."""
    K = R.shape[0]
    i = jnp.arange(K - 1)
    j = i + 1
    Z_R, Z_t = _rel(R, t, i, j)
    w = (valid[i] & valid[j]).astype(R.dtype)
    if scale_meas is None:
        scale_meas = jnp.linalg.norm(Z_t, axis=-1)
    fixed = jnp.zeros(K, bool).at[0].set(True) | ~valid
    return PoseGraph(
        R=R,
        t=t,
        e_i=i,
        e_j=j,
        Z_R=Z_R,
        Z_t=Z_t,
        w=w,
        s_i=i,
        s_j=j,
        s_meas=scale_meas,
        s_w=w,
        fixed=fixed,
    )
