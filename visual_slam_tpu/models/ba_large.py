"""Large-map bundle adjustment: implicit Schur PCG with per-slot W blocks.

The online solver (models/ba.py) materializes the camera-point coupling
W as a dense (6,3,K,P) tensor and camera-side reductions as one-hot
(K,N) matmuls — ideal MXU work at the tracking scale (K<=~128,
P<=~16k), impossible at BASELINE.json config #5 scale (~5k keyframes,
~1M landmarks: dense W alone would be >100 GB). This module is the same
LM + marginalized-landmark Schur math (≙ g2o's
VertexSBAPointXYZ.set_marginalized, reference LocalBA.py:68-77) in a
memory-linear form:

  * every per-observation quantity stays PER-SLOT: W is (N,6,3), never
    (K,P); Jacobians are (N,2,6)/(N,2,3);
  * camera gathers are direct `x[cam]` row gathers (a (K,N) one-hot is
    unrepresentable at this K*N);
  * camera-side segment reductions are `jax.ops.segment_sum` over the
    slot->camera index (point-side sums stay reshape(P,Q).sum as in the
    planar layout — observations remain grouped by landmark);
  * the reduced camera system S = U - W V^{-1} W^T is NEVER formed:
    block-Jacobi PCG applies it as two per-slot contractions + one
    segment sum per matvec.

Sharding: identical contract to models/ba.py — the landmark axis (and
its N = P*Q slots) shards over the mesh; camera-side partial sums
(U, g_c, every matvec's y) are `psum`-ed; the landmark side never
leaves its shard. parallel/sharded_ba.optimize_large_sharded wraps this
in shard_map; tests assert numerical identity with models/ba.py at
small scale and single-vs-8-device identity at large scale.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie
from . import ba as ba_mod
from .ba import BAProblem, HUBER_DELTA

HI = jax.lax.Precision.HIGHEST


def _project(p: BAProblem):
    """Per-slot projection, N-major: returns (r (N,2), Xc (N,3), Rn (N,3,3),
    iz (N,), w_irls (N,))."""
    P, N = p.X.shape[0], p.cam.shape[0]
    Q = N // P
    fx, fy, cx, cy = p.intr[0], p.intr[1], p.intr[2], p.intr[3]
    Rn = p.R[p.cam]  # (N,3,3) row gather — no one-hot at this scale
    tn = p.t[p.cam]  # (N,3)
    Xn = jnp.broadcast_to(p.X[:, None, :], (P, Q, 3)).reshape(N, 3)
    Xc = jnp.einsum("nij,nj->ni", Rn, Xn, precision=HI) + tn
    z = Xc[:, 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    iz = 1.0 / z_safe
    pred = jnp.stack(
        [fx * Xc[:, 0] * iz + cx, fy * Xc[:, 1] * iz + cy], axis=-1
    )
    r = pred - p.uv.T  # (N,2)
    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    w_rob = jnp.where(rn <= HUBER_DELTA, 1.0, HUBER_DELTA / rn)
    w_irls = p.w * w_rob * (z > 1e-6)
    return r, Xc, Rn, iz, w_irls


def _jacobians(Xc, Rn, iz, intr):
    """N-major Jacobians: Jc (N,2,6), Jp (N,2,3) — same hand-derived
    products as ba._jacobians_planar, transposed layout."""
    fx, fy = intr[0], intr[1]
    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    a = fx * iz
    b = -fx * x * iz * iz
    c = fy * iz
    d = -fy * y * iz * iz
    zero = jnp.zeros_like(a)
    Jc = jnp.stack(
        [
            jnp.stack([b * y, a * z - b * x, -a * y, a, zero, b], axis=-1),
            jnp.stack([-c * z + d * y, -d * x, c * x, zero, c, d], axis=-1),
        ],
        axis=1,
    )  # (N,2,6)
    J_proj = jnp.stack(
        [
            jnp.stack([a, zero, b], axis=-1),
            jnp.stack([zero, c, d], axis=-1),
        ],
        axis=1,
    )  # (N,2,3)
    Jp = jnp.einsum("nrc,ncj->nrj", J_proj, Rn, precision=HI)  # (N,2,3)
    return Jc, Jp


def _cost(p: BAProblem, axis_name=None) -> jnp.ndarray:
    r, Xc, _, _, _ = _project(p)
    rn2 = jnp.sum(r * r, axis=-1)
    rn = jnp.sqrt(rn2 + 1e-12)
    rho = jnp.where(
        rn <= HUBER_DELTA, rn2, 2.0 * HUBER_DELTA * rn - HUBER_DELTA**2
    )
    zmask = (Xc[:, 2] > 1e-6).astype(p.w.dtype)
    cost_obs = ba_mod._psum(jnp.sum(p.w * zmask * rho), axis_name)
    r_s, _, _ = ba_mod._scale_edge_terms(p)
    return cost_obs + jnp.sum(p.se_w * r_s * r_s)


def _seg_cam(data, cam, K):
    """Segment-sum per-slot data (N, ...) onto cameras -> (K, ...)."""
    return jax.ops.segment_sum(data, cam, num_segments=K)


def _inv3(V: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of (P,3,3) SPD blocks (elementwise —
    a LAPACK loop over 1M tiny blocks would dominate the build)."""
    a, b, c = V[:, 0, 0], V[:, 0, 1], V[:, 0, 2]
    d, e, f = V[:, 1, 0], V[:, 1, 1], V[:, 1, 2]
    g, h, i = V[:, 2, 0], V[:, 2, 1], V[:, 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    rows = jnp.stack(
        [
            jnp.stack([A, B, C], -1),
            jnp.stack([D, E, F], -1),
            jnp.stack([G, H, I], -1),
        ],
        axis=1,
    )
    return rows / det[:, None, None]


def _build(p: BAProblem, lm_lambda, axis_name=None):
    """Hessian pieces, memory linear in N: U (K,6,6) psum-ed + damped,
    V_inv (P,3,3) local, g_c (K,6) psum-ed, g_p (P,3) local, WO (N,6,3)
    local, H_ij (E,6,6) scale-edge cross blocks."""
    K = p.R.shape[0]
    P = p.X.shape[0]
    N = p.cam.shape[0]
    Q = N // P
    r, Xc, Rn, iz, w_irls = _project(p)
    Jc, Jp = _jacobians(Xc, Rn, iz, p.intr)
    wJc = Jc * w_irls[:, None, None]
    wJp = Jp * w_irls[:, None, None]
    U = _seg_cam(jnp.einsum("nri,nrj->nij", wJc, Jc, precision=HI), p.cam, K)
    g_c = _seg_cam(jnp.einsum("nri,nr->ni", wJc, r, precision=HI), p.cam, K)
    V = jnp.einsum("nri,nrj->nij", wJp, Jp, precision=HI).reshape(
        P, Q, 3, 3
    ).sum(1)
    g_p = jnp.einsum("nri,nr->ni", wJp, r, precision=HI).reshape(P, Q, 3).sum(1)
    WO = jnp.einsum("nri,nrj->nij", wJc, Jp, precision=HI)  # (N,6,3)
    U = ba_mod._psum(U, axis_name)
    g_c = ba_mod._psum(g_c, axis_name)
    # Scale edges (replicated, added after psum; ≙ AddScalingEdge chain).
    r_s, Ji, Jj = ba_mod._scale_edge_terms(p)
    wJi = Ji * p.se_w[:, None]
    wJj = Jj * p.se_w[:, None]
    U = U.at[p.se_i].add(jnp.einsum("ek,el->ekl", wJi, Ji))
    U = U.at[p.se_j].add(jnp.einsum("ek,el->ekl", wJj, Jj))
    H_ij = jnp.einsum("ek,el->ekl", wJi, Jj)
    g_c = g_c.at[p.se_i].add(wJi * r_s[:, None])
    g_c = g_c.at[p.se_j].add(wJj * r_s[:, None])
    U = U + lm_lambda * jnp.eye(6, dtype=U.dtype)[None]
    V = V + lm_lambda * jnp.eye(3, dtype=V.dtype)[None]
    V_inv = _inv3(V)  # (P,3,3); padding rows are lambda*I -> invertible
    return U, V_inv, g_c, g_p, WO, H_ij


def _schur_matvec(x, p, U, V_inv, WO, H_ij, axis_name):
    """y = (U - W V^{-1} W^T) x without forming S: two per-slot
    contractions and one camera segment-sum per application."""
    K = U.shape[0]
    P = V_inv.shape[0]
    N = WO.shape[0]
    Q = N // P
    x = ba_mod._mask_cam(x, p.cam_fixed)
    y = jnp.einsum("kij,kj->ki", U, x)
    xc = x[p.cam]  # (N,6)
    t1 = jnp.einsum("nij,ni->nj", WO, xc, precision=HI)  # W^T x per slot
    t1p = t1.reshape(P, Q, 3).sum(1)  # landmark-local
    t2 = jnp.einsum("pij,pj->pi", V_inv, t1p, precision=HI)
    t2n = jnp.broadcast_to(t2[:, None, :], (P, Q, 3)).reshape(N, 3)
    t3 = jnp.einsum("nij,nj->ni", WO, t2n, precision=HI)  # (N,6)
    y2 = ba_mod._psum(_seg_cam(t3, p.cam, K), axis_name)
    y = y - y2
    y = y.at[p.se_i].add(jnp.einsum("ekl,el->ek", H_ij, x[p.se_j]))
    y = y.at[p.se_j].add(jnp.einsum("elk,el->ek", H_ij, x[p.se_i]))
    return ba_mod._mask_cam(y, p.cam_fixed)


def _solve_delta(p, lm_lambda, cg_iters, points_fixed, axis_name=None):
    K = p.R.shape[0]
    P = p.X.shape[0]
    N = p.cam.shape[0]
    Q = N // P
    U, V_inv, g_c, g_p, WO, H_ij = _build(p, lm_lambda, axis_name)
    g_c = ba_mod._mask_cam(g_c, p.cam_fixed)
    U_inv = ba_mod._inv6(U)

    if points_fixed:
        delta_c = -jnp.einsum("kij,kj->ki", U_inv, g_c)
        return ba_mod._mask_cam(delta_c, p.cam_fixed), jnp.zeros_like(p.X)

    Vg = jnp.einsum("pij,pj->pi", V_inv, g_p, precision=HI)
    Vgn = jnp.broadcast_to(Vg[:, None, :], (P, Q, 3)).reshape(N, 3)
    b_sub = ba_mod._psum(
        _seg_cam(jnp.einsum("nij,nj->ni", WO, Vgn, precision=HI), p.cam, K),
        axis_name,
    )
    b = ba_mod._mask_cam(-(g_c - b_sub), p.cam_fixed)

    def matvec(x):
        return _schur_matvec(x, p, U, V_inv, WO, H_ij, axis_name)

    def precond(x):
        return ba_mod._mask_cam(
            jnp.einsum("kij,kj->ki", U_inv, x), p.cam_fixed
        )

    delta_c = ba_mod._pcg(matvec, precond, b, cg_iters)
    # Back-substitute landmarks: delta_p = -V^{-1} (g_p + W^T delta_c).
    dcn = delta_c[p.cam]  # (N,6)
    back = jnp.einsum("nij,ni->nj", WO, dcn, precision=HI).reshape(
        P, Q, 3
    ).sum(1)
    delta_p = -jnp.einsum("pij,pj->pi", V_inv, g_p + back, precision=HI)
    return delta_c, delta_p


@partial(
    jax.jit,
    static_argnames=("n_iters", "cg_iters", "points_fixed", "axis_name"),
)
def optimize(
    p: BAProblem,
    n_iters: int = 10,
    cg_iters: int = 12,
    points_fixed: bool = False,
    init_lambda: float = 1e-4,
    axis_name: str | None = None,
) -> tuple[BAProblem, jnp.ndarray]:
    """LM loop — same accept/reject structure as ba.optimize, large-map
    kernels. Returns (optimized problem, final cost)."""

    def step(carry, _):
        prob, lam, cost = carry
        delta_c, delta_p = _solve_delta(
            prob, lam, cg_iters, points_fixed, axis_name
        )
        cand = ba_mod._apply(prob, delta_c, delta_p)
        new_cost = _cost(cand, axis_name)
        improved = new_cost < cost
        prob = jax.tree.map(lambda a, b: jnp.where(improved, a, b), cand, prob)
        cost = jnp.where(improved, new_cost, cost)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e2)
        return (prob, lam, cost), cost

    cost0 = _cost(p, axis_name)
    (p_out, _, cost_out), _ = jax.lax.scan(
        step,
        (p, jnp.asarray(init_lambda, p.R.dtype), cost0),
        None,
        length=n_iters,
    )
    return p_out, cost_out
