"""Bundle adjustment: Levenberg-Marquardt with Schur-complement landmark
elimination, built for TPU as batched gathers, segment-sums, and small-block
matmuls — no sparse matrices, no per-edge Python loops.

TPU-native replacement for the reference's g2o back-end
(src/v2/LocalBA.py:20-229): `localBundleAdjustement` (poses + landmarks,
landmarks marginalized via Schur — g2o's `VertexSBAPointXYZ.set_marginalized`
at LocalBA.py:72) and `motionOnlyBundleAdjustement` (:195-229, landmarks and
keyframes fixed). The robust kernel is Huber at sqrt(5.991) (LocalBA.py:82);
the optional median-depth gauge normalization mirrors LocalBA.py:179-190.

Design (SURVEY.md §7): instead of assembling g2o's block-sparse Hessian and
running CHOLMOD, the reduced camera system S = U - W V^{-1} W^T is applied
*implicitly* inside a preconditioned conjugate-gradient solve. Every matvec
is one pass over the observation table:

    gather cam/point blocks -> small (2x6)/(2x3) dense products ->
    segment-sum back to cams/points

which XLA fuses into large batched einsums — and which shards over devices
by splitting the observation table and psum-ing the reduced results
(see parallel/sharded_ba.py).

State layout (fixed shapes, masked):
  poses:   R_cw (K,3,3), t_cw (K,3) world->camera
  points:  X (P,3)
  observations: cam (O,) int32, pnt (O,) int32, uv (O,2), w (O) >=0
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie

HUBER_DELTA = 2.4477  # sqrt(5.991), ≙ reference LocalBA.py:82


class BAProblem(NamedTuple):
    """A fixed-shape bundle-adjustment problem.

    Scale edges (se_*) pin the norms of relative translations between
    keyframe pairs — g2o's EdgeSBAScale as added per parent->child link by
    the reference on EVERY full BA (AddScalingEdge, LocalBA.py:115-131,
    :159-162). They are the monocular gauge stabilizer: without them a full
    BA can slide the newest keyframes along the scale direction while the
    reprojection cost still decreases.
    """

    R: jnp.ndarray  # (K,3,3) world->camera rotations
    t: jnp.ndarray  # (K,3) world->camera translations
    X: jnp.ndarray  # (P,3) landmarks
    cam: jnp.ndarray  # (O,) int32 camera index per observation
    pnt: jnp.ndarray  # (O,) int32 landmark index per observation
    uv: jnp.ndarray  # (O,2) measured pixels
    w: jnp.ndarray  # (O,) observation weights (0 = invalid/padding)
    intr: jnp.ndarray  # (4,) fx fy cx cy
    cam_fixed: jnp.ndarray  # (K,) bool — poses held constant (gauge/keyframes)
    se_i: jnp.ndarray  # (E,) int32 scale-edge first keyframe
    se_j: jnp.ndarray  # (E,) int32 scale-edge second keyframe
    se_meas: jnp.ndarray  # (E,) measured ||t_rel||
    se_w: jnp.ndarray  # (E,) scale-edge weights (0 = padding)
    # Optional ELL-format reduction tables (single-device fast path). TPU
    # scatter-adds serialize, so when these are provided every segment-sum
    # becomes gather + dense-axis sum: cam_obs (K,Qc) / pt_obs (P,Qp) hold
    # observation-row indices per camera / per landmark, with 0/1 validity.
    # None => scatter path (required for the observation-sharded solver,
    # whose shards cannot index a global table).
    cam_obs: jnp.ndarray | None = None  # (K,Qc) int32
    cam_obs_ok: jnp.ndarray | None = None  # (K,Qc) float32
    pt_obs: jnp.ndarray | None = None  # (P,Qp) int32
    pt_obs_ok: jnp.ndarray | None = None  # (P,Qp) float32


def make_problem(R, t, X, cam, pnt, uv, w, intr, cam_fixed,
                 se_i=None, se_j=None, se_meas=None, se_w=None,
                 cam_obs=None, cam_obs_ok=None, pt_obs=None, pt_obs_ok=None) -> BAProblem:
    """BAProblem constructor with empty-by-default scale edges."""
    if se_i is None:
        se_i = jnp.zeros(1, jnp.int32)
        se_j = jnp.zeros(1, jnp.int32)
        se_meas = jnp.zeros(1, R.dtype)
        se_w = jnp.zeros(1, R.dtype)
    return BAProblem(R, t, X, cam, pnt, uv, w, intr, cam_fixed,
                     se_i, se_j, se_meas, se_w,
                     cam_obs, cam_obs_ok, pt_obs, pt_obs_ok)


def build_ell_tables(cam, pnt, valid, K, P, max_per_cam, max_per_pnt):
    """Host-side (NumPy, vectorized) construction of the ELL tables."""
    import numpy as _np

    def _fill(keys, n_keys, Q):
        idxs = _np.where(_np.asarray(valid))[0]
        k = _np.asarray(keys)[idxs]
        order = _np.argsort(k, kind="stable")
        sk = k[order]
        si = idxs[order].astype(_np.int32)
        first = _np.searchsorted(sk, _np.arange(n_keys), side="left")
        pos = _np.arange(len(sk)) - first[sk]
        if len(pos) and pos.max() >= Q:
            raise RuntimeError("ELL table capacity exceeded")
        tab = _np.zeros((n_keys, Q), _np.int32)
        ok = _np.zeros((n_keys, Q), _np.float32)
        tab[sk, pos] = si
        ok[sk, pos] = 1.0
        return tab, ok

    cam_obs, cam_ok = _fill(cam, K, max_per_cam)
    pt_obs, pt_ok = _fill(pnt, P, max_per_pnt)
    return cam_obs, cam_ok, pt_obs, pt_ok


def _seg_cam(vals: jnp.ndarray, p: BAProblem, K: int) -> jnp.ndarray:
    """Sum per-observation values into camera slots: (O, D...) -> (K, D...)."""
    if p.cam_obs is not None:
        g = vals[p.cam_obs]  # (K,Qc,D...)
        ok = p.cam_obs_ok.reshape(p.cam_obs_ok.shape + (1,) * (g.ndim - 2))
        return jnp.sum(g * ok, axis=1)
    return jnp.zeros((K,) + vals.shape[1:], vals.dtype).at[p.cam].add(vals)


def _seg_pnt(vals: jnp.ndarray, p: BAProblem, P: int) -> jnp.ndarray:
    """Sum per-observation values into landmark slots: (O, D...) -> (P, D...)."""
    if p.pt_obs is not None:
        g = vals[p.pt_obs]  # (P,Qp,D...)
        ok = p.pt_obs_ok.reshape(p.pt_obs_ok.shape + (1,) * (g.ndim - 2))
        return jnp.sum(g * ok, axis=1)
    return jnp.zeros((P,) + vals.shape[1:], vals.dtype).at[p.pnt].add(vals)


def _scale_edge_residual(R, t, se_i, se_j, se_meas):
    """r_e = ||t_rel(i,j)|| - meas for keyframe pairs (world->cam poses)."""
    Ri, ti = R[se_i], t[se_i]
    Rj, tj = R[se_j], t[se_j]
    R_rel = jnp.einsum("eab,ecb->eac", Ri, Rj)  # R_i R_j^T
    t_rel = ti - jnp.einsum("eab,eb->ea", R_rel, tj)
    return jnp.sqrt(jnp.sum(t_rel * t_rel, axis=-1) + 1e-12) - se_meas


def _scale_edge_jacobians(p: BAProblem):
    """Per-edge residual + Jacobians wrt left-composed se3 deltas of (i, j).

    Returns r (E,), Ji (E,6), Jj (E,6). Uses jacfwd on the 12-dim per-edge
    perturbation (vmapped) — edges are keyframe-count sized, this is cheap.
    """
    def one_edge(Ri, ti, Rj, tj, meas):
        def res(d):
            di, dj = d[:6], d[6:]
            dRi, dti = lie.se3_exp(di)
            dRj, dtj = lie.se3_exp(dj)
            Ri_ = dRi @ Ri
            ti_ = dRi @ ti + dti
            Rj_ = dRj @ Rj
            tj_ = dRj @ tj + dtj
            R_rel = Ri_ @ Rj_.T
            t_rel = ti_ - R_rel @ tj_
            # Epsilon-safe norm: padded edges (i == j) sit at t_rel == 0,
            # where norm's derivative is undefined (NaN would poison the
            # weighted sums even at weight 0).
            return jnp.sqrt(jnp.sum(t_rel * t_rel) + 1e-12) - meas

        d0 = jnp.zeros(12, p.R.dtype)
        r = res(d0)
        J = jax.jacfwd(res)(d0)
        return r, J[:6], J[6:]

    return jax.vmap(one_edge)(
        p.R[p.se_i], p.t[p.se_i], p.R[p.se_j], p.t[p.se_j], p.se_meas
    )


def _residuals_and_jacobians(p: BAProblem):
    """Per-observation residuals and Jacobian blocks.

    Returns r (O,2), Jc (O,2,6) d r/d(cam se3 delta, left-composed),
    Jp (O,2,3) d r/d(landmark), w_irls (O,) robust*validity weight.
    """
    fx, fy = p.intr[0], p.intr[1]
    Rg = p.R[p.cam]  # (O,3,3)
    tg = p.t[p.cam]  # (O,3)
    Xg = p.X[p.pnt]  # (O,3)
    Xc = jnp.einsum("oij,oj->oi", Rg, Xg) + tg
    z = Xc[:, 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    inv_z = 1.0 / z_safe
    pred = jnp.stack(
        [fx * Xc[:, 0] * inv_z + p.intr[2], fy * Xc[:, 1] * inv_z + p.intr[3]],
        axis=-1,
    )
    r = pred - p.uv  # (O,2)
    # Robust Huber IRLS weight on the residual norm.
    rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
    w_rob = jnp.where(rn <= HUBER_DELTA, 1.0, HUBER_DELTA / rn)
    w_irls = p.w * w_rob * (z > 1e-6)
    # d(uv)/d(Xc): (O,2,3)
    zero = jnp.zeros_like(z)
    J_proj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * Xc[:, 0] * inv_z**2], -1),
            jnp.stack([zero, fy * inv_z, -fy * Xc[:, 1] * inv_z**2], -1),
        ],
        axis=-2,
    )
    # Camera: left-composed se3 delta => d(Xc)/d(delta) = [-[Xc]x | I]
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (Xc.shape[0], 3, 3))
    J_se3 = jnp.concatenate([-lie.hat(Xc), eye3], axis=-1)  # (O,3,6)
    Jc = jnp.einsum("oij,ojk->oik", J_proj, J_se3)  # (O,2,6)
    # Landmark: d(Xc)/d(Xw) = R_cw
    Jp = jnp.einsum("oij,ojk->oik", J_proj, Rg)  # (O,2,3)
    return r, Jc, Jp, w_irls


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _cost(p: BAProblem, axis_name=None) -> jnp.ndarray:
    """Robust (Huber) total cost (psum-reduced over observation shards)."""
    r, _, _, _ = _residuals_and_jacobians(p)
    rn2 = jnp.sum(r * r, axis=-1)
    rn = jnp.sqrt(rn2 + 1e-12)
    rho = jnp.where(
        rn <= HUBER_DELTA, rn2, 2.0 * HUBER_DELTA * rn - HUBER_DELTA**2
    )
    # Validity only — robustness is in rho itself.
    zmask = _depth_mask(p)
    cost_obs = _psum(jnp.sum(p.w * zmask * rho), axis_name)
    # Scale edges (replicated, computed identically on every shard — no psum).
    r_s = _scale_edge_residual(p.R, p.t, p.se_i, p.se_j, p.se_meas)
    return cost_obs + jnp.sum(p.se_w * r_s * r_s)


def _depth_mask(p: BAProblem) -> jnp.ndarray:
    Rg = p.R[p.cam]
    tg = p.t[p.cam]
    Xc = jnp.einsum("oij,oj->oi", Rg, p.X[p.pnt]) + tg
    return (Xc[:, 2] > 1e-6).astype(p.w.dtype)


def _build_blocks(p: BAProblem, lm_lambda, axis_name=None):
    """Hessian blocks and gradients of the normal equations.

    U (K,6,6), V (P,3,3) (damped), g_c (K,6), g_p (P,3), plus the
    per-observation pieces needed for implicit Schur matvecs.
    """
    K = p.R.shape[0]
    P = p.X.shape[0]
    r, Jc, Jp, w = _residuals_and_jacobians(p)
    # Weighted Jacobians (weight applied once — W J products use sqrt? No:
    # all products below are J^T W J, so fold w into one side).
    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]
    U = _seg_cam(jnp.einsum("oik,oil->okl", wJc, Jc), p, K)
    V = _seg_pnt(jnp.einsum("oik,oil->okl", wJp, Jp), p, P)
    g_c = _seg_cam(jnp.einsum("oik,oi->ok", wJc, r), p, K)
    g_p = _seg_pnt(jnp.einsum("oik,oi->ok", wJp, r), p, P)
    # Observation-sharded execution: each shard built partial blocks from its
    # slice of the table; all-reduce them (the "psum of reduced camera
    # systems" design, SURVEY.md §2.3).
    U = _psum(U, axis_name)
    V = _psum(V, axis_name)
    g_c = _psum(g_c, axis_name)
    g_p = _psum(g_p, axis_name)
    # Scale-edge (pose-pose) contributions: diagonal blocks into U, cross
    # blocks kept for the implicit matvec. Replicated — added after psum.
    r_s, Ji, Jj = _scale_edge_jacobians(p)
    wJi = Ji * p.se_w[:, None]
    wJj = Jj * p.se_w[:, None]
    U = U.at[p.se_i].add(jnp.einsum("ek,el->ekl", wJi, Ji))
    U = U.at[p.se_j].add(jnp.einsum("ek,el->ekl", wJj, Jj))
    H_ij = jnp.einsum("ek,el->ekl", wJi, Jj)  # (E,6,6) cross blocks
    g_c = g_c.at[p.se_i].add(wJi * r_s[:, None])
    g_c = g_c.at[p.se_j].add(wJj * r_s[:, None])
    # LM damping (multiplicative on the diagonal, g2o-style).
    eyeK = jnp.eye(6, dtype=r.dtype)
    eyeP = jnp.eye(3, dtype=r.dtype)
    U_d = U + lm_lambda * eyeK[None]
    V_d = V + lm_lambda * eyeP[None]
    return U_d, V_d, g_c, g_p, (r, Jc, Jp, w, H_ij)


def _mask_cam(x: jnp.ndarray, cam_fixed: jnp.ndarray) -> jnp.ndarray:
    """Zero the 6-blocks of fixed cameras (gauge fixing, ≙ vertex.set_fixed)."""
    return x * (~cam_fixed)[:, None].astype(x.dtype)


def _schur_matvec(x, U_d, V_inv, Jc, Jp, w, p, H_ij, axis_name=None):
    cam, pnt, cam_fixed = p.cam, p.pnt, p.cam_fixed
    se_i, se_j = p.se_i, p.se_j
    """y = S x with S = U - W V^{-1} W^T applied implicitly.

    W_ip = sum_obs Jc^T w Jp over observations of (cam i, point p); the
    product is evaluated per observation and segment-summed — one pass over
    the table, no S materialization.
    """
    x = _mask_cam(x, cam_fixed)
    # U x: batched 6x6.
    y = jnp.einsum("kij,kj->ki", U_d, x)
    # a_o = (w Jp)^T Jc x_cam(o): (O,3)
    Jc_x = jnp.einsum("oik,ok->oi", Jc, x[cam])  # (O,2)
    a = jnp.einsum("oik,oi,o->ok", Jp, Jc_x, w)  # (O,3)
    b = _psum(_seg_pnt(a, p, V_inv.shape[0]), axis_name)  # W^T x per point
    c = jnp.einsum("pij,pj->pi", V_inv, b)  # V^{-1} W^T x
    # d_o = Jc^T w Jp c_pnt(o): (O,6)
    Jp_c = jnp.einsum("oik,ok->oi", Jp, c[pnt])  # (O,2)
    d = jnp.einsum("oik,oi,o->ok", Jc, Jp_c, w)  # (O,6)
    y = y - _psum(_seg_cam(d, p, y.shape[0]), axis_name)
    # Scale-edge cross blocks (pose-pose coupling; replicated, no psum).
    y = y.at[se_i].add(jnp.einsum("ekl,el->ek", H_ij, x[se_j]))
    y = y.at[se_j].add(jnp.einsum("elk,el->ek", H_ij, x[se_i]))
    return _mask_cam(y, cam_fixed)


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate) — cheap on VPU."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
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
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], -1),
            jnp.stack([D, E, F], -1),
            jnp.stack([G, H, I], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def _inv6(M: jnp.ndarray) -> jnp.ndarray:
    """Batched 6x6 inverse via jnp.linalg.solve against identity."""
    eye = jnp.broadcast_to(jnp.eye(6, dtype=M.dtype), M.shape)
    return jnp.linalg.solve(M, eye)


def _pcg(matvec, precond, b, n_iters: int):
    """Preconditioned conjugate gradients, fixed iteration count (jit-safe)."""
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0

    def body(carry, _):
        x, r, z, pk = carry
        Ap = matvec(pk)
        rz = jnp.sum(r * z)
        denom = jnp.sum(pk * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
        x = x + alpha * pk
        r_new = r - alpha * Ap
        z_new = precond(r_new)
        beta = jnp.sum(r_new * z_new) / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
        p_new = z_new + beta * pk
        return (x, r_new, z_new, p_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, z0, p0), None, length=n_iters)
    return x


def _solve_delta(p: BAProblem, lm_lambda, cg_iters: int, points_fixed: bool, axis_name=None):
    """One damped normal-equation solve: returns (delta_c (K,6), delta_p (P,3))."""
    U_d, V_d, g_c, g_p, (r, Jc, Jp, w, H_ij) = _build_blocks(p, lm_lambda, axis_name)
    g_c = _mask_cam(g_c, p.cam_fixed)

    if points_fixed:
        U_inv = _inv6(U_d)
        delta_c = -jnp.einsum("kij,kj->ki", U_inv, g_c)
        delta_c = _mask_cam(delta_c, p.cam_fixed)
        return delta_c, jnp.zeros_like(p.X)

    V_inv = _inv3(V_d)
    # Reduced gradient: b = -(g_c - W V^{-1} g_p).
    Vg = jnp.einsum("pij,pj->pi", V_inv, g_p)  # (P,3)
    Jp_vg = jnp.einsum("oik,ok->oi", Jp, Vg[p.pnt])  # (O,2)
    Wvg = jnp.einsum("oik,oi,o->ok", Jc, Jp_vg, w)  # (O,6)
    b = -(g_c - _psum(_seg_cam(Wvg, p, g_c.shape[0]), axis_name))
    b = _mask_cam(b, p.cam_fixed)

    U_inv = _inv6(U_d)

    def matvec(x):
        return _schur_matvec(x, U_d, V_inv, Jc, Jp, w, p, H_ij, axis_name)

    def precond(x):
        return _mask_cam(jnp.einsum("kij,kj->ki", U_inv, x), p.cam_fixed)

    delta_c = _pcg(matvec, precond, b, cg_iters)
    # Back-substitute landmarks: delta_p = -V^{-1} (g_p + W^T delta_c).
    Jc_dc = jnp.einsum("oik,ok->oi", Jc, delta_c[p.cam])  # (O,2)
    Wt_dc = jnp.einsum("oik,oi,o->ok", Jp, Jc_dc, w)  # (O,3)
    rhs = g_p + _psum(_seg_pnt(Wt_dc, p, g_p.shape[0]), axis_name)
    delta_p = -jnp.einsum("pij,pj->pi", V_inv, rhs)
    return delta_c, delta_p


def _apply(p: BAProblem, delta_c, delta_p) -> BAProblem:
    dR, dt = lie.se3_exp(delta_c)  # (K,3,3),(K,3)
    R_new = dR @ p.R
    t_new = jnp.einsum("kij,kj->ki", dR, p.t) + dt
    return p._replace(R=R_new, t=t_new, X=p.X + delta_p)


@partial(
    jax.jit, static_argnames=("n_iters", "cg_iters", "points_fixed", "axis_name")
)
def optimize(
    p: BAProblem,
    n_iters: int = 10,
    cg_iters: int = 24,
    points_fixed: bool = False,
    init_lambda: float = 1e-4,
    axis_name: str | None = None,
) -> tuple[BAProblem, jnp.ndarray]:
    """Levenberg-Marquardt loop (≙ optimizer.optimize(10), LocalBA.py:39-42).

    Accept/reject with multiplicative damping updates, all inside jit via
    lax.cond on fixed iteration count. Returns (optimized problem, final cost).
    """

    def step(carry, _):
        prob, lam, cost = carry
        delta_c, delta_p = _solve_delta(prob, lam, cg_iters, points_fixed, axis_name)
        cand = _apply(prob, delta_c, delta_p)
        new_cost = _cost(cand, axis_name)
        improved = new_cost < cost
        prob = jax.tree.map(
            lambda a, b: jnp.where(improved, a, b), cand, prob
        )
        cost = jnp.where(improved, new_cost, cost)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e2)
        return (prob, lam, cost), cost

    cost0 = _cost(p, axis_name)
    (p_out, _, cost_out), _ = jax.lax.scan(
        step, (p, jnp.asarray(init_lambda, p.R.dtype), cost0), None, length=n_iters
    )
    return p_out, cost_out


def median_depth_normalize(p: BAProblem, point_valid: jnp.ndarray) -> BAProblem:
    """Monocular gauge fix: divide translations and landmarks by the median
    landmark norm (≙ reference LocalBA.py:179-190)."""
    norms = jnp.linalg.norm(p.X, axis=-1)
    # Masked median: push invalid entries to +inf, take quantile of valid count.
    n_valid = jnp.maximum(jnp.sum(point_valid), 1)
    sorted_norms = jnp.sort(jnp.where(point_valid, norms, jnp.inf))
    med = sorted_norms[(n_valid - 1) // 2]
    scale = jnp.where((med > 1e-8) & jnp.isfinite(med), med, 1.0)
    return p._replace(t=p.t / scale, X=p.X / scale)


@partial(jax.jit, static_argnames=("n_iters",))
def motion_only(
    p: BAProblem, n_iters: int = 10
) -> tuple[BAProblem, jnp.ndarray]:
    """Motion-only BA: all landmarks fixed, fixed cams (keyframes) untouched
    (≙ motionOnlyBundleAdjustement, LocalBA.py:195-229)."""
    return optimize(p, n_iters=n_iters, points_fixed=True)
