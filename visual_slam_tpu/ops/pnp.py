"""Perspective-n-Point: batched DLT solver, Gauss-Newton refinement, and
fixed-budget RANSAC wrapper (pure jnp).

TPU-native replacement for `cv2.solvePnPRansac(..., useExtrinsicGuess=True)`
as used by the tracking loop (reference: src/v2/main.py:191-197) and for the
rvec/tvec <-> matrix helpers `transformMatrix`/`Rtorvec`
(src/v2/helper_functions.py:269-278) — the latter live in ops.lie here.

Convention: the solved pose (R_cw, t_cw) is the world->camera transform, the
direct analog of OpenCV's (rvec, tvec).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import lie, linalg as linalg_mod, projection, ransac as ransac_mod


def pnp_dlt(Xw: jnp.ndarray, xn: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Direct linear transform PnP from >=6 correspondences.

    Args:
      Xw: (S,3) world points; xn: (S,2) *normalized* image coordinates.
    Returns:
      (R_cw (3,3), t_cw (3,)). R is projected onto SO(3); accuracy comes from
      the subsequent Gauss-Newton polish, this only seeds RANSAC hypotheses.
    """
    S = Xw.shape[0]
    ones = jnp.ones((S, 1), dtype=Xw.dtype)
    zeros = jnp.zeros((S, 4), dtype=Xw.dtype)
    Xh = jnp.concatenate([Xw, ones], axis=-1)  # (S,4)
    x, y = xn[:, 0:1], xn[:, 1:2]
    rows_u = jnp.concatenate([Xh, zeros, -x * Xh], axis=-1)  # (S,12)
    rows_v = jnp.concatenate([zeros, Xh, -y * Xh], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2S,12)
    P = linalg_mod.solve_homogeneous(A).reshape(3, 4)
    # Sign: majority of points must have positive depth.
    z = Xh @ P[2]
    P = P * jnp.sign(jnp.sum(jnp.sign(z)) + 0.5)
    M = P[:, :3]
    U, s, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = (U * D[None, :]) @ Vt
    scale = jnp.mean(s)
    t = P[:, 3] / jnp.where(scale > 1e-12, scale, 1e-12)
    return R, t


def reprojection_error_sq(
    R_cw: jnp.ndarray,
    t_cw: jnp.ndarray,
    Xw: jnp.ndarray,
    uv: jnp.ndarray,
    intr: jnp.ndarray,
) -> jnp.ndarray:
    """Squared pixel reprojection error (N,). Points behind camera -> inf."""
    pred, z = projection.project(R_cw, t_cw, Xw, intr)
    err = jnp.sum((pred - uv) ** 2, axis=-1)
    return jnp.where(z > 1e-6, err, jnp.inf)


@partial(jax.jit, static_argnames=("n_iters",))
def pnp_gauss_newton(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    Xw: jnp.ndarray,
    uv: jnp.ndarray,
    intr: jnp.ndarray,
    weights: jnp.ndarray,
    n_iters: int = 10,
    huber_delta: float = 2.4477,  # sqrt(5.991), ≙ reference LocalBA.py:82
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Motion-only Gauss-Newton on the reprojection error.

    The same math as motion-only bundle adjustment with all landmarks fixed
    (reference: LocalBA.py:195-229) for a single camera; poses updated by
    left-multiplied se(3) increments.
    """
    fx, fy = intr[0], intr[1]

    def step(carry, _):
        R, t = carry
        Xc = Xw @ R.T + t
        z = jnp.where(jnp.abs(Xc[:, 2]) > 1e-8, Xc[:, 2], 1e-8)
        inv_z = 1.0 / z
        pred = jnp.stack(
            [fx * Xc[:, 0] * inv_z + intr[2], fy * Xc[:, 1] * inv_z + intr[3]],
            axis=-1,
        )
        r = pred - uv  # (N,2)
        # Huber IRLS weight per observation.
        rn = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
        w_rob = jnp.where(rn <= huber_delta, 1.0, huber_delta / rn)
        w = weights * w_rob * (Xc[:, 2] > 1e-6)
        # d(uv)/d(Xc)
        J_proj = jnp.stack(
            [
                jnp.stack([fx * inv_z, jnp.zeros_like(z), -fx * Xc[:, 0] * inv_z**2], -1),
                jnp.stack([jnp.zeros_like(z), fy * inv_z, -fy * Xc[:, 1] * inv_z**2], -1),
            ],
            axis=-2,
        )  # (N,2,3)
        # d(Xc)/d(delta), delta = [omega, v] left-composed: dXc = -[Xc]x w + v
        J_se3 = jnp.concatenate([-lie.hat(Xc), jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), (Xc.shape[0], 3, 3))], axis=-1)  # (N,3,6)
        J = jnp.einsum("nij,njk->nik", J_proj, J_se3)  # (N,2,6)
        H = jnp.einsum("n,nik,nil->kl", w, J, J) + 1e-6 * jnp.eye(6, dtype=R.dtype)
        g = jnp.einsum("n,nik,ni->k", w, J, r)
        delta = -jnp.linalg.solve(H, g)
        dR, dt = lie.se3_exp(delta)
        R_new = dR @ R
        t_new = dR @ t + dt
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=n_iters)
    return R, t


def solve_pnp_ransac(
    key: jax.Array,
    Xw: jnp.ndarray,
    uv: jnp.ndarray,
    intr: jnp.ndarray,
    mask: jnp.ndarray,
    guess_R: jnp.ndarray | None = None,
    guess_t: jnp.ndarray | None = None,
    n_hyps: int = 256,
    threshold_px: float = 8.0,
    refine_iters: int = 10,
):
    """Fixed-budget PnP-RANSAC + Gauss-Newton polish.

    ≙ `cv2.solvePnPRansac` with `useExtrinsicGuess=True` (reference:
    src/v2/main.py:196-197): the previous pose enters the hypothesis pool, so
    a good motion prior short-circuits bad minimal samples exactly like the
    guess does in OpenCV.

    Returns (R_cw, t_cw, inlier_mask, n_inliers).
    """
    xn = projection.normalize_pixels(uv, intr)

    def solver(idx):
        R, t = pnp_dlt(Xw[idx], xn[idx])
        return jnp.concatenate([R.reshape(9), t])

    def residual(model):
        R = model[:9].reshape(3, 3)
        t = model[9:]
        return reprojection_error_sq(R, t, Xw, uv, intr)

    extra = None
    if guess_R is not None:
        extra = jnp.concatenate([guess_R.reshape(9), guess_t])[None, :]

    model, inliers, _, n_in = ransac_mod.ransac(
        key,
        solver,
        residual,
        n_data=Xw.shape[0],
        mask=mask,
        n_hyps=n_hyps,
        set_size=6,
        threshold_sq=threshold_px**2,
        extra_models=extra,
    )
    R, t = model[:9].reshape(3, 3), model[9:]
    R, t = pnp_gauss_newton(
        R, t, Xw, uv, intr, inliers.astype(Xw.dtype), n_iters=refine_iters
    )
    # Recompute inliers under the polished pose.
    res = reprojection_error_sq(R, t, Xw, uv, intr)
    inliers = (res < threshold_px**2) & mask
    return R, t, inliers, jnp.sum(inliers)
