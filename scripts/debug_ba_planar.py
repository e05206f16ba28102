"""Verify the planar BA internals against autodiff on a tiny problem (CPU)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
import jax.numpy as jnp

from visual_slam_tpu.models import ba
from visual_slam_tpu.ops import lie

rng = np.random.default_rng(0)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from test_ba import synth_problem, mean_reproj_error

prob, (R_gt, t_gt, X_gt) = synth_problem(rng, K=4, P=40, pose_noise=0.02, point_noise=0.03)
P = prob.X.shape[0]
N = prob.cam.shape[0]
Q = N // P
print("K,P,Q,N:", prob.R.shape[0], P, Q, N)

C_T = ba._onehot(prob)
r, Xc, Rg, iz, w_irls = ba._project_planar(prob, C_T)
Jc, Jp = ba._jacobians_planar(Xc, Rg, iz, prob.intr)

# Autodiff check of Jc, Jp for a few slots.
def resid_slot(dc, dX, n):
    k = prob.cam[n]
    p = n // Q
    dR, dt = lie.se3_exp(dc)
    Rk = dR @ prob.R[k]
    tk = dR @ prob.t[k] + dt
    X = prob.X[p] + dX
    Xc_ = Rk @ X + tk
    fx, fy, cx, cy = prob.intr
    pred = jnp.stack([fx * Xc_[0] / Xc_[2] + cx, fy * Xc_[1] / Xc_[2] + cy])
    return pred - prob.uv[:, n]

ns = [int(x) for x in np.where(np.asarray(prob.w) > 0)[0][:5]]
for n in ns:
    Jc_ad = jax.jacfwd(lambda d: resid_slot(d, jnp.zeros(3), n))(jnp.zeros(6))
    Jp_ad = jax.jacfwd(lambda d: resid_slot(jnp.zeros(6), d, n))(jnp.zeros(3))
    e1 = np.abs(np.asarray(Jc_ad) - np.asarray(Jc[:, :, n])).max()
    e2 = np.abs(np.asarray(Jp_ad) - np.asarray(Jp[:, :, n])).max()
    print(f"slot {n}: Jc err {e1:.2e}  Jp err {e2:.2e}")

# One solve step vs dense normal equations built from the planes.
lam = jnp.asarray(1e-4)
delta_c, delta_p = ba._solve_delta(prob, lam, 40, False, C_T)

# Dense reference: assemble full H from planes.
K = prob.R.shape[0]
Jc_np = np.asarray(Jc)  # (2,6,N)
Jp_np = np.asarray(Jp)
w_np = np.asarray(w_irls)
r_np = np.asarray(r)
cam_np = np.asarray(prob.cam)
D = 6 * K + 3 * P
H = np.zeros((D, D), np.float64)
g = np.zeros(D, np.float64)
for n in range(N):
    if w_np[n] == 0:
        continue
    k = cam_np[n]
    p = n // Q
    J = np.zeros((2, D))
    J[:, 6 * k : 6 * k + 6] = Jc_np[:, :, n]
    J[:, 6 * K + 3 * p : 6 * K + 3 * p + 3] = Jp_np[:, :, n]
    H += w_np[n] * J.T @ J
    g += w_np[n] * J.T @ r_np[:, n]
# scale edges
r_s, Ji, Jj = jax.jit(ba._scale_edge_terms)(prob)
for e in range(len(np.asarray(prob.se_w))):
    wse = float(prob.se_w[e])
    if wse == 0:
        continue
    i, j = int(prob.se_i[e]), int(prob.se_j[e])
    J = np.zeros(D)
    J[6 * i : 6 * i + 6] = np.asarray(Ji)[e]
    J[6 * j : 6 * j + 6] = np.asarray(Jj)[e]
    H += wse * np.outer(J, J)
    g += wse * J * float(r_s[e])
H += float(lam) * np.eye(D)
# fix cam 0 and invalid points? cam0 fixed:
fixed = np.zeros(D, bool)
fixed[:6] = True
free = ~fixed
delta = np.zeros(D)
delta[free] = np.linalg.solve(H[np.ix_(free, free)], -g[free])
dc_ref = delta[: 6 * K].reshape(K, 6)
dp_ref = delta[6 * K :].reshape(P, 3)

print("delta_c err:", np.abs(np.asarray(delta_c) - dc_ref).max(),
      "norm ref:", np.abs(dc_ref).max())
print("delta_p err:", np.abs(np.asarray(delta_p) - dp_ref).max(),
      "norm ref:", np.abs(dp_ref).max())

out, cost = ba.optimize(prob, n_iters=10)
print("optimize cost:", float(cost), "err:", mean_reproj_error(out))
