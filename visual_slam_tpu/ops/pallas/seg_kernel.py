"""Pallas TPU kernels: camera-segment reduce/expand for large-map BA.

The large-map bundle-adjustment solver (models/ba_large.py) needs two
bipartite data movements per Schur matvec, at N ~ millions of observation
slots and K ~ thousands of cameras:

  cam_reduce: (C,N) per-slot data  -> (C,K) per-camera sums   (scatter-add)
  cam_expand: (C,K) per-camera data -> (C,N) per-slot copies  (gather)

XLA lowers these to row-rate-limited scatter/gather (~0.4 rows/cycle —
measured 15.8 ms / 5.3 ms at N=2.1M, K=2500 on v5e, vs ~0.1 ms of HBM
traffic). These kernels instead express both movements as full-width MXU
matmuls against an implicit one-hot matrix that NEVER leaves VMEM, using a
two-level decomposition of the camera index:

  cam = hi * 128 + lo,   hi in [0, H),  lo in [0, 128)

  reduce:  out[c*H+h, l] += sum_n  data[c,n] * (hi_n==h) * (lo_n==l)
           = ( data (x) hi-onehot  :  (C*H, B) )  @  ( lo-onehot : (B, 128) )
  expand:  out[c,n] = sum_h ( x3 (C*H,128) @ lo-onehot (128->B) )[c*H+h, n]
                       * (hi_n==h)

The lo level rides the MXU at full 128-lane width; the hi level is a cheap
VPU mask-reduce over H ~ K/128 values. Per call the only HBM traffic is the
(C,N) data itself — the (B,128) one-hots and (C*H,B) expanded blocks live
and die in VMEM. f32 matmuls keep full accumulation accuracy (bit-level
parity with jax.ops.segment_sum is NOT expected — sums associate
differently — but agreement is ~1e-6 relative, vs ~2e-3 for a bf16 one-hot).

Replaces the g2o sparse-matrix assembly the reference delegates to C++
(SparseOptimizer/BlockSolverSE3, reference LocalBA.py:20-42) at scales the
reference never reached (BASELINE.json config #5).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128  # lo width = one MXU/VPU lane tile


def _pick_block(C: int, H: int) -> int:
    """Slot-block size B: keep the (C*H, B) expanded block ~<= 4 MB f32."""
    budget = 4 * 1024 * 1024 // 4  # floats
    b = budget // max(C * H, 1)
    b = max(256, min(4096, b))
    # round down to a multiple of 256 lanes
    return (b // 256) * 256


def _cam_reduce_kernel(cam_ref, data_ref, out_ref, *, H: int, B: int):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    camb = cam_ref[:]  # (1,B) int32; padding slots carry cam >= H*L
    data = data_ref[:]  # (C,B) f32
    C = data.shape[0]
    lo = camb % L
    hi = camb // L
    # hi one-hot (H,B): also zeroes padding slots (hi >= H matches nothing).
    hi_oh = (
        jax.lax.broadcasted_iota(jnp.int32, (H, B), 0) == hi
    ).astype(jnp.float32)
    r = (data[:, None, :] * hi_oh[None, :, :]).reshape(C * H, B)
    # lo one-hot laid out (L,B) so no in-kernel transpose is needed;
    # contract both operands over their B axis (dims (1),(1)).
    lo_oh = (
        jax.lax.broadcasted_iota(jnp.int32, (L, B), 0) == lo
    ).astype(jnp.float32)
    out_ref[:] += jax.lax.dot_general(
        r, lo_oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C*H, L)


def _cam_expand_kernel(cam_ref, x3_ref, out_ref, *, H: int, B: int):
    camb = cam_ref[:]  # (1,B)
    x3 = x3_ref[:]  # (C*H, L) — whole camera table, VMEM-resident
    CH = x3.shape[0]
    C = CH // H
    lo = camb % L
    hi = camb // L
    lo_oh = (
        jax.lax.broadcasted_iota(jnp.int32, (L, B), 0) == lo
    ).astype(jnp.float32)
    g = jax.lax.dot_general(
        x3, lo_oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C*H, B)
    hi_oh = (
        jax.lax.broadcasted_iota(jnp.int32, (H, B), 0) == hi
    ).astype(jnp.float32)
    out_ref[:] = jnp.sum(g.reshape(C, H, B) * hi_oh[None, :, :], axis=1)


def _pad_slots(data: jnp.ndarray, cam: jnp.ndarray, B: int, K_pad: int):
    n = data.shape[1]
    n_pad = (-n) % B
    if n_pad:
        data = jnp.pad(data, ((0, 0), (0, n_pad)))
        # out-of-range camera id -> hi >= H -> contributes/receives nothing
        cam = jnp.pad(cam, (0, n_pad), constant_values=K_pad)
    return data, cam, n


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def cam_reduce(
    data: jnp.ndarray, cam: jnp.ndarray, K: int, interpret: bool = False
) -> jnp.ndarray:
    """Per-camera segment sums: (C,N) f32, (N,) int32 -> (C,K) f32.

    Equivalent to jax.ops.segment_sum(data.T, cam, K).T (up to f32
    summation order) at ~6-10x the TPU throughput.
    """
    C, _ = data.shape
    H = pl.cdiv(K, L)
    B = _pick_block(C, H)
    data, cam, _ = _pad_slots(
        data.astype(jnp.float32), cam.astype(jnp.int32), B, H * L
    )
    NB = data.shape[1] // B
    out = pl.pallas_call(
        functools.partial(_cam_reduce_kernel, H=H, B=B),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, B), lambda b: (0, b)),
            pl.BlockSpec((C, B), lambda b: (0, b)),
        ],
        out_specs=pl.BlockSpec((C * H, L), lambda b: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((C * H, L), jnp.float32),
        interpret=interpret,
    )(cam.reshape(1, -1), data)
    return out.reshape(C, H * L)[:, :K]


@functools.partial(jax.jit, static_argnames=("interpret",))
def cam_expand(
    x: jnp.ndarray, cam: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Per-slot camera gather: (C,K) f32, (N,) int32 -> (C,N) f32.

    Equivalent to jnp.take(x, cam, axis=1) (exactly — each output is a
    single selected value, no re-association).
    """
    C, K = x.shape
    H = pl.cdiv(K, L)
    B = _pick_block(C, H)
    n = cam.shape[0]
    n_pad = (-n) % B
    cam = cam.astype(jnp.int32)
    if n_pad:
        cam = jnp.pad(cam, (0, n_pad), constant_values=H * L)
    NB = cam.shape[0] // B
    x3 = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, H * L - K))).reshape(
        C * H, L
    )
    out = pl.pallas_call(
        functools.partial(_cam_expand_kernel, H=H, B=B),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, B), lambda b: (0, b)),
            pl.BlockSpec((C * H, L), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((C, B), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((C, NB * B), jnp.float32),
        interpret=interpret,
    )(cam.reshape(1, -1), x3)
    return out[:, :n]


# ---------------------------------------------------------------------------
# XLA fallbacks (CPU, virtual-device meshes, or if Mosaic rejects a shape).
# Same signatures; used automatically by ba_large on non-TPU backends.


def cam_reduce_xla(data: jnp.ndarray, cam: jnp.ndarray, K: int) -> jnp.ndarray:
    return jnp.zeros((data.shape[0], K), data.dtype).at[:, cam].add(data)


def cam_expand_xla(x: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(x, cam, axis=1)
