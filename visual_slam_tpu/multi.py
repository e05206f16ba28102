"""Multi-sequence batched SLAM (BASELINE.json config #3).

Runs B sequences in lockstep: one batched front-end call per step, the
image batch DATA-PARALLEL over a device mesh (batch axis sharded with
`jax.sharding.NamedSharding`; XLA propagates the sharding through the
vmapped front-end so each device detects/describes only its sequences),
then each sequence's host-side tracking/bookkeeping consumes its slice of
the batch. The reference is strictly single-sequence (SURVEY.md §2.3), so
the semantics here are "N independent reference pipelines", scaled.

Distinct pseudo-sequences for testing/demos come from
utils.dataset.WindowView (offset/strided/reversed windows over a base
sequence).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import SlamConfig
from .models import frontend
from .pipeline import Slam


def _auto_mesh(batch: int) -> Mesh | None:
    """Largest power-of-two device count <= batch size, axis 'seq'."""
    devs = jax.devices()
    n = 1
    while n * 2 <= min(batch, len(devs)):
        n *= 2
    if n <= 1:
        return None
    return Mesh(np.array(devs[:n]), ("seq",))


def run_batched(
    sequences: list,
    config: SlamConfig | None = None,
    start: int = 0,
    stop: int | None = None,
    use_depth_list: list | None = None,
    mesh: Mesh | None = None,
) -> list[Slam]:
    """Run SLAM over B sequences with a shared, device-sharded front-end.

    Args:
      sequences: list of dataset objects (ICLNUIMDataset / WindowView).
      start/stop: frame range applied to every sequence.
      mesh: 1-axis device mesh to shard the image batch over (default:
        auto — largest power-of-two device count that divides into the
        batch; None/1 device = unsharded).
    Returns:
      list of Slam objects (one per sequence); each records the number of
      devices its front-end actually ran on in stats['frontend_devices'].
    """
    B = len(sequences)
    cfg = config or SlamConfig()
    if mesh is None:
        mesh = _auto_mesh(B)
    slams = [Slam(cfg) for _ in range(B)]
    n = min(
        (stop if stop is not None else len(ds)) - start for ds in sequences
    )
    n_mesh = int(mesh.devices.size) if mesh is not None else 1
    pad = (-B) % n_mesh
    n_devices_used = 1
    for step in range(n):
        i = start + step
        grays = np.stack([ds.gray(i) for ds in sequences])
        if pad:
            grays = np.concatenate([grays, grays[:pad]], axis=0)
        if mesh is not None:
            gdev = jax.device_put(
                grays, NamedSharding(mesh, P("seq", None, None))
            )
        else:
            gdev = jnp.asarray(grays)
        # One batched, jitted front-end call for all sequences; with a mesh
        # the batch axis stays sharded end-to-end (device-parallel extract).
        feats = frontend.extract_batch(gdev, cfg.frontend.max_features)
        n_devices_used = max(
            n_devices_used, len(feats.uv.sharding.device_set)
        )
        for b, slam in enumerate(slams):
            fb = jax.tree.map(lambda a: a[b], feats)
            depth = sequences[b].depth(i) if cfg.use_depth else None
            if not slam.initialized:
                slam._try_initialize(i, fb, depth)
            else:
                slam._track(i, fb, depth)
    for slam in slams:
        slam.stats["frontend_devices"] = n_devices_used
    return slams
