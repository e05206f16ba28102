"""Multi-sequence batched SLAM (BASELINE.json config #3).

Runs B sequences in lockstep: one batched front-end call per step (the
per-image work is vmapped and shards over devices via data parallelism —
see parallel.mesh / __graft_entry__.dryrun_multichip), then each sequence's
host-side tracking/bookkeeping consumes its slice of the batch. The
reference is strictly single-sequence (SURVEY.md §2.3), so the semantics
here are "N independent reference pipelines", scaled.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .config import SlamConfig
from .models import frontend
from .pipeline import Slam


def run_batched(
    sequences: list,
    config: SlamConfig | None = None,
    start: int = 0,
    stop: int | None = None,
    use_depth_list: list | None = None,
) -> list[Slam]:
    """Run SLAM over B sequences with a shared batched front-end.

    Args:
      sequences: list of dataset objects (ICLNUIMDataset-compatible).
      start/stop: frame range applied to every sequence.
    Returns:
      list of Slam objects (one per sequence).
    """
    B = len(sequences)
    cfg = config or SlamConfig()
    slams = [Slam(cfg) for _ in range(B)]
    n = min(
        (stop if stop is not None else len(ds)) - start for ds in sequences
    )
    for step in range(n):
        i = start + step
        grays = np.stack([ds.gray(i) for ds in sequences])
        # One batched, jitted front-end call for all sequences.
        feats = frontend.extract_batch(jnp.asarray(grays), cfg.frontend.max_features)
        for b, slam in enumerate(slams):
            fb = jax.tree.map(lambda a: a[b], feats)
            depth = sequences[b].depth(i) if cfg.use_depth else None
            if not slam.initialized:
                slam._try_initialize(i, fb, depth)
            else:
                slam._track(i, fb, depth)
    return slams
