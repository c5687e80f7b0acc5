"""Scan-log replay drivers.

Two modes:
  * sequential_replay — feeds a log through the facade exactly like the live
    node (parity runs, latency measurement).
  * batched_replay    — BASELINE config #4/#5: stacks (scan, pose) pairs and
    runs the sharded batched step over a device mesh, one world snapshot per
    batch.
"""

from __future__ import annotations

import time
from typing import Iterable, List, Optional, Tuple

import numpy as np

from gvom_tpu.config import GvomConfig
from gvom_tpu.engine.gvom import Gvom
from gvom_tpu.io.logio import ScanLog
from gvom_tpu.utils.metrics import StepMetrics

__all__ = ["sequential_replay", "batched_replay"]


def sequential_replay(
    cfg: GvomConfig,
    log: ScanLog,
    combine_every: int = 1,
    raycast_impl: str = "auto",
) -> Tuple[Gvom, List, StepMetrics]:
    engine = Gvom(config=cfg, raycast_impl=raycast_impl)
    metrics = StepMetrics()
    outputs = []
    for i, (points, ego, transform) in enumerate(log):
        t0 = time.perf_counter()
        engine.process_pointcloud(points, ego, transform)
        metrics.record("ingest_s", time.perf_counter() - t0)
        metrics.bump("scans")
        if (i + 1) % combine_every == 0:
            t0 = time.perf_counter()
            out = engine.combine_maps()
            metrics.record("combine_s", time.perf_counter() - t0)
            metrics.bump("combines")
            outputs.append(out)
    return engine, outputs, metrics


def batched_replay(
    cfg: GvomConfig,
    log: ScanLog,
    batch_size: int,
    mesh=None,
    raycast_impl: str = "auto",
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    resume_from: Optional[str] = None,
    skip_batches: int = 0,
    heartbeat: Optional[object] = None,
):
    """Run the log through the sharded batched step, `batch_size` scans per
    step. Returns (final world, list of per-batch MapProducts, metrics).

    With `checkpoint_dir` + `checkpoint_every=k`, the world pytree is
    snapshotted every k batches (crash recovery for long replays, SURVEY.md
    §5); `resume_from` starts from a prior snapshot instead of an empty
    world, and `skip_batches` skips log batches already fused into it (a
    restarted job passes utils.failures.resume_latest's batch count here).
    NOTE: the returned products list covers only batches fused in THIS
    process — on resume, its first entry is global batch `skip_batches + 1`
    (skipped batches get no placeholder), so callers indexing products by
    global batch number must offset by `skip_batches`.
    `heartbeat`, if given, is a utils.failures.HeartbeatMonitor beaten once
    per fused batch (liveness = forward progress, not just a live process)."""
    import jax
    import jax.numpy as jnp

    from gvom_tpu.io.synthetic import pad_scan
    from gvom_tpu.parallel.mesh import make_mesh
    from gvom_tpu.parallel.sharding import make_batched_step
    from gvom_tpu.types import empty_world_state

    if mesh is None:
        mesh = make_mesh()
    if cfg.ray_steps_override is None:
        # Each batch rasterizes at its LAST scan's origin, so the static DDA
        # budget needs only the centered bound plus the worst in-batch ego
        # drift (in voxels) — far below the any-in-grid bound the sharded
        # step would otherwise assume. Known statically from the log.
        import dataclasses

        egos = np.stack([np.asarray(e, np.float64) for _, e, _ in log])
        res = np.array([cfg.xy_resolution, cfg.xy_resolution, cfg.z_resolution])
        drift = 0.0
        for b0 in range(0, len(egos), batch_size):
            eb = egos[b0 : b0 + batch_size]
            drift = max(drift, float((np.abs(eb - eb[-1]) / res).max()))
        cfg = dataclasses.replace(
            cfg,
            ray_steps_override=min(
                max(cfg.xy_size, cfg.z_size) // 2 + 6 + int(np.ceil(drift)),
                max(cfg.xy_size, cfg.z_size) + 4,
            ),
        )
    step = make_batched_step(cfg, mesh, raycast_impl)
    if resume_from is not None:
        from gvom_tpu.utils.checkpoint import load_world

        world = load_world(resume_from)
    else:
        world = empty_world_state(cfg)
    metrics = StepMetrics()
    products_list = []

    batch_pts, batch_mask, batch_ego = [], [], []
    b_idx = 0  # global batch number, counting skipped ones (checkpoint names
    # continue the pre-crash numbering so resume_latest never regresses)

    def flush():
        nonlocal world, b_idx
        if not batch_pts:
            return
        b_idx += 1
        if b_idx <= skip_batches:
            metrics.bump("skipped_batches")
            batch_pts.clear()
            batch_mask.clear()
            batch_ego.clear()
            return
        # pad the batch to a full mesh multiple with dead scans (the step
        # shards the scan axis over BOTH mesh axes)
        n_real = len(batch_pts)
        while len(batch_pts) % mesh.size != 0:
            batch_pts.append(np.zeros_like(batch_pts[0]))
            batch_mask.append(np.zeros_like(batch_mask[0]))
            batch_ego.append(batch_ego[-1])
        t0 = time.perf_counter()
        world, products = step(
            world,
            jnp.asarray(np.stack(batch_pts)),
            jnp.asarray(np.stack(batch_mask)),
            jnp.asarray(np.stack(batch_ego)),
        )
        jax.block_until_ready(world)
        metrics.record("batch_s", time.perf_counter() - t0)
        metrics.bump("scans", n_real)
        metrics.bump("batches")
        products_list.append(products)
        if checkpoint_dir and checkpoint_every > 0 and b_idx % checkpoint_every == 0:
            import os

            from gvom_tpu.utils.checkpoint import save_world

            save_world(os.path.join(checkpoint_dir, f"world_b{b_idx}"), world, cfg)
            metrics.bump("checkpoints")
        if heartbeat is not None:
            # beaten after the checkpoint: "alive" means durable progress
            heartbeat.beat()
        batch_pts.clear()
        batch_mask.clear()
        batch_ego.clear()

    for points, ego, transform in log:
        if transform is not None:
            points = np.asarray(points) @ np.asarray(transform)[:3, :3].T + np.asarray(transform)[:3, 3]
        pts, mask = pad_scan(np.asarray(points), cfg.max_points)
        batch_pts.append(pts)
        batch_mask.append(mask)
        batch_ego.append(np.asarray(ego, np.float32))
        if len(batch_pts) >= batch_size:
            flush()
    flush()
    return world, products_list, metrics
