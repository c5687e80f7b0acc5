"""Reference-shaped engine facade.

API parity with the reference class (gvom.py:12-410): the same constructor
signature, `process_pointcloud`, `combine_maps`, `get_map_as_occupancy_grid`,
and the three debug exporters. Under the hood everything is jitted pure
functions over pytree state — the reference's per-slot semaphores
(gvom.py:65-67) and ego semaphore (gvom.py:96) reduce to host-side locks
around the state-pointer swaps, because device state is immutable.

Concurrency contract (matches the reference's, gvom.py:163-175, 198-208):
sensor threads may ingest WHILE a combine is in flight. `_state_lock` guards
only the pointer swaps (microseconds); `_combine_lock` serializes combines
with each other. Combine snapshots (buffer, world) under the state lock,
runs the device work and its host sync outside it, then swaps the world
pointer back — ingest never waits on a device roundtrip.

Unlike the reference there is no per-scan device→host sync (gvom.py:147's
cell-count copy): degenerate scans are masked no-ops on device, and
`process_pointcloud` stays fully asynchronous.
"""

from __future__ import annotations

import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gvom_tpu.config import GvomConfig
from gvom_tpu.models import pipeline
from gvom_tpu.ops import moments
from gvom_tpu.types import BufferState, WorldState, empty_buffer_state, empty_world_state
from gvom_tpu.utils.metrics import StepMetrics

__all__ = ["Gvom"]


class Gvom:
    """Drop-in engine: `Gvom(xy_resolution, z_resolution, ...)` positional
    parameters as in the reference (gvom.py:29-31), or `Gvom(config=cfg)`."""

    def __init__(
        self,
        xy_resolution: float = None,
        z_resolution: float = None,
        xy_size: int = None,
        z_size: int = None,
        buffer_size: int = None,
        min_distance: float = None,
        positive_obstacle_threshold: float = None,
        negative_obstacle_threshold: float = None,
        slope_obstacle_threshold: float = None,
        robot_height: float = None,
        robot_radius: float = None,
        ground_to_lidar_height: float = None,
        xy_eigen_dist: int = None,
        z_eigen_dist: int = None,
        *,
        config: Optional[GvomConfig] = None,
        raycast_impl: str = "auto",
    ):
        if config is None:
            kw = dict(
                xy_resolution=xy_resolution,
                z_resolution=z_resolution,
                xy_size=xy_size,
                z_size=z_size,
                buffer_size=buffer_size,
                min_distance=min_distance,
                positive_obstacle_threshold=positive_obstacle_threshold,
                negative_obstacle_threshold=negative_obstacle_threshold,
                slope_obstacle_threshold=slope_obstacle_threshold,
                robot_height=robot_height,
                robot_radius=robot_radius,
                ground_to_lidar_height=ground_to_lidar_height,
                xy_eigen_dist=xy_eigen_dist,
                z_eigen_dist=z_eigen_dist,
            )
            config = GvomConfig().replace(**{k: v for k, v in kw.items() if v is not None})
        self.config = config.validate()
        self.raycast_impl = raycast_impl
        self._lock = threading.Lock()          # state-pointer swaps only
        self._combine_lock = threading.Lock()  # serializes combines w/ each other
        self._buffer: BufferState = empty_buffer_state(self.config)
        self._world: WorldState = empty_world_state(self.config)
        self._products = None
        self._products_ok = False
        self._scan_count = 0
        self.ego_position = np.zeros(3)
        self.metrics = StepMetrics()

        cfg = self.config
        self._ingest_tf = jax.jit(
            lambda buf, p, v, ego, tf: pipeline.ingest_and_insert(cfg, buf, p, v, ego, tf, raycast_impl)
        )
        self._ingest_no_tf = jax.jit(
            lambda buf, p, v, ego: pipeline.ingest_and_insert(cfg, buf, p, v, ego, None, raycast_impl)
        )
        self._combine = jax.jit(lambda buf, world, ego: pipeline.combine(cfg, buf, world, ego))

    # ------------------------------------------------------------------
    def _pad(self, pc: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        cap = self.config.max_points
        n = pc.shape[0]
        if n > cap:
            # the reference processes every point (gvom.py:99-110); a static-
            # shape engine must truncate — account for it loudly
            dropped = n - cap
            self.metrics.bump("points_truncated", dropped)
            self.metrics.bump("scans_truncated")
            print(
                f"[WARNING] Scan has {n} points but max_points={cap}; "
                f"dropping {dropped}. Raise GvomConfig.max_points to keep them."
            )
            pc = pc[:cap]
            n = cap
        out = np.zeros((cap, 3), np.float32)
        out[:n] = pc[:n, :3]
        mask = np.zeros((cap,), bool)
        mask[:n] = True
        return out, mask

    def process_pointcloud(self, pointcloud: np.ndarray, ego_position, transform=None):
        """Voxelize one scan into the ring buffer (gvom.py:99-175)."""
        pc = np.asarray(pointcloud)
        if pc.shape[0] == 0:
            print("[WARNING] Processing an empty pointcloud, nothing will happen!")
            return None
        pts, mask = self._pad(pc)
        ego = jnp.asarray(np.asarray(ego_position, np.float32))
        with self._lock:
            self.ego_position = np.asarray(ego_position, np.float64)
            if transform is not None:
                buf, scan_ok = self._ingest_tf(
                    self._buffer, jnp.asarray(pts), jnp.asarray(mask), ego, jnp.asarray(np.asarray(transform, np.float32))
                )
            else:
                buf, scan_ok = self._ingest_no_tf(self._buffer, jnp.asarray(pts), jnp.asarray(mask), ego)
            self._buffer = buf
            self._scan_count += 1
        self.metrics.bump("scans_ingested")
        return scan_ok

    def combine_maps(self):
        """Fuse the buffer + previous map and return the five outputs
        (gvom.py:177-354): (origin_world, positive, negative, roughness,
        visibility), or None when the buffer is empty.

        Ingest stays live during the combine: the device work and its
        `bool(ok)` host sync run OUTSIDE the state lock (the reference's
        per-slot semaphores likewise let sensors fill other slots while
        combine_maps iterates, gvom.py:198-208)."""
        with self._combine_lock:
            with self._lock:
                if self._scan_count == 0:
                    print("[WARNING] The map buffer is empty, nothing will happen!")
                    return None
                buf = self._buffer
                world_in = self._world
                ego = jnp.asarray(self.ego_position.astype(np.float32))
            world, products, ok = self._combine(buf, world_in, ego)
            ok_host = bool(ok)  # device roundtrip — deliberately lock-free
            if not ok_host:
                print("[WARNING] The map buffer is empty, nothing will happen!")
                return None
            with self._lock:
                self._world = world
                self._products = products
                self._products_ok = True
            self.metrics.bump("combines")
        cfg = self.config
        origin_world = products.origin_world(cfg)
        # one batched D2H transfer: separate np.asarray() calls cost one
        # device roundtrip EACH (~25-70 ms through the axon tunnel; real on
        # any remote-dispatch deployment), measured 4x the combine itself
        pos, neg, rough, vis = jax.device_get(
            (products.positive_obstacle, products.negative_obstacle,
             products.roughness, products.visibility)
        )
        return (origin_world, pos, neg, rough, vis)

    # ------------------------------------------------------------------
    def _canonical(self, arr: np.ndarray, origin: np.ndarray) -> np.ndarray:
        """Torus → window-relative layout (host-side; see ops/grid.py)."""
        for ax in range(3):
            arr = np.roll(arr, -int(origin[ax]) % arr.shape[ax - 3], axis=ax - 3)
        return arr

    def get_map_as_occupancy_grid(self) -> Optional[np.ndarray]:
        """[X,Y,Z] bool occupancy of the last combined map (gvom.py:356-361)."""
        if not self._products_ok:
            return None
        origin = np.asarray(self._world.grid.origin)
        return self._canonical(np.asarray(self._world.grid.hit > 0), origin)

    def make_debug_voxel_map(self) -> Optional[np.ndarray]:
        """[K,8] per occupied voxel: world xyz, hit/total density, hit count,
        eigen features λ0−λ1, λ1−λ2, λ2 (gvom.py:363-378, 452-475).
        Row order is voxel-linear (the reference's rows follow its atomic
        allocation order; rows are an unordered point cloud)."""
        if not self._products_ok:
            print("No data")
            return None
        cfg = self.config
        g = self._world.grid
        origin = np.asarray(g.origin)
        occ = self._canonical(np.asarray(g.hit > 0), origin)
        xs, ys, zs = np.nonzero(occ)
        if len(xs) == 0:
            return np.zeros((0, 8), np.float32)
        n, s1, s2 = moments.unpack_moments(g.mom, cfg.z_size)
        cov = moments.covariance(n, s1, s2)
        ev = self._canonical(np.asarray(moments.eigenvalues(cov)), origin)
        hit = self._canonical(np.asarray(g.hit), origin)[xs, ys, zs].astype(np.float32)
        tot = self._canonical(np.asarray(g.hit + g.miss), origin)[xs, ys, zs].astype(np.float32)
        out = np.zeros((len(xs), 8), np.float32)
        out[:, 0] = (xs + origin[0]) * cfg.xy_resolution
        out[:, 1] = (ys + origin[1]) * cfg.xy_resolution
        out[:, 2] = (zs + origin[2]) * cfg.z_resolution
        out[:, 3] = hit / np.maximum(tot, 1.0)
        out[:, 4] = hit
        e = ev[:, xs, ys, zs]
        out[:, 5] = e[0] - e[1]
        out[:, 6] = e[1] - e[2]
        out[:, 7] = e[2]
        return out

    def make_debug_height_map(self) -> Optional[np.ndarray]:
        """[X*X,7]: world xyz (height − z_res), roughness, slope_x, slope_y,
        |slope| (gvom.py:380-394, 424-438)."""
        if not self._products_ok:
            print("No data")
            return None
        cfg = self.config
        p = self._products
        X = cfg.xy_size
        origin = np.asarray(p.origin)
        hm = np.asarray(p.height)
        sx = np.asarray(p.slope_x)
        sy = np.asarray(p.slope_y)
        rough = np.asarray(p.roughness)
        x, y = np.meshgrid(np.arange(X), np.arange(X), indexing="ij")
        out = np.zeros((X * X, 7), np.float32)
        idx = (x + y * X).ravel()
        out[idx, 0] = ((x + origin[0]) * cfg.xy_resolution).ravel()
        out[idx, 1] = ((y + origin[1]) * cfg.xy_resolution).ravel()
        out[idx, 2] = (hm - cfg.z_resolution).ravel()
        out[idx, 3] = rough.ravel()
        out[idx, 4] = sx.ravel()
        out[idx, 5] = sy.ravel()
        out[idx, 6] = np.sqrt(sx * sx + sy * sy).ravel()
        return out

    def make_debug_inferred_height_map(self) -> Optional[np.ndarray]:
        """[X*X,3]: world xy, guessed height delta − z_res (gvom.py:396-410)."""
        if not self._products_ok:
            print("No data")
            return None
        cfg = self.config
        p = self._products
        X = cfg.xy_size
        origin = np.asarray(p.origin)
        ghd = np.asarray(p.guessed_height_delta)
        x, y = np.meshgrid(np.arange(X), np.arange(X), indexing="ij")
        out = np.zeros((X * X, 3), np.float32)
        idx = (x + y * X).ravel()
        out[idx, 0] = ((x + origin[0]) * cfg.xy_resolution).ravel()
        out[idx, 1] = ((y + origin[1]) * cfg.xy_resolution).ravel()
        out[idx, 2] = (ghd - cfg.z_resolution).ravel()
        return out

    # ------------------------------------------------------------------
    @property
    def products(self):
        return self._products if self._products_ok else None

    @property
    def world_state(self) -> WorldState:
        return self._world

    def reset(self):
        # take the combine lock too so an in-flight combine can't swap a
        # stale world back in after the reset
        with self._combine_lock, self._lock:
            self._buffer = empty_buffer_state(self.config)
            self._world = empty_world_state(self.config)
            self._products = None
            self._products_ok = False
            self._scan_count = 0

    # --- crash recovery (SURVEY.md §5: the reference loses its
    # last_combined_* rotation on crash; here the fused world is a pytree
    # snapshot) ---------------------------------------------------------
    def save_checkpoint(self, path: str) -> str:
        """Snapshot the fused world state (orbax or .npz). The ring buffer is
        transient by contract — it refills from the live scan stream."""
        from gvom_tpu.utils.checkpoint import save_world

        with self._lock:
            return save_world(path, self._world, self.config)

    def load_checkpoint(self, path: str) -> None:
        """Restore a fused world snapshot; ingest/combine continue from it."""
        from gvom_tpu.utils.checkpoint import load_world

        world = load_world(path)
        if tuple(world.grid.hit.shape) != self.config.grid_shape:
            raise ValueError(
                f"checkpoint grid {tuple(world.grid.hit.shape)} does not match "
                f"config grid {self.config.grid_shape}"
            )
        with self._combine_lock, self._lock:
            self._world = world
