"""Checkpoint / resume.

The reference's only persistent state is the last_combined_* rotation carrying
the fused map across cycles (gvom.py:268-274) — lost on crash. Here the world
state is a pytree: snapshot with orbax when available, .npz otherwise; resume
= load + continue replay.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gvom_tpu.config import GvomConfig
from gvom_tpu.types import VoxelGrid, WorldState

__all__ = ["save_world", "load_world"]

# On-disk layout is the LOGICAL [X, Y, Z] channel form (stable across the r5
# lane-dense storage change): saves unpack via the VoxelGrid properties, loads
# pack back (ops/grid.pack_yz). Old checkpoints restore unchanged.
_FIELDS = ["hit", "miss", "min_height", "mom", "origin"]


def _grid_from_logical(get) -> VoxelGrid:
    from gvom_tpu.ops.grid import pack_yz

    return VoxelGrid(
        hit_pk=pack_yz(jnp.asarray(get("hit"))),
        miss_pk=pack_yz(jnp.asarray(get("miss"))),
        minh_pk=pack_yz(jnp.asarray(get("min_height"))),
        mom=jnp.asarray(get("mom")),
        origin=jnp.asarray(get("origin")),
    )


def save_world(path: str, world: WorldState, cfg: Optional[GvomConfig] = None) -> str:
    """Snapshot the world state. Uses orbax if importable, else .npz.

    The fallback fires ONLY when orbax itself is absent — a genuine orbax
    save failure (disk full, interrupted write, sharding mismatch) raises
    rather than silently writing a different artifact shape."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        ocp = None
    if ocp is not None:
        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        gdict = {f: np.asarray(getattr(world.grid, f)) for f in _FIELDS}
        ckptr.save(
            path,
            {"grid": gdict, "evidence": np.asarray(world.evidence), "valid": world.valid},
            force=True,
        )
        ckptr.wait_until_finished()
        return path
    if not path.endswith(".npz"):
        path = path + ".npz"
    arrs = {f: np.asarray(getattr(world.grid, f)) for f in _FIELDS}
    arrs["evidence"] = np.asarray(world.evidence)
    arrs["valid"] = np.asarray(world.valid)
    if cfg is not None:
        arrs["config_json"] = np.frombuffer(cfg.to_json().encode(), dtype=np.uint8)
    # atomic: write to a tmp name, then rename into place — a crash mid-save
    # must never leave a torn file under the final name (resume_latest always
    # picks the newest checkpoint; a torn newest would poison every restart)
    tmp = path[:-4] + ".tmp.npz"  # keep .npz so savez doesn't append one
    np.savez_compressed(tmp, **arrs)
    os.replace(tmp, path)
    return path


def load_world(path: str) -> WorldState:
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        data = ckptr.restore(path)
        # back-compat: checkpoints written before `evidence` moved from
        # VoxelGrid to WorldState carry it inside data["grid"] and lack the
        # top-level key — pop it out so the restore doesn't TypeError (and
        # silently fall back to an older snapshot in load_resumable)
        gdict = dict(data["grid"])
        legacy_ev = gdict.pop("evidence", None)
        grid = _grid_from_logical(gdict.__getitem__)
        ev = data.get("evidence", legacy_ev)
        if ev is None:
            # evidence absent both top-level AND in the legacy grid layout:
            # a malformed/truncated checkpoint. Raise (load_resumable then
            # falls back to an older snapshot) instead of zero-filling, which
            # would silently disable the staleness-veto decay semantics.
            raise KeyError(f"checkpoint {path!r} has no 'evidence' array")
        from gvom_tpu.ops.grid import pack_yz

        return WorldState(
            grid=grid,
            evidence_pk=pack_yz(jnp.asarray(ev)),
            valid=jnp.asarray(data["valid"]),
        )
    with np.load(path) as z:
        from gvom_tpu.ops.grid import pack_yz

        grid = _grid_from_logical(lambda f: z[f])
        return WorldState(
            grid=grid,
            evidence_pk=pack_yz(jnp.asarray(z["evidence"])),
            valid=jnp.asarray(bool(z["valid"])),
        )
