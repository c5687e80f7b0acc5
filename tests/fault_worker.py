"""Worker for the fault-injection test (utils/failures.py).

Replays a deterministic synthetic log through batched_replay with a
checkpoint after every batch, resuming from the newest checkpoint when one
exists. GVOM_FAULT_AT=<n> injects a crash (os._exit) right after fusing
GLOBAL batch n — on restart the resumed run is already past n, so the
fault fires exactly once, like a real transient failure.

Usage: fault_worker.py <checkpoint_dir> <out_npz> [heartbeat_dir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

# the environment's TPU plugin prepends itself to jax_platforms regardless of
# JAX_PLATFORMS (see tests/conftest.py) — force the CPU platform explicitly
jax.config.update("jax_platforms", "cpu")


def main():
    ckpt_dir, out_path = sys.argv[1], sys.argv[2]
    hb_dir = sys.argv[3] if len(sys.argv) > 3 else None
    fault_at = int(os.environ.get("GVOM_FAULT_AT", "0"))

    from gvom_tpu.config import GvomConfig
    from gvom_tpu.engine.replay import batched_replay
    from gvom_tpu.io.logio import synthesize_log
    from gvom_tpu.utils.failures import HeartbeatMonitor, resume_latest

    cfg = GvomConfig(xy_size=32, z_size=16, max_points=512, buffer_size=2)
    log = synthesize_log(8, channels=8, azimuth_steps=64, max_range=15.0, seed=3)

    resume = resume_latest(ckpt_dir)
    skip = resume[1] if resume else 0

    hb = HeartbeatMonitor(hb_dir, 0, 2).start() if hb_dir else None

    class _Beat:
        """Per-batch progress beat + the injected fault."""

        def __init__(self, done: int):
            self.global_b = done

        def beat(self):
            self.global_b += 1
            if hb is not None:
                hb.beat()
            if fault_at and self.global_b == fault_at:
                os._exit(17)

    world, _, _ = batched_replay(
        cfg,
        log,
        batch_size=2,
        raycast_impl="xla",
        checkpoint_dir=ckpt_dir,
        checkpoint_every=1,
        resume_from=resume[0] if resume else None,
        skip_batches=skip,
        heartbeat=_Beat(skip),
    )
    if hb is not None:
        hb.stop()
    np.savez(out_path, hit=np.asarray(world.grid.hit),
             evidence=np.asarray(world.evidence),
             minh=np.asarray(world.grid.min_height),
             mom=np.asarray(world.grid.mom))


if __name__ == "__main__":
    main()
