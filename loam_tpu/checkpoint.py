"""Checkpoint / resume for pipeline state.

The reference has NO checkpointing: the 4,851-cube map and all poses live
in laserMapping's process memory and die with it (SURVEY.md §5
"Checkpoint / resume"); its only recovery mechanism is roslaunch
respawn with total state loss (launch/loam_velodyne.launch:7).

Here the entire estimator state — odometry clouds/pose, the HBM-resident
voxel-hash map, IMU-blend bookkeeping — is one pytree, so checkpointing is
a structural save/restore.  Orbax handles async device-to-host transfer
and atomic directory commits; dataset-scale replays checkpoint every N
frames and resume mid-sequence.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

try:  # orbax is baked into the image; guard anyway for minimal installs
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


@dataclasses.dataclass
class CheckpointManager:
    """Save/restore PipelineState (or any pytree) + replay metadata.

    directory layout: <root>/<step>/ per checkpoint, atomic commit.
    """

    root: str
    max_to_keep: int = 3

    def __post_init__(self):
        if _HAS_ORBAX:
            options = ocp.CheckpointManagerOptions(
                max_to_keep=self.max_to_keep, create=True
            )
            self._mgr = ocp.CheckpointManager(self.root, options=options)
        else:  # pragma: no cover
            self._mgr = None

    def save(self, step: int, state: Any, *, metadata: dict | None = None,
             wait: bool = False) -> None:
        """Checkpoint a pytree at `step`.  Async by default; `wait=True`
        blocks until the directory is committed."""
        args = {"state": ocp.args.StandardSave(state)}
        if metadata is not None:
            args["meta"] = ocp.args.JsonSave(metadata)
        self._mgr.save(step, args=ocp.args.Composite(**args))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, step: int | None, target: Any) -> tuple[Any, dict]:
        """Restore into the structure of `target` (an abstract or concrete
        pytree of the same shape/dtype).  step=None -> latest.
        Returns (state, metadata)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.root}")
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), target
        )
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                meta=ocp.args.JsonRestore(),
            ),
        )
        meta = restored.get("meta") or {}
        return restored["state"], meta

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def checkpointed_replay(step_fn, state, inputs, ckpt: CheckpointManager,
                        every: int = 50, start_frame: int = 0):
    """Frame-loop replay with periodic checkpointing and resume.

    step_fn(state, per_frame_input) -> (state, out); inputs is a pytree
    with a leading frame axis.  Resumes from ckpt's latest step when
    start_frame == 0 and checkpoints exist.  Host-loop (not lax.scan) —
    this is the dataset-scale path where IO dominates anyway.

    Returns (final_state, list_of_outputs_from_processed_frames).
    """
    n_frames = jax.tree_util.tree_leaves(inputs)[0].shape[0]
    first = start_frame
    if first == 0:
        latest = ckpt.latest_step()
        if latest is not None:
            state, meta = ckpt.restore(latest, state)
            first = int(meta.get("next_frame", latest))
    outs = []
    for k in range(first, n_frames):
        frame = jax.tree_util.tree_map(lambda x: x[k], inputs)
        state, out = step_fn(state, frame)
        outs.append(out)
        if every and (k + 1) % every == 0:
            ckpt.save(k + 1, state, metadata={"next_frame": k + 1})
    return state, outs
