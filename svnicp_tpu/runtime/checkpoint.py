"""Checkpoint / resume for the odometry state.

The reference has no persistence at all — a crash loses the map, KF state
and trajectory (SURVEY.md §5 "Checkpoint/resume: None"). Here the whole
`OdometryState` pytree (voxel map, ESKF, pose history, smoother rings, PRNG
key) serializes to one compressed .npz, so a run can resume mid-sequence.
"""

from __future__ import annotations

import numpy as np


def _flatten(state):
    import jax

    leaves, treedef = jax.tree.flatten(state)
    return leaves, treedef


def save_state(path: str, state, extra: dict | None = None) -> None:
    """Write an OdometryState (or any pytree of arrays) to `path` (.npz)."""
    import jax

    leaves, _ = _flatten(state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)
    del jax


def load_state(path: str, template):
    """Read a state saved by `save_state`, shaped like `template`.

    Returns (state, extra_dict). Shapes/dtypes are validated against the
    template so a config mismatch fails loudly instead of corrupting a run.
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = _flatten(template)
    with np.load(path) as data:
        new_leaves = []
        for i, ref in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            ref_arr = np.asarray(ref)
            if arr.shape != ref_arr.shape or arr.dtype != ref_arr.dtype:
                raise ValueError(
                    f"checkpoint leaf {i}: shape/dtype {arr.shape}/{arr.dtype} "
                    f"does not match template {ref_arr.shape}/{ref_arr.dtype} "
                    "(different config?)"
                )
            new_leaves.append(jnp.asarray(arr))
        extra = {
            k[len("extra_"):]: data[k] for k in data.files if k.startswith("extra_")
        }
    return jax.tree.unflatten(treedef, new_leaves), extra


def save_pipeline(path: str, pipe) -> None:
    """Checkpoint a LIOPipeline's resumable state."""
    save_state(
        path, pipe.state,
        extra={
            "frames": pipe._frames,
            "last_frame_time": pipe._last_frame_time or -1.0,
            "last_imu_time": pipe._last_imu_time or -1.0,
        },
    )


def load_pipeline(path: str, pipe) -> None:
    """Restore a LIOPipeline checkpointed with `save_pipeline` (the pipe must
    be constructed with the same config)."""
    state, extra = load_state(path, pipe.state)
    pipe.state = state
    pipe._frames = int(extra["frames"])
    lft = float(extra["last_frame_time"])
    pipe._last_frame_time = None if lft < 0 else lft
    lit = float(extra["last_imu_time"])
    pipe._last_imu_time = None if lit < 0 else lit
