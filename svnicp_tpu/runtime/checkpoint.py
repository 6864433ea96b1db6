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
    """Checkpoint a LIOPipeline's resumable state, including the host-side
    pose graph (keyframes, edges, keyframe clouds) when enabled."""
    extra = {
        "frames": pipe._frames,
        "last_frame_time": pipe._last_frame_time or -1.0,
        "last_imu_time": pipe._last_imu_time or -1.0,
    }
    pg = pipe.posegraph
    if pg is not None and pg.nodes_r:
        extra["pg_nodes_r"] = np.stack(pg.nodes_r)
        extra["pg_nodes_t"] = np.stack(pg.nodes_t)
        extra["pg_stamps"] = np.asarray(pg.stamps)
        if pg.edges:
            extra["pg_edge_ij"] = np.asarray([(e[0], e[1]) for e in pg.edges])
            extra["pg_edge_r"] = np.stack([e[2] for e in pg.edges])
            extra["pg_edge_t"] = np.stack([e[3] for e in pg.edges])
            extra["pg_edge_info"] = np.stack([e[4] for e in pg.edges])
        if pipe._keyframe_clouds:
            extra["pg_clouds"] = np.stack([c for c, _ in pipe._keyframe_clouds])
            extra["pg_cloud_valid"] = np.stack([v for _, v in pipe._keyframe_clouds])
        extra["pg_loops"] = (np.asarray(pipe.loop_closures)
                             if pipe.loop_closures else np.zeros((0, 2), np.int64))
    save_state(path, pipe.state, extra=extra)


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
    if pipe.posegraph is not None and "pg_nodes_r" in extra:
        pg = pipe.posegraph
        pg.nodes_r = [r for r in extra["pg_nodes_r"]]
        pg.nodes_t = [t for t in extra["pg_nodes_t"]]
        pg.stamps = list(extra["pg_stamps"])
        pg.edges = []
        if "pg_edge_ij" in extra:
            for (i, j), r, t, info in zip(
                extra["pg_edge_ij"], extra["pg_edge_r"],
                extra["pg_edge_t"], extra["pg_edge_info"],
            ):
                pg.edges.append((int(i), int(j), r, t, info))
        if "pg_clouds" in extra:
            pipe._keyframe_clouds = list(
                zip(extra["pg_clouds"], extra["pg_cloud_valid"]))
        pipe.loop_closures = [tuple(x) for x in extra["pg_loops"]]
