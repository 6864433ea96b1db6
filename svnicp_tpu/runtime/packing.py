"""Packed frame outputs + the lazy host facade.

Every small FrameOutput leaf fused into ONE f32 + ONE i32 buffer. On the
remote-tunnel backend each distinct output buffer of a jitted step costs a
fixed ~0.15-0.47 ms copy-start/copy-done pair INDEPENDENT of its size
(measured 2.18 ms/frame across the ~19 tiny leaves — 28% of device time,
tools/profile_step.py round 4; the same per-buffer overhead class as the
round-3 donation find). Packing turns them into 2 buffers; the host reads
fields through the lazy `HostFrameOutput` facade, which fetches each fused
buffer once on first access and serves zero-copy numpy views after.

Split out of runtime/pipeline.py (round 5); the layout tables below are the
single source of truth for the wire format between `pack_output` (device)
and `HostFrameOutput` (host).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_PACK_F32 = (
    ("pose_r", (3, 3)), ("pose_t", (3,)), ("guess_r", (3, 3)),
    ("guess_t", (3,)), ("velocity", (3,)), ("var_icp", (6,)),
    ("var_mean", (6,)), ("var_max_sliding", (6,)), ("var_random_walk", (6,)),
    ("cov", (6, 6)), ("icp_grad_norm", ()), ("kf_gain", (15, 6)),
    ("kf_cov_diag", (15,)),
)
_PACK_I32 = ("icp_iterations", "align_ok", "map_points", "map_dropped",
             "target_overflow", "imu_dropped")
_PACK_OFFSETS = {}
_off = 0
for _name, _shape in _PACK_F32:
    _sz = int(np.prod(_shape)) if _shape else 1
    _PACK_OFFSETS[_name] = (_off, _sz, _shape)
    _off += _sz
_PACK_F32_LEN = _off
del _off, _name, _shape, _sz


class PackedFrameOutput(NamedTuple):
    small: jax.Array       # [_PACK_F32_LEN] cfg dtype (see _PACK_F32 layout)
    ints: jax.Array        # [len(_PACK_I32)] int32
    particles: jax.Array   # [P,6]
    weights: jax.Array     # [P]
    history: jax.Array     # [H,P,6]


def pack_output(out) -> PackedFrameOutput:
    dt = out.pose_t.dtype
    small = jnp.concatenate(
        [jnp.ravel(getattr(out, n)).astype(dt) for n, _ in _PACK_F32])
    ints = jnp.stack(
        [jnp.asarray(getattr(out, n)).astype(jnp.int32) for n in _PACK_I32])
    return PackedFrameOutput(small, ints, out.particles, out.weights,
                             out.history)


class HostFrameOutput:
    """Lazy FrameOutput facade over a PackedFrameOutput (field-compatible:
    `out.pose_t`, `out.align_ok`, ... all work). Big leaves (particles,
    weights, history) pass through as device arrays."""

    __slots__ = ("_packed", "_small", "_ints")

    def __init__(self, packed: PackedFrameOutput):
        self._packed = packed
        self._small = None
        self._ints = None

    def __getattr__(self, name):
        if name in ("particles", "weights", "history"):
            return getattr(self._packed, name)
        if name in _PACK_OFFSETS:
            if self._small is None:
                object.__setattr__(self, "_small",
                                   np.asarray(self._packed.small))
            off, sz, shape = _PACK_OFFSETS[name]
            v = self._small[off:off + sz]
            return v.reshape(shape) if shape else v[0]
        if name in _PACK_I32:
            if self._ints is None:
                object.__setattr__(self, "_ints",
                                   np.asarray(self._packed.ints))
            v = self._ints[_PACK_I32.index(name)]
            return bool(v) if name == "align_ok" else v
        raise AttributeError(name)
