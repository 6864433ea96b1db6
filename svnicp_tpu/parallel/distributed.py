"""Multi-process distributed runtime: jax.distributed bring-up + host glue.

SURVEY.md §5 names the TPU-native equivalent of the reference's DDS
pub/sub transport (ref: svn-icp/src/core/OdometryPipeline.cpp:70-103): the
jax.distributed runtime over a (hosts x chips) mesh — collectives ride ICI
within a slice and DCN across hosts, and the host side runs one identical
SPMD Python program per process instead of a broker. This module is that
bring-up plus the two host-side pieces the single-process pipeline does
not need:

- `initialize()` — coordinator/rank wiring (env-driven for launchers,
  explicit args for tests). On CPU backends (multi-process simulation on
  one machine — the honest testable form in a 1-chip environment) it
  selects the gloo cross-process collective layer and the per-process
  device count BEFORE backend init.
- `replicate(tree, mesh)` — lift process-local host data into globally
  replicated jax.Arrays. Every process stages the SAME frame (all read
  the same stream — the scan-broadcast semantics; host 0 is only special
  for writing outputs), so replication is by construction, and jit then
  consumes the global arrays with the mesh's collectives inside.

The per-frame math is unchanged: the same shard_map programs
(parallel/sharding.py, parallel/voxmap_sharded.py) run whether the mesh
spans one process or many — jax.devices() is the GLOBAL device list after
initialize(), so LIOPipeline's mesh construction needs no changes.
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_count: int | None = None) -> tuple[int, int]:
    """Bring up the jax.distributed runtime; returns (process_id, count).

    Arguments fall back to env (SVNICP_COORDINATOR, SVNICP_NUM_PROCESSES,
    SVNICP_PROCESS_ID, SVNICP_LOCAL_DEVICES); on real TPU pods all four
    are auto-detected by JAX and every argument may stay None.

    `local_device_count` (CPU simulation): number of simulated devices per
    process. Must be set before the backend initializes — calling this
    after any jax.devices()/computation raises.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "SVNICP_COORDINATOR")
    if num_processes is None and os.environ.get("SVNICP_NUM_PROCESSES"):
        num_processes = int(os.environ["SVNICP_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SVNICP_PROCESS_ID"):
        process_id = int(os.environ["SVNICP_PROCESS_ID"])
    if local_device_count is None and os.environ.get("SVNICP_LOCAL_DEVICES"):
        local_device_count = int(os.environ["SVNICP_LOCAL_DEVICES"])
    if local_device_count:
        # CPU multi-process simulation: per-process simulated device count
        # and the gloo cross-process collective implementation must be
        # configured before the first backend touch
        jax.config.update("jax_num_cpu_devices", local_device_count)
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass      # older jax: CPU collectives implicit
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index(), jax.process_count()


def maybe_initialize_from_env() -> bool:
    """CLI hook: bring up the distributed runtime iff SVNICP_COORDINATOR is
    set (each launcher-spawned process runs the same command line)."""
    if os.environ.get("SVNICP_COORDINATOR"):
        initialize()
        return True
    return False


def replicate(tree, mesh):
    """Lift process-local (host or single-device) pytree leaves into
    globally-REPLICATED arrays over the mesh. Every process must hold
    identical data (the SPMD staging contract above)."""
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def shutdown() -> None:
    jax.distributed.shutdown()
