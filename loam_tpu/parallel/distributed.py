"""Multi-host (DCN) scenario replay.

The reference is strictly single-machine — ROS TCPROS over loopback, no
NCCL/MPI, no multi-host anything (SURVEY.md §5 "Distributed communication
backend").  The TPU-native scaling story for dataset-scale replay is:

* **within a slice (ICI)** — `parallel/replay.py`'s (dp, tp) mesh;
* **across hosts (DCN)** — each process loads its own shard of the
  scenario set, the global batch is assembled with
  ``jax.make_array_from_process_local_data``, and the one jitted program
  runs SPMD across all processes; metric reductions ride a final
  cross-host allreduce.

Scenarios never communicate, so the only DCN traffic is program launch
and the final metrics — the design point that makes ≥80% multi-host
scaling efficiency (BASELINE.md north star) achievable: per-host work is
identical and static-shaped, so efficiency loss is bounded by launch skew.

Single-process (tests, single chip) everything degrades to the local
mesh with zero behavior change.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LoamConfig

# NOTE: the replay module is imported lazily inside the functions that
# need it — importing it pulls pipeline/map_store, whose module-level
# jnp constants initialize the XLA backend, and initialize() MUST be
# callable before any backend init (jax.distributed contract).


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up jax.distributed when running multi-process.

    No-op when single-process (the common test / single-chip path) —
    call unconditionally at program start.  Multi-host launchers (one
    process per host) pass coordinator/num/id or rely on the TPU
    environment auto-detection.
    """
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and num_processes is None:
        # rely on cluster auto-detect; skip entirely off-cluster
        if jax.process_count() > 1:
            return  # already initialized by the runtime
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(tp: int = 1) -> Mesh:
    """(dp, tp) mesh over *all* processes' devices.

    tp must divide the per-host device count so tensor-parallel
    collectives stay on ICI; dp spans hosts over DCN.
    """
    devices = np.asarray(jax.devices())
    n = devices.size
    assert n % tp == 0, (n, tp)
    return Mesh(devices.reshape(n // tp, tp), axis_names=("dp", "tp"))


def shard_scenarios_from_local(local_raw, local_mask, mesh: Mesh):
    """Assemble the global scenario batch from per-process local shards.

    local_raw: (B_local, F, N, 3) scenarios this process loaded;
    the global batch is B_local * process_count, sharded over ``dp``.
    Single-process this is a plain device_put.
    """
    spec = P("dp")
    raw = jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_raw)
    )
    mask = jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_mask)
    )
    return raw, mask


@dataclasses.dataclass
class ReplayResult:
    outs: object          # FrameOutput, leading (B_global, F), dp-sharded
    frames_total: int     # global scan-matches completed
    elapsed_s: float
    per_chip_rate: float  # scan-matches / s / chip


def replay_distributed(local_raw, local_mask, cfg: LoamConfig,
                       mesh: Mesh | None = None, tp: int = 1,
                       warmup: bool = True) -> ReplayResult:
    """Run the full batched replay across every host/chip and time it.

    Each process passes only its local scenarios.  Returns the dp-sharded
    FrameOutput plus globally-agreed throughput numbers (identical on all
    processes — reduced over DCN).
    """
    import time

    from . import replay as replay_mod

    if mesh is None:
        mesh = global_mesh(tp=tp)
    raw, mask = shard_scenarios_from_local(local_raw, local_mask, mesh)
    run = replay_mod.make_sharded_replay(mesh, cfg)

    if warmup:
        jax.block_until_ready(run(raw, mask))  # compile (cached after)
    t0 = time.perf_counter()
    outs = jax.block_until_ready(run(raw, mask))
    dt = time.perf_counter() - t0

    # agree on wall time across hosts (slowest host is the truth)
    dt_global = float(_allreduce_max(jnp.float32(dt)))
    b_global, f = raw.shape[0], raw.shape[1]
    n_chips = len(jax.devices())
    rate = b_global * f / dt_global / n_chips
    return ReplayResult(
        outs=outs, frames_total=b_global * f, elapsed_s=dt_global,
        per_chip_rate=rate,
    )


def _allreduce_max(x):
    """Max across processes (DCN).  Single-process: identity."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x).max()


def gather_metric(x) -> np.ndarray:
    """Fetch a (possibly dp-sharded) metric array to every host — the
    cross-host analogue of the reference publishing its pose topic."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def scaling_efficiency(cfg: LoamConfig, b_per_chip: int = 2, frames: int = 8,
                       n_points: int = 4096, dp_sizes=(1, None),
                       seed: int = 0):
    """Weak-scaling harness: per-chip throughput at dp=1 vs dp=N on
    synthetic scenarios (BASELINE.md's ≥80% multi-host efficiency gate).

    Returns {dp_size: scan-matches/s/chip} plus 'efficiency' (largest vs
    smallest dp).  Uses submeshes of the global device set so it also
    measures ICI-only scaling on a single host.
    """
    import time

    from . import replay as replay_mod

    devices = jax.devices()
    sizes = [s if s is not None else len(devices) for s in dp_sizes]
    rng = np.random.default_rng(seed)
    rates: dict[int, float] = {}
    for s in sorted(set(sizes)):
        mesh = replay_mod.make_mesh(n_devices=s, devices=devices)
        b = b_per_chip * s
        raw = rng.normal(0, 10, (b, frames, n_points, 3)).astype(np.float32)
        mask = np.ones((b, frames), bool)[:, :, None] & (
            rng.random((b, frames, n_points)) > 0.1
        )
        run = replay_mod.make_sharded_replay(mesh, cfg)
        spec = NamedSharding(mesh, P("dp"))
        raw_d = jax.device_put(raw, spec)
        mask_d = jax.device_put(mask, spec)
        jax.block_until_ready(run(raw_d, mask_d))
        t0 = time.perf_counter()
        jax.block_until_ready(run(raw_d, mask_d))
        dt = time.perf_counter() - t0
        rates[s] = b * frames / dt / s
    lo, hi = min(rates), max(rates)
    return {
        "rates": rates,
        "efficiency": rates[hi] / rates[lo] if lo != hi else 1.0,
    }
