"""Pod-scale batched replay: DP over scenarios x TP over residual rows.

The reference's only parallelism is pipeline parallelism across 4 OS
processes at fixed rates (SURVEY.md §2 "Parallelism & distributed-
communication strategies").  The TPU-native scaling axes:

* **DP (scenario parallelism)** — thousands of independent scan-pair
  sequences (dataset replay, multi-run evaluation) vmapped into a batch
  axis and sharded over the ``dp`` mesh axis.  No cross-scenario
  communication; metric reductions ride a final psum.
* **TP (residual-row parallelism)** — inside every Gauss-Newton
  iteration the per-correspondence Jacobian rows are sharded over the
  ``tp`` mesh axis; the 6x6 JtJ / 6x1 Jtb contraction then reduces over
  ICI (GSPMD inserts the psum).  This is the direct analogue of the
  reference "publishing residuals" between nodes.
* **PP** — the reference's 4-process rate-decoupled pipeline becomes
  static decimation inside one program (pipeline.py); frames flow through
  stages by data dependency, so no inter-stage communication exists to
  shard.
* SP/EP — N/A here (no attention/experts); the sequence-parallel analogue
  (sharding one sweep's points for feature extraction) shares the ``tp``
  axis via the same row sharding.

Everything is plain ``jax.jit`` + ``NamedSharding``: pick a mesh, annotate
shardings, let XLA insert collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LoamConfig
from ..types import FeatureClouds, PointCloud
from .. import frontend, pipeline
from ..ops.features import extract_features
from .context import row_sharding


def make_mesh(n_devices: int | None = None, tp: int = 1,
              devices=None) -> Mesh:
    """A (dp, tp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % tp == 0, (n_devices, tp)
    import numpy as np

    arr = np.asarray(devices).reshape(n_devices // tp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _batched_replay(raw_xyz, raw_mask, cfg: LoamConfig):
    """vmap of the full pipeline over a leading scenario axis.

    raw_xyz: (B, F, N, 3); raw_mask: (B, F, N).  Returns FrameOutput with
    leading (B, F) axes.
    """
    return jax.vmap(
        lambda x, m: pipeline.replay_sweeps(x, m, cfg)
    )(raw_xyz, raw_mask)


def make_sharded_replay(mesh: Mesh, cfg: LoamConfig):
    """Compile the batched replay with scenarios sharded over ``dp`` and
    Jacobian rows over ``tp``.

    Returns fn(raw_xyz (B, F, N, 3), raw_mask (B, F, N)) -> FrameOutput.
    B must be divisible by the dp axis size.

    Scenarios are independent, so for pure-dp meshes the batch axis is
    split with shard_map — each device compiles its local scenario slice
    and NO cross-chip collectives can appear (GSPMD's auto-sharding was
    observed to all-gather the per-scenario kNN candidate tensors across
    dp, ~28 MB/step of needless ICI traffic).  Mixed dp x tp meshes keep
    the GSPMD path (tp's psum must cross chips by design).
    """
    if mesh.shape.get("tp", 1) == 1:
        from jax.experimental.shard_map import shard_map

        body = shard_map(
            lambda x, m: _batched_replay(x, m, cfg),
            mesh=mesh,
            in_specs=(P("dp"), P("dp")),
            out_specs=P("dp"),
            check_rep=False,
        )
        return jax.jit(body)

    data_spec = NamedSharding(mesh, P("dp"))
    # rows at the constraint point are (N, 6) inside vmap; the batching
    # rule lifts the constraint over the scenario axis (which dp shards)
    rows_spec = NamedSharding(mesh, P("tp", None))

    def run(raw_xyz, raw_mask):
        with row_sharding(rows_spec):
            return _batched_replay(raw_xyz, raw_mask, cfg)

    return jax.jit(
        run, in_shardings=(data_spec, data_spec), out_shardings=data_spec
    )


def make_sharded_step(mesh: Mesh, cfg: LoamConfig):
    """One batched pipeline step (odometry + mapping + integration) with
    dp/tp sharding — the unit the driver dry-runs and benchmarks.

    Returns fn(state, feats) -> (state, out) where every leaf of state /
    feats carries a leading scenario axis sharded over ``dp``.
    """
    if mesh.shape.get("tp", 1) == 1:
        from jax.experimental.shard_map import shard_map

        body = shard_map(
            lambda s, f: jax.vmap(
                lambda s1, f1: pipeline.pipeline_step(s1, f1, None, cfg)
            )(s, f),
            mesh=mesh,
            in_specs=(P("dp"), P("dp")),
            out_specs=(P("dp"), P("dp")),
            check_rep=False,
        )
        return jax.jit(body)

    data_spec = NamedSharding(mesh, P("dp"))

    def step(state, feats):
        with row_sharding(NamedSharding(mesh, P("tp", None))):
            return jax.vmap(
                lambda s, f: pipeline.pipeline_step(s, f, None, cfg)
            )(state, feats)

    return jax.jit(
        step, in_shardings=(data_spec, data_spec),
        out_shardings=(data_spec, data_spec),
    )


def batched_initial_state(batch: int, cfg: LoamConfig):
    """A scenario-batched PipelineState."""
    one = pipeline.PipelineState.create(cfg)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one
    )


def batched_frontend(raw_xyz, raw_mask, cfg: LoamConfig):
    """Feature extraction vmapped over (B, F) scenario-frame axes —
    embarrassingly parallel, shardable over the whole mesh."""
    def one(x, m):
        sweep = frontend.ingest_sweep(x, m, cfg)
        return extract_features(sweep, cfg)

    return jax.vmap(jax.vmap(one))(raw_xyz, raw_mask)
