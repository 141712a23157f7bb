"""Sharding context for tensor-parallel normal-equation accumulation.

The reference has no tensor parallelism; its analogue is "publish residuals
over loopback pub/sub" (SURVEY.md §2 parallelism table).  TPU-native, the
per-correspondence Jacobian rows are sharded across chips and the 6x6/6x1
normal-equation blocks are reduced with an XLA collective: we annotate the
row axis with a PartitionSpec and let GSPMD insert the psum for the
JtJ / Jtb matmuls (the scaling-book recipe: pick a mesh, annotate, let XLA
insert collectives).

The spec reaches the inner ``normal_equations`` call through a context
variable so the sequential single-chip path stays annotation-free.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax

_ROW_SPEC: contextvars.ContextVar = contextvars.ContextVar(
    "loam_row_spec", default=None
)


@contextlib.contextmanager
def row_sharding(spec):
    """Within this context, Jacobian row blocks are constrained to ``spec``
    (a jax.sharding.PartitionSpec or NamedSharding) along the row axis."""
    token = _ROW_SPEC.set(spec)
    try:
        yield
    finally:
        _ROW_SPEC.reset(token)


def constrain_rows(rows):
    """Apply the active row-axis sharding constraint, if any.  Called from
    residuals.normal_equations on the (N, 6) row block."""
    spec = _ROW_SPEC.get()
    if spec is None:
        return rows
    return jax.lax.with_sharding_constraint(rows, spec)


def constrain_axis0(x):
    """Constrain only the leading (row/point) axis of an arbitrary-rank
    array to the active spec's first dimension; used by the accumulated
    normal-equation path on (N, 3, 6)/(N, 3, 3)/(N, 3) blocks."""
    spec = _ROW_SPEC.get()
    if spec is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec

    if isinstance(spec, NamedSharding):
        axis0 = spec.spec[0] if len(spec.spec) else None
        full = NamedSharding(
            spec.mesh, PartitionSpec(axis0, *([None] * (x.ndim - 1)))
        )
    else:  # PartitionSpec
        axis0 = spec[0] if len(spec) else None
        full = PartitionSpec(axis0, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, full)
