"""Masked compaction as one stable multi-operand lax.sort.

Compaction (move the masked elements of a fixed-capacity array to the
front, preserving order) is the glue op of the whole frontend/mapping
path.  Three formulations were measured on the chip (profile_compact.py,
profile_front.py r4):

* scatter (.at[slot].set)  — fine standalone, but inside the fused
  frontend program it scaled 37x for a 16x scenario batch;
* binary-search gather (jnp.searchsorted + take) — batch-stable but the
  log2(N) gather rounds cost ~8x at small batch in the fused program;
* ONE stable lax.sort keyed on ~mask with the payload columns riding
  along — sorts are the irregular primitive XLA:TPU actually optimizes
  (bitonic networks on the VPU), and a single sort replaces both the
  scatter and the search.

This module provides the sort form.  Output is bit-identical to the
scatter form: stable ascending sort on key (~mask) keeps valid elements
in original order at the front.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_masked(mask, payloads, cap: int):
    """Stably compact `payloads` (tuple of (N,) arrays) under `mask`
    into capacity `cap`.

    Returns (tuple of (cap,) arrays, ok (cap,) bool).  Slots past the
    number of masked elements hold arbitrary sorted residue — consumers
    must gate on `ok` (every caller here zero-fills via jnp.where).
    """
    key = (~mask).astype(jnp.int32)
    outs = jax.lax.sort(
        (key,) + tuple(payloads), num_keys=1, is_stable=True
    )
    total = jnp.sum(mask.astype(jnp.int32))
    ok = jnp.arange(cap) < total
    n = mask.shape[0]

    def cut(o):
        if cap <= n:
            return o[:cap]
        return jnp.concatenate(
            [o, jnp.zeros((cap - n,), o.dtype)]
        )

    return tuple(cut(o) for o in outs[1:]), ok
