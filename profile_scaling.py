"""Weak-scaling rates at dp = 1/2/4/8 on the virtual CPU mesh
(VERDICT r3 #5): runs parallel.distributed.scaling_efficiency at a small
config and prints the rates table for BENCH.md.  On this 2-core host the
virtual devices contend for CPU, so the wall-clock numbers measure host
contention, NOT ICI scaling — the structural no-collectives test is the
enforceable gate; this records the measured rates anyway."""
import dataclasses, json, os

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/loam_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from loam_tpu.config import LoamConfig
from loam_tpu.parallel import distributed as dist

cfg = dataclasses.replace(
    LoamConfig(),
    ring_width=256,
    max_less_flat=1024,
    less_flat_ring_cap=64,
    corner_table_size=1 << 12,
    surf_table_size=1 << 13,
    search_buckets=1 << 10,
    max_corner_from_map=1024,
    max_surf_from_map=2048,
    max_corner_stack=512,
    max_surf_stack=1024,
    odom_max_iters=5,
    map_max_iters=3,
)
rep = dist.scaling_efficiency(
    cfg, b_per_chip=2, frames=4, n_points=2048, dp_sizes=(1, 2, 4, 8)
)
print(json.dumps({
    "rates_per_chip": {str(k): round(v, 2) for k, v in rep["rates"].items()},
    "efficiency_largest_vs_smallest": round(rep["efficiency"], 3),
    "host_cores": len(os.sched_getaffinity(0)),
}))
