"""Worker process for the 2-process DCN replay test
(test_distributed_multiprocess.py).

Each worker owns 4 virtual CPU devices, joins the jax.distributed
cluster over the loopback coordinator, loads ITS OWN scenario shard,
and runs parallel.distributed.replay_distributed — the exact multi-host
code path (make_array_from_process_local_data + SPMD launch +
cross-process allgather).  Writes the globally-gathered integrated
poses + agreed rate to an .npz for the parent test to cross-check.

Usage: python dcn_worker.py <coordinator> <num_processes> <process_id>
       <out.npz>
"""

import os
import sys

# force EXACTLY 4 virtual devices: drop any inherited force flag (the
# parent pytest env carries =8), since with duplicates the last wins
_flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if not f.startswith("--xla_force_host_platform_device_count")
]
os.environ["XLA_FLAGS"] = " ".join(
    ["--xla_force_host_platform_device_count=4"] + _flags
)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main():
    coord, nproc, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    # per-process cache dir: two workers writing the SHARED suite cache
    # concurrently corrupted entries (r5: later suite tests then
    # segfaulted deserializing them); stable per process_id so reruns
    # still hit
    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/loam_jax_cache_dcn{pid}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from loam_tpu.parallel import distributed as dist

    dist.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_distributed_multiprocess import (
        B_LOCAL, FRAMES, make_cfg, make_local_scenarios,
    )

    cfg = make_cfg()
    raw, msk = make_local_scenarios(pid)
    res = dist.replay_distributed(raw, msk, cfg)
    poses = dist.gather_metric(res.outs.pose_integrated)
    assert poses.shape[:2] == (B_LOCAL * nproc, FRAMES), poses.shape
    np.savez(
        out_path,
        poses=poses,
        rate=np.float32(res.per_chip_rate),
        frames_total=np.int32(res.frames_total),
        process_count=np.int32(jax.process_count()),
        device_count=np.int32(len(jax.devices())),
    )
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
