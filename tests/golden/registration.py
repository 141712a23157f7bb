"""scanRegistration oracle: NumPy transcription of laserCloudHandler
(/root/reference/src/scanRegistration.cpp:211-635), no-IMU path.

Input: one raw Velodyne sweep in firing order (N, 3) + validity mask
(stands in for pcl::removeNaNFromPointCloud, :226-228).
Output: the five published clouds as (xyz (n,3), intensity (n,)) pairs in
the reference's exact push order.
"""

from __future__ import annotations

import dataclasses

import numpy as np

N_SCANS = 16
SCAN_PERIOD = 0.1


@dataclasses.dataclass
class Cloud:
    xyz: np.ndarray        # (n, 3) internal frame (z fwd, x left, y up)
    intensity: np.ndarray  # (n,) scanID + scanPeriod * relTime

    def __len__(self):
        return self.xyz.shape[0]

    def copy(self):
        return Cloud(self.xyz.copy(), self.intensity.copy())


def voxel_grid(cloud: Cloud, leaf: float) -> Cloud:
    """pcl::VoxelGrid centroid filter (setLeafSize(leaf), filter()):
    per-voxel centroid of ALL fields (xyz and intensity), output in
    ascending linear voxel-index order (pcl/filters/voxel_grid.hpp
    semantics used at src/scanRegistration.cpp:576-579)."""
    if len(cloud) == 0:
        return Cloud(np.zeros((0, 3), np.float32), np.zeros(0, np.float32))
    inv = 1.0 / leaf
    ijk = np.floor(cloud.xyz.astype(np.float64) * inv).astype(np.int64)
    min_b = ijk.min(axis=0)
    rel = ijk - min_b
    div = rel.max(axis=0) + 1
    lin = rel[:, 0] + rel[:, 1] * div[0] + rel[:, 2] * (div[0] * div[1])
    uniq, inverse = np.unique(lin, return_inverse=True)
    k = uniq.shape[0]
    cnt = np.bincount(inverse, minlength=k).astype(np.float64)
    sx = np.stack(
        [np.bincount(inverse, weights=cloud.xyz[:, a], minlength=k)
         for a in range(3)],
        axis=1,
    )
    si = np.bincount(inverse, weights=cloud.intensity, minlength=k)
    return Cloud(
        (sx / cnt[:, None]).astype(np.float32),
        (si / cnt).astype(np.float32),
    )


def scan_registration(xyz_velo: np.ndarray, mask: np.ndarray):
    """One sweep through laserCloudHandler (no IMU).

    Returns dict with keys full, sharp, less_sharp, flat, less_flat
    (Cloud each).
    """
    # the reference stores points and does all geometry in float32
    # (pcl::PointXYZ / float locals); matching the precision keeps the
    # chaotic near-tie comparisons aligned with the TPU implementation
    pts = np.asarray(xyz_velo, np.float32)[np.asarray(mask, bool)]
    cloud_size_in = pts.shape[0]

    # start/end azimuth (:230-238)
    start_ori = -np.arctan2(pts[0, 1], pts[0, 0])
    end_ori = -np.arctan2(pts[-1, 1], pts[-1, 0]) + 2 * np.pi
    if end_ori - start_ori > 3 * np.pi:
        end_ori -= 2 * np.pi
    elif end_ori - start_ori < np.pi:
        end_ori += 2 * np.pi

    # axis remap (:244-246) — internal point = (y, z, x)_velodyne
    P = pts[:, [1, 2, 0]]

    # elevation -> scan id (:248-256)
    angle = np.degrees(
        np.arctan(P[:, 1] / np.sqrt(P[:, 0] ** 2 + P[:, 2] ** 2))
    )
    rounded = np.trunc(angle + np.where(angle < 0.0, -0.5, 0.5)).astype(int)
    scan_id = np.where(rounded > 0, rounded, rounded + (N_SCANS - 1))
    keep = (scan_id >= 0) & (scan_id <= N_SCANS - 1)

    Pk = P[keep]
    sid = scan_id[keep]
    n = Pk.shape[0]

    # azimuth unwrap with the halfPassed state machine (:262-281) —
    # evaluated only over kept points, exactly like the reference's
    # continue-before-ori control flow
    ori_raw = -np.arctan2(Pk[:, 0], Pk[:, 2])
    # pre-flip adjustment
    pre = ori_raw.copy()
    pre = np.where(pre < start_ori - np.pi / 2, pre + 2 * np.pi, pre)
    pre = np.where(pre > start_ori + np.pi * 3 / 2, pre - 2 * np.pi, pre)
    flipped = pre - start_ori > np.pi
    flip_idx = int(np.argmax(flipped)) if flipped.any() else n
    # post-flip adjustment
    post = ori_raw + 2 * np.pi
    post = np.where(post < end_ori - np.pi * 3 / 2, post + 2 * np.pi, post)
    post = np.where(post > end_ori + np.pi / 2, post - 2 * np.pi, post)
    ori = np.where(np.arange(n) <= flip_idx, pre, post)

    rel_time = (ori - start_ori) / (end_ori - start_ori)
    intensity = sid + SCAN_PERIOD * rel_time

    # per-ring buckets in arrival order, then concatenation (:350-357)
    order = np.argsort(sid, kind="stable")
    xyz_cat = Pk[order]
    int_cat = intensity[order]
    cloud_size = n

    # curvature + ring boundary bookkeeping (:358-393) — literal f32
    # left-to-right accumulation (x[i-5] + ... + x[i-1] - 10 x[i] +
    # x[i+1] + ...), bit-matching the reference's float chain
    curv = np.zeros(cloud_size, np.float32)
    idx5 = np.arange(5, cloud_size - 5)
    if idx5.size:
        x = xyz_cat
        acc = x[idx5 - 5].copy()
        for off in (-4, -3, -2, -1):
            acc = acc + x[idx5 + off]
        acc = acc - np.float32(10.0) * x[idx5]
        for off in (1, 2, 3, 4, 5):
            acc = acc + x[idx5 + off]
        curv[idx5] = (
            acc[:, 0] * acc[:, 0] + acc[:, 1] * acc[:, 1]
            + acc[:, 2] * acc[:, 2]
        )
    picked = np.zeros(cloud_size, dtype=bool)
    label = np.zeros(cloud_size, dtype=int)

    scan_start = [0] * N_SCANS
    scan_end = [0] * N_SCANS
    ring_of = np.trunc(int_cat).astype(int)
    scan_count = -1
    for i in range(5, cloud_size - 5):
        if ring_of[i] != scan_count:
            scan_count = ring_of[i]
            if 0 < scan_count < N_SCANS:
                scan_start[scan_count] = i + 5
                scan_end[scan_count - 1] = i - 5
    scan_start[0] = 5
    scan_end[-1] = cloud_size - 5

    # occlusion / parallel-beam rejection (:395-452), vectorized over the
    # concatenated cloud (ring-boundary bleed preserved, as in the
    # reference)
    i_arr = np.arange(5, cloud_size - 6)
    if i_arr.size:
        diff_v = xyz_cat[i_arr + 1] - xyz_cat[i_arr]
        diff = np.sum(diff_v * diff_v, axis=1)
        depth = np.sqrt(np.sum(xyz_cat * xyz_cat, axis=1))
        d1 = depth[i_arr]
        d2 = depth[i_arr + 1]
        big = diff > 0.1
        with np.errstate(divide="ignore", invalid="ignore"):
            v_b = xyz_cat[i_arr + 1] - xyz_cat[i_arr] * (d2 / d1)[:, None]
            occl_b = big & (d1 > d2) & (
                np.sqrt(np.sum(v_b * v_b, axis=1)) / d2 < 0.1
            )
            v_a = xyz_cat[i_arr + 1] * (d1 / d2)[:, None] - xyz_cat[i_arr]
            occl_a = big & ~(d1 > d2) & (
                np.sqrt(np.sum(v_a * v_a, axis=1)) / d1 < 0.1
            )
        for off in range(-5, 1):
            picked[i_arr[occl_b] + off] = True
        for off in range(1, 7):
            picked[i_arr[occl_a] + off] = True
        diff2_v = xyz_cat[i_arr] - xyz_cat[i_arr - 1]
        diff2 = np.sum(diff2_v * diff2_v, axis=1)
        dis = np.sum(xyz_cat[i_arr] * xyz_cat[i_arr], axis=1)
        par = (diff > 0.0002 * dis) & (diff2 > 0.0002 * dis)
        picked[i_arr[par]] = True

    # per-ring / per-subregion greedy selection (:455-582)
    sharp_idx: list[int] = []
    less_sharp_idx: list[int] = []
    flat_idx: list[int] = []
    less_flat_clouds: list[Cloud] = []

    def suppress(ind):
        picked[ind] = True
        for off in range(1, 6):
            g = xyz_cat[ind + off] - xyz_cat[ind + off - 1]
            if np.dot(g, g) > 0.05:
                break
            picked[ind + off] = True
        for off in range(-1, -6, -1):
            g = xyz_cat[ind + off] - xyz_cat[ind + off + 1]
            if np.dot(g, g) > 0.05:
                break
            picked[ind + off] = True

    for ring in range(N_SCANS):
        less_flat_scan: list[int] = []
        s, e = scan_start[ring], scan_end[ring]
        for j in range(6):
            sp = (s * (6 - j) + e * j) // 6
            ep = (s * (5 - j) + e * (j + 1)) // 6 - 1
            if ep < sp:
                continue
            span = np.arange(sp, ep + 1)
            # the insertion sort (:466-474) is a stable ascending sort of
            # the identity-initialized index slice
            order_asc = span[np.argsort(curv[span], kind="stable")]

            largest = 0
            for ind in order_asc[::-1]:
                if picked[ind] or curv[ind] <= 0.1:
                    continue
                largest += 1
                if largest <= 2:
                    label[ind] = 2
                    sharp_idx.append(ind)
                    less_sharp_idx.append(ind)
                elif largest <= 20:
                    label[ind] = 1
                    less_sharp_idx.append(ind)
                else:
                    break
                suppress(ind)

            smallest = 0
            for ind in order_asc:
                if picked[ind] or curv[ind] >= 0.1:
                    continue
                label[ind] = -1
                flat_idx.append(ind)
                smallest += 1
                if smallest >= 4:
                    break
                suppress(ind)

            for k in range(sp, ep + 1):
                if label[k] <= 0:
                    less_flat_scan.append(k)

        lf = Cloud(xyz_cat[less_flat_scan], int_cat[less_flat_scan])
        less_flat_clouds.append(voxel_grid(lf, 0.2))

    less_flat = Cloud(
        np.concatenate([c.xyz for c in less_flat_clouds], axis=0),
        np.concatenate([c.intensity for c in less_flat_clouds]),
    )
    del cloud_size_in
    return {
        "full": Cloud(xyz_cat, int_cat),
        "sharp": Cloud(xyz_cat[sharp_idx], int_cat[sharp_idx]),
        "less_sharp": Cloud(xyz_cat[less_sharp_idx], int_cat[less_sharp_idx]),
        "flat": Cloud(xyz_cat[flat_idx], int_cat[flat_idx]),
        "less_flat": less_flat,
    }
