"""Sequential NumPy oracle of per-ring feature extraction.

Mirrors src/scanRegistration.cpp:359-582 at per-ring granularity (the
production code's documented divergence: windows never cross rings).
Used to pin the vectorized/scan implementation's greedy semantics.
"""

import numpy as np


def extract_ring_labels(xyz, n, cfg, curv=None):
    """xyz: (W, 3) ring row; n: valid count.  Returns labels (W,) int:
    2 sharp, 1 less-sharp, -1 flat, 0 other; and picked mask.

    curv: optionally inject precomputed curvature (the production cumsum
    window and this direct sum differ in the last float bits, which can
    flip near-tied flat picks; injecting isolates the greedy semantics).
    """
    W = xyz.shape[0]
    picked = np.zeros(W, dtype=bool)
    labels = np.zeros(W, dtype=np.int32)

    if curv is None:
        curv = np.zeros(W)
        for i in range(5, max(n - 5, 5)):
            if i > n - 6:
                break
            d = xyz[i - 5 : i + 6].sum(axis=0) - 11.0 * xyz[i]
            curv[i] = float(d @ d)

    # occlusion + parallel-beam (src/scanRegistration.cpp:395-452)
    for i in range(5, n - 6):
        diff = xyz[i + 1] - xyz[i]
        diff_sq = float(diff @ diff)
        if diff_sq > 0.1:
            d1 = np.linalg.norm(xyz[i])
            d2 = np.linalg.norm(xyz[i + 1])
            if d1 > d2:
                dd = xyz[i + 1] - xyz[i] * (d2 / d1)
                if np.linalg.norm(dd) / d2 < 0.1:
                    picked[max(i - 5, 0) : i + 1] = True
            else:
                dd = xyz[i + 1] * (d1 / d2) - xyz[i]
                if np.linalg.norm(dd) / d1 < 0.1:
                    picked[i + 1 : i + 7] = True
        diff2 = xyz[i] - xyz[i - 1]
        diff2_sq = float(diff2 @ diff2)
        dis = float(xyz[i] @ xyz[i])
        if diff_sq > 0.0002 * dis and diff2_sq > 0.0002 * dis:
            picked[i] = True

    if n < 12:
        return labels, picked

    def gap_sq(k):
        g = xyz[k + 1] - xyz[k]
        return float(g @ g)

    def suppress(ind):
        for l in range(1, 6):
            if gap_sq(ind + l - 1) > 0.05:
                break
            picked[ind + l] = True
        for l in range(1, 6):
            if gap_sq(ind - l) > 0.05:
                break
            picked[ind - l] = True

    for j in range(6):
        # ring-relative subregion bounds: s = 5, e = n-5
        # (scanStartInd/scanEndInd at src/scanRegistration.cpp:383-393)
        sp = (5 * (6 - j) + (n - 5) * j) // 6
        ep = (5 * (5 - j) + (n - 5) * (j + 1)) // 6 - 1
        if ep < sp:
            continue
        idx = np.arange(sp, ep + 1)
        order_desc = idx[np.argsort(-curv[idx], kind="stable")]
        cnt = 0
        for ind in order_desc:
            if picked[ind] or curv[ind] <= 0.1:
                continue
            cnt += 1
            if cnt <= 2:
                labels[ind] = 2
            elif cnt <= 20:
                labels[ind] = 1
            else:
                break
            picked[ind] = True
            suppress(ind)

        order_asc = idx[np.argsort(curv[idx], kind="stable")]
        cnt = 0
        for ind in order_asc:
            if picked[ind] or curv[ind] >= 0.1:
                continue
            labels[ind] = -1
            cnt += 1
            if cnt >= 4:
                break
            picked[ind] = True
            suppress(ind)

    return labels, picked
