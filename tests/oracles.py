"""NumPy oracles: literal transcriptions of the reference's math, used only
in tests to pin our matrix/vectorized implementations to the exact
reference behavior.

Each oracle is a direct scalar transcription of the cited expressions in
/root/reference (LOAM, Zhang & Singh RSS 2014).
"""

import numpy as np


def accumulate_rotation_ref(cx, cy, cz, lx, ly, lz):
    """src/laserOdometry.cpp:256-273."""
    srx = (
        np.cos(lx) * np.cos(cx) * np.sin(ly) * np.sin(cz)
        - np.cos(cx) * np.cos(cz) * np.sin(lx)
        - np.cos(lx) * np.cos(ly) * np.sin(cx)
    )
    ox = -np.arcsin(srx)
    srycrx = (
        np.sin(lx) * (np.cos(cy) * np.sin(cz) - np.cos(cz) * np.sin(cx) * np.sin(cy))
        + np.cos(lx) * np.sin(ly) * (np.cos(cy) * np.cos(cz) + np.sin(cx) * np.sin(cy) * np.sin(cz))
        + np.cos(lx) * np.cos(ly) * np.cos(cx) * np.sin(cy)
    )
    crycrx = (
        np.cos(lx) * np.cos(ly) * np.cos(cx) * np.cos(cy)
        - np.cos(lx) * np.sin(ly) * (np.cos(cz) * np.sin(cy) - np.cos(cy) * np.sin(cx) * np.sin(cz))
        - np.sin(lx) * (np.sin(cy) * np.sin(cz) + np.cos(cy) * np.cos(cz) * np.sin(cx))
    )
    oy = np.arctan2(srycrx / np.cos(ox), crycrx / np.cos(ox))
    srzcrx = (
        np.sin(cx) * (np.cos(lz) * np.sin(ly) - np.cos(ly) * np.sin(lx) * np.sin(lz))
        + np.cos(cx) * np.sin(cz) * (np.cos(ly) * np.cos(lz) + np.sin(lx) * np.sin(ly) * np.sin(lz))
        + np.cos(lx) * np.cos(cx) * np.cos(cz) * np.sin(lz)
    )
    crzcrx = (
        np.cos(lx) * np.cos(lz) * np.cos(cx) * np.cos(cz)
        - np.cos(cx) * np.sin(cz) * (np.cos(ly) * np.sin(lz) - np.cos(lz) * np.sin(lx) * np.sin(ly))
        - np.sin(cx) * (np.sin(ly) * np.sin(lz) + np.cos(ly) * np.cos(lz) * np.sin(lx))
    )
    oz = np.arctan2(srzcrx / np.cos(ox), crzcrx / np.cos(ox))
    return np.array([ox, oy, oz])


def plugin_imu_rotation_ref(bcx, bcy, bcz, blx, bly, blz, alx, aly, alz):
    """src/laserOdometry.cpp:196-254 (identical structure to
    transformAssociateToMap's rotation, src/laserMapping.cpp:126-182)."""
    sbcx, cbcx = np.sin(bcx), np.cos(bcx)
    sbcy, cbcy = np.sin(bcy), np.cos(bcy)
    sbcz, cbcz = np.sin(bcz), np.cos(bcz)
    sblx, cblx = np.sin(blx), np.cos(blx)
    sbly, cbly = np.sin(bly), np.cos(bly)
    sblz, cblz = np.sin(blz), np.cos(blz)
    salx, calx = np.sin(alx), np.cos(alx)
    saly, caly = np.sin(aly), np.cos(aly)
    salz, calz = np.sin(alz), np.cos(alz)

    srx = (
        -sbcx * (salx * sblx + calx * caly * cblx * cbly + calx * cblx * saly * sbly)
        - cbcx * cbcz * (
            calx * saly * (cbly * sblz - cblz * sblx * sbly)
            - calx * caly * (sbly * sblz + cbly * cblz * sblx)
            + cblx * cblz * salx
        )
        - cbcx * sbcz * (
            calx * caly * (cblz * sbly - cbly * sblx * sblz)
            - calx * saly * (cbly * cblz + sblx * sbly * sblz)
            + cblx * salx * sblz
        )
    )
    acx = -np.arcsin(srx)
    srycrx = (
        (cbcy * sbcz - cbcz * sbcx * sbcy) * (
            calx * saly * (cbly * sblz - cblz * sblx * sbly)
            - calx * caly * (sbly * sblz + cbly * cblz * sblx)
            + cblx * cblz * salx
        )
        - (cbcy * cbcz + sbcx * sbcy * sbcz) * (
            calx * caly * (cblz * sbly - cbly * sblx * sblz)
            - calx * saly * (cbly * cblz + sblx * sbly * sblz)
            + cblx * salx * sblz
        )
        + cbcx * sbcy * (salx * sblx + calx * caly * cblx * cbly + calx * cblx * saly * sbly)
    )
    crycrx = (
        (cbcz * sbcy - cbcy * sbcx * sbcz) * (
            calx * caly * (cblz * sbly - cbly * sblx * sblz)
            - calx * saly * (cbly * cblz + sblx * sbly * sblz)
            + cblx * salx * sblz
        )
        - (sbcy * sbcz + cbcy * cbcz * sbcx) * (
            calx * saly * (cbly * sblz - cblz * sblx * sbly)
            - calx * caly * (sbly * sblz + cbly * cblz * sblx)
            + cblx * cblz * salx
        )
        + cbcx * cbcy * (salx * sblx + calx * caly * cblx * cbly + calx * cblx * saly * sbly)
    )
    acy = np.arctan2(srycrx / np.cos(acx), crycrx / np.cos(acx))
    srzcrx = (
        sbcx * (
            cblx * cbly * (calz * saly - caly * salx * salz)
            - cblx * sbly * (caly * calz + salx * saly * salz)
            + calx * salz * sblx
        )
        - cbcx * cbcz * (
            (caly * calz + salx * saly * salz) * (cbly * sblz - cblz * sblx * sbly)
            + (calz * saly - caly * salx * salz) * (sbly * sblz + cbly * cblz * sblx)
            - calx * cblx * cblz * salz
        )
        + cbcx * sbcz * (
            (caly * calz + salx * saly * salz) * (cbly * cblz + sblx * sbly * sblz)
            + (calz * saly - caly * salx * salz) * (cblz * sbly - cbly * sblx * sblz)
            + calx * cblx * salz * sblz
        )
    )
    crzcrx = (
        sbcx * (
            cblx * sbly * (caly * salz - calz * salx * saly)
            - cblx * cbly * (saly * salz + caly * calz * salx)
            + calx * calz * sblx
        )
        + cbcx * cbcz * (
            (saly * salz + caly * calz * salx) * (sbly * sblz + cbly * cblz * sblx)
            + (caly * salz - calz * salx * saly) * (cbly * sblz - cblz * sblx * sbly)
            + calx * calz * cblx * cblz
        )
        - cbcx * sbcz * (
            (saly * salz + caly * calz * salx) * (cblz * sbly - cbly * sblx * sblz)
            + (caly * salz - calz * salx * saly) * (cbly * cblz + sblx * sbly * sblz)
            - calx * calz * cblx * sblz
        )
    )
    acz = np.arctan2(srzcrx / np.cos(acx), crzcrx / np.cos(acx))
    return np.array([acx, acy, acz])


def transform_associate_to_map_ref(transform_sum, transform_bef, transform_aft):
    """src/laserMapping.cpp:110-197 / src/transformMaintenance.cpp:60-145:
    rotation via plugin_imu_rotation_ref, translation transcription."""
    ts = transform_sum
    tb = transform_bef
    ta = transform_aft

    x1 = np.cos(ts[1]) * (tb[3] - ts[3]) - np.sin(ts[1]) * (tb[5] - ts[5])
    y1 = tb[4] - ts[4]
    z1 = np.sin(ts[1]) * (tb[3] - ts[3]) + np.cos(ts[1]) * (tb[5] - ts[5])
    x2 = x1
    y2 = np.cos(ts[0]) * y1 + np.sin(ts[0]) * z1
    z2 = -np.sin(ts[0]) * y1 + np.cos(ts[0]) * z1
    incre3 = np.cos(ts[2]) * x2 + np.sin(ts[2]) * y2
    incre4 = -np.sin(ts[2]) * x2 + np.cos(ts[2]) * y2
    incre5 = z2

    rot = plugin_imu_rotation_ref(
        ts[0], ts[1], ts[2], tb[0], tb[1], tb[2], ta[0], ta[1], ta[2]
    )

    x1 = np.cos(rot[2]) * incre3 - np.sin(rot[2]) * incre4
    y1 = np.sin(rot[2]) * incre3 + np.cos(rot[2]) * incre4
    z1 = incre5
    x2 = x1
    y2 = np.cos(rot[0]) * y1 - np.sin(rot[0]) * z1
    z2 = np.sin(rot[0]) * y1 + np.cos(rot[0]) * z1
    t3 = ta[3] - (np.cos(rot[1]) * x2 + np.sin(rot[1]) * z2)
    t4 = ta[4] - y2
    t5 = ta[5] - (-np.sin(rot[1]) * x2 + np.cos(rot[1]) * z2)
    return np.concatenate([rot, [t3, t4, t5]])


def transform_to_start_ref(p, intensity, transform):
    """src/laserOdometry.cpp:101-124."""
    s = 10.0 * (intensity - int(intensity))
    rx, ry, rz = s * transform[0], s * transform[1], s * transform[2]
    tx, ty, tz = s * transform[3], s * transform[4], s * transform[5]
    x1 = np.cos(rz) * (p[0] - tx) + np.sin(rz) * (p[1] - ty)
    y1 = -np.sin(rz) * (p[0] - tx) + np.cos(rz) * (p[1] - ty)
    z1 = p[2] - tz
    x2 = x1
    y2 = np.cos(rx) * y1 + np.sin(rx) * z1
    z2 = -np.sin(rx) * y1 + np.cos(rx) * z1
    return np.array(
        [
            np.cos(ry) * x2 - np.sin(ry) * z2,
            y2,
            np.sin(ry) * x2 + np.cos(ry) * z2,
        ]
    )


def odom_jacobian_row_ref(point, coeff, transform):
    """The analytic odometry Jacobian row (src/laserOdometry.cpp:712-753,
    with the reference's fixed s = 1)."""
    s = 1.0
    srx, crx = np.sin(s * transform[0]), np.cos(s * transform[0])
    sry, cry = np.sin(s * transform[1]), np.cos(s * transform[1])
    srz, crz = np.sin(s * transform[2]), np.cos(s * transform[2])
    tx, ty, tz = s * transform[3], s * transform[4], s * transform[5]
    px, py, pz = point
    cx, cy, cz = coeff

    arx = (
        (-s * crx * sry * srz * px + s * crx * crz * sry * py + s * srx * sry * pz
         + s * tx * crx * sry * srz - s * ty * crx * crz * sry - s * tz * srx * sry) * cx
        + (s * srx * srz * px - s * crz * srx * py + s * crx * pz
           + s * ty * crz * srx - s * tz * crx - s * tx * srx * srz) * cy
        + (s * crx * cry * srz * px - s * crx * cry * crz * py - s * cry * srx * pz
           + s * tz * cry * srx + s * ty * crx * cry * crz - s * tx * crx * cry * srz) * cz
    )
    ary = (
        ((-s * crz * sry - s * cry * srx * srz) * px
         + (s * cry * crz * srx - s * sry * srz) * py - s * crx * cry * pz
         + tx * (s * crz * sry + s * cry * srx * srz)
         + ty * (s * sry * srz - s * cry * crz * srx)
         + s * tz * crx * cry) * cx
        + ((s * cry * crz - s * srx * sry * srz) * px
           + (s * cry * srz + s * crz * srx * sry) * py - s * crx * sry * pz
           + s * tz * crx * sry - ty * (s * cry * srz + s * crz * srx * sry)
           - tx * (s * cry * crz - s * srx * sry * srz)) * cz
    )
    arz = (
        ((-s * cry * srz - s * crz * srx * sry) * px
         + (s * cry * crz - s * srx * sry * srz) * py
         + tx * (s * cry * srz + s * crz * srx * sry)
         - ty * (s * cry * crz - s * srx * sry * srz)) * cx
        + (-s * crx * crz * px - s * crx * srz * py
           + s * ty * crx * srz + s * tx * crx * crz) * cy
        + ((s * cry * crz * srx - s * sry * srz) * px
           + (s * crz * sry + s * cry * srx * srz) * py
           + tx * (s * sry * srz - s * cry * crz * srx)
           - ty * (s * crz * sry + s * cry * srx * srz)) * cz
    )
    atx = (
        -s * (cry * crz - srx * sry * srz) * cx
        + s * crx * srz * cy
        - s * (crz * sry + cry * srx * srz) * cz
    )
    aty = (
        -s * (cry * srz + crz * srx * sry) * cx
        - s * crx * crz * cy
        - s * (sry * srz - cry * crz * srx) * cz
    )
    atz = s * crx * sry * cx - s * srx * cy - s * crx * cry * cz
    return np.array([arx, ary, arz, atx, aty, atz])


def map_jacobian_row_ref(point, coeff, transform):
    """The mapping Jacobian row (src/laserMapping.cpp:879-920)."""
    srx, crx = np.sin(transform[0]), np.cos(transform[0])
    sry, cry = np.sin(transform[1]), np.cos(transform[1])
    srz, crz = np.sin(transform[2]), np.cos(transform[2])
    px, py, pz = point
    cx, cy, cz = coeff
    arx = (
        (crx * sry * srz * px + crx * crz * sry * py - srx * sry * pz) * cx
        + (-srx * srz * px - crz * srx * py - crx * pz) * cy
        + (crx * cry * srz * px + crx * cry * crz * py - cry * srx * pz) * cz
    )
    ary = (
        ((cry * srx * srz - crz * sry) * px + (sry * srz + cry * crz * srx) * py + crx * cry * pz) * cx
        + ((-cry * crz - srx * sry * srz) * px + (cry * srz - crz * srx * sry) * py - crx * sry * pz) * cz
    )
    arz = (
        ((crz * srx * sry - cry * srz) * px + (-cry * crz - srx * sry * srz) * py) * cx
        + (crx * crz * px - crx * srz * py) * cy
        + ((sry * srz + cry * crz * srx) * px + (crz * sry - cry * srx * srz) * py) * cz
    )
    return np.array([arx, ary, arz, cx, cy, cz])
