"""CPU oracle: a literal, scalar numpy re-implementation of the reference's
math (project/camera.cpp, stereo/twoviewstereo.cpp, stereo/geodesicweight.cpp)
used as the golden model for the vectorized TPU engine.

Deliberately independent of the package's JAX code: the refractive projection
uses numpy's companion-matrix ``np.roots`` + the reference's sign-consistency
root selection (camera.cpp:119-134), not the bisection solver; the cost loops
are straight ports of the C++ loops.
"""

from __future__ import annotations

import numpy as np

INF = np.inf
NAN = np.nan
WEPS = 1e-10


class OracleCamera:
    def __init__(self, K, R, t, dist=None, plane_normal=None, plane_dist=0.0,
                 refr_index=1.0):
        self.K = np.asarray(K, float)
        self.Kinv = np.linalg.inv(self.K)
        self.R = np.asarray(R, float)
        self.t = np.asarray(t, float)
        self.C = -self.R.T @ self.t
        self.dist = np.zeros(5) if dist is None else np.asarray(dist, float)
        self.plane_normal = (np.array([0.0, 0, 1]) if plane_normal is None
                             else np.asarray(plane_normal, float))
        self.plane_normal = self.plane_normal / np.linalg.norm(
            self.plane_normal)
        self.plane_dist = float(plane_dist)
        self.refr_index = float(refr_index)

    @property
    def is_refractive(self):
        return (abs(self.refr_index - 1) > WEPS
                and abs(self.plane_dist) > WEPS)

    @property
    def is_distorted(self):
        return np.any(np.abs(self.dist) > WEPS)

    def principal_ray(self):
        tcol = self.K[:, 2]
        d = self.Kinv @ (tcol / tcol[2])
        d = d / np.linalg.norm(d)
        return self.C, self.R.T @ d


def project_refraction(p, normal, d, n):
    """camera.cpp:95-138 with np.roots."""
    axial = p @ normal
    proj = axial * normal
    y = (p - proj)[1]
    z = np.linalg.norm(proj)
    r = np.linalg.norm(p - proj)
    rr, nn, dd = r * r, n * n, d * d
    dirv = (p - proj)
    nrm = np.linalg.norm(dirv)
    if nrm > 0:
        dirv = dirv / nrm

    coeffs = [nn - 1,
              -2 * r * (nn - 1),
              rr * (nn - 1) + dd * nn - (z - d) ** 2,
              -2 * dd * nn * r,
              dd * nn * rr]
    roots = np.roots(coeffs)
    for root in roots:
        if abs(root.imag) > 1e-10:
            continue
        ri = root.real
        pp = ri * dirv
        py = pp[1]
        if py > -1e-3 and y > -1e-3:
            if py < y + 1e-3:
                return pp + d * normal, True
        elif py < 1e-3 and y < 1e-3:
            if y < py + 1e-3:
                return pp + d * normal, True
    return p, False


def oracle_project(cam: OracleCamera, X):
    """camera.cpp:380-419. Returns (x, y, valid)."""
    p = cam.R @ X + cam.t
    if cam.is_refractive:
        p, ok = project_refraction(p, cam.plane_normal, cam.plane_dist,
                                   cam.refr_index)
        if not ok:
            return NAN, NAN, False
    q = cam.K @ p
    q = q / q[2]
    x, y = q[0], q[1]
    if cam.is_distorted:
        cx, cy = cam.K[0, 2], cam.K[1, 2]
        fx, fy = cam.K[0, 0], cam.K[1, 1]
        k = cam.dist
        xn = (x - cx) / fx
        yn = (y - cy) / fy
        r2 = xn * xn + yn * yn
        cdist = 1 + ((k[4] * r2 + k[1]) * r2 + k[0]) * r2
        xd = xn * cdist + 2 * k[2] * xn * yn + k[3] * (r2 + 2 * xn * xn)
        yd = yn * cdist + k[2] * (r2 + 2 * yn * yn) + 2 * k[3] * xn * yn
        x = fx * xd + cx
        y = fy * yd + cy
    return x, y, True


def oracle_unproject(cam: OracleCamera, x, y):
    """camera.cpp:423-459. Returns (origin, direction) world ray."""
    if cam.is_distorted:
        cx, cy = cam.K[0, 2], cam.K[1, 2]
        ifx, ify = 1.0 / cam.K[0, 0], 1.0 / cam.K[1, 1]
        k = cam.dist
        x0 = xc = (x - cx) * ifx
        y0 = yc = (y - cy) * ify
        for _ in range(5):
            r2 = xc * xc + yc * yc
            icdist = 1.0 / (1 + ((k[4] * r2 + k[1]) * r2 + k[0]) * r2)
            dx = 2 * k[2] * xc * yc + k[3] * (r2 + 2 * xc * xc)
            dy = k[2] * (r2 + 2 * yc * yc) + 2 * k[3] * xc * yc
            xc = (x0 - dx) * icdist
            yc = (y0 - dy) * icdist
        x = xc / ifx + cx
        y = yc / ify + cy

    d = cam.Kinv @ np.array([x, y, 1.0])
    d = d / np.linalg.norm(d)
    o = np.zeros(3)
    if cam.is_refractive:
        o, d = oracle_refract(o, d, cam.plane_normal, cam.plane_dist,
                              cam.refr_index)
    # local -> global
    o = cam.R.T @ (o - cam.t)
    d = cam.R.T @ d
    d = d / np.linalg.norm(d)
    return o, d


def oracle_refract(o, d, normal, dist, n):
    """ray.cpp:92-106; on failure returns the input ray."""
    nd = normal @ d
    if abs(nd) < 1e-10:
        return o, d
    x0 = dist * normal
    t = normal @ (x0 - o) / nd
    if t < 1e-10:
        return o, d
    p = o + t * d
    cos_i = -(normal @ d)
    cos_t2 = 1.0 - (1.0 - cos_i * cos_i) / (n * n)
    if cos_t2 <= 0:
        return o, d
    sign = -1.0 if cos_i > 0 else 1.0
    dd = d + (cos_i + n * sign * np.sqrt(cos_t2)) * normal
    return p, dd / np.linalg.norm(dd)


def closest_points(o1, d1, o2, d2):
    w0 = o1 - o2
    a, b, c = d1 @ d1, d1 @ d2, d2 @ d2
    dd, e = d1 @ w0, d2 @ w0
    den = 1.0 / (a * c - b * b)
    tl = (b * e - c * dd) * den
    tr = (a * e - b * dd) * den
    p1 = o1 + (tl * d1 if tl > 0 else 0)
    p2 = o2 + (tr * d2 if tr > 0 else 0)
    return p1, p2


# ---------------------------------------------------------------------------
# Images (VectorImage semantics)
# ---------------------------------------------------------------------------

def pixel(img, x, y):
    """int-cast lookup; returns None when OOB (INVALID)."""
    ix, iy = int(x), int(y)
    h, w = img.shape[:2]
    if ix < 0 or iy < 0 or ix >= w or iy >= h:
        return None
    return img[iy, ix]


def sample(img, x, y):
    """bilinear; None unless x>=0, y>=0, x+1<w, y+1<h."""
    h, w = img.shape[:2]
    if not (x >= 0 and y >= 0 and x + 1 < w and y + 1 < h):
        return None
    ix, iy = int(x), int(y)
    dx, dy = x - ix, y - iy
    return (img[iy, ix] * (1 - dx) * (1 - dy)
            + img[iy + 1, ix] * (1 - dx) * dy
            + img[iy, ix + 1] * dx * (1 - dy)
            + img[iy + 1, ix + 1] * dx * dy)


def to_gray(rgb):
    return 0.11 * rgb[0] + 0.59 * rgb[1] + 0.3 * rgb[2]


# ---------------------------------------------------------------------------
# Geodesic weights (geodesicweight.cpp:59-135)
# ---------------------------------------------------------------------------

K1 = [(-1, -1), (0, -1), (1, -1), (-1, 0)]
K2 = [(-1, 1), (0, 1), (1, 1), (1, 0)]


def oracle_geodesic_weights(rgb, cx, cy, radius, sigma=50.0, iters=3):
    size = 2 * radius + 1
    w = np.full((size, size), 1000000.0)
    w[radius, radius] = 0.0

    for _ in range(iters):
        # forward
        for y in range(-radius, radius + 1):
            for x in range(-radius, radius + 1):
                rgb1 = pixel(rgb, cx + x, cy + y)
                if rgb1 is None:
                    continue
                for dx, dy in K1:
                    if (x + dx > radius or y + dy > radius
                            or x + dx < -radius or y + dy < -radius):
                        continue
                    rgb2 = pixel(rgb, cx + x + dx, cy + y + dy)
                    if rgb2 is None:
                        continue
                    diff = np.linalg.norm(rgb2 - rgb1)
                    cost = w[y + dy + radius, x + dx + radius]
                    w[y + radius, x + radius] = min(
                        w[y + radius, x + radius], cost + diff)
        # backward
        for y in range(radius, -radius - 1, -1):
            for x in range(radius, -radius - 1, -1):
                rgb1 = pixel(rgb, cx + x, cy + y)
                if rgb1 is None:
                    continue
                for dx, dy in K2:
                    if (x + dx > radius or y + dy > radius
                            or x + dx < -radius or y + dy < -radius):
                        continue
                    rgb2 = pixel(rgb, cx + x + dx, cy + y + dy)
                    if rgb2 is None:
                        continue
                    diff = np.linalg.norm(rgb2 - rgb1)
                    cost = w[y + dy + radius, x + dx + radius]
                    w[y + radius, x + radius] = min(
                        w[y + radius, x + radius], cost + diff)
    return np.exp(-w / sigma)


# ---------------------------------------------------------------------------
# Two-view cost + WTA + cross-check (twoviewstereo.cpp)
# ---------------------------------------------------------------------------

def oracle_cost_ncc(left, right, left_mask, right_mask, weights,
                    x1, y1, x2, y2, radius, max_color_diff=120.0,
                    bad_ret=1000.0):
    """twoviewstereo.cpp:909-977 (two-pass, weighted means)."""
    meanL = meanR = total = 0.0
    for row in range(-radius, radius + 1):
        for col in range(-radius, radius + 1):
            lm = pixel(left_mask, x1 + col, y1 + row)
            if lm is None or not lm:
                continue
            rm = pixel(right_mask, x2 + col, y2 + row)
            if rm is None or not rm:
                continue
            lrgb = sample(left, x1 + col, y1 + row)
            if lrgb is None:
                continue
            rrgb = sample(right, x2 + col, y2 + row)
            if rrgb is None:
                continue
            wgt = weights[row + radius, col + radius]
            if wgt > WEPS:
                meanL += wgt * to_gray(lrgb)
                meanR += wgt * to_gray(rrgb)
                total += wgt

    if total < WEPS:
        return bad_ret
    meanL /= total
    meanR /= total

    s1 = s2 = s3 = 0.0
    for row in range(-radius, radius + 1):
        for col in range(-radius, radius + 1):
            lrgb = sample(left, x1 + col, y1 + row)
            rrgb = sample(right, x2 + col, y2 + row)
            lm = pixel(left_mask, x1 + col, y1 + row)
            if lm is None or not lm:
                continue
            rm = pixel(right_mask, x2 + col, y2 + row)
            if rm is None or not rm:
                continue
            if lrgb is None or rrgb is None:
                continue
            wgt = weights[row + radius, col + radius]
            if wgt > WEPS:
                gl = wgt * to_gray(lrgb)
                gr = wgt * to_gray(rrgb)
                s1 += (gl - meanL) * (gr - meanR)
                s2 += (gl - meanL) * (gl - meanL)
                s3 += (gr - meanR) * (gr - meanR)

    v = 255.0 * (1.0 - abs(s1) / np.sqrt(s2 * s3))
    # std::min(a, NaN) -> a
    if np.isnan(v):
        return max_color_diff
    return min(max_color_diff, v)


def depth_from_label(label, num_levels, min_depth, max_depth):
    t = label / (num_levels - 1.0)
    t = t / (5 - 4 * t)
    return min_depth * (1 - t) + max_depth * t


def point_from_depth(ray_o, ray_d, normal, depth, p0):
    """twoviewstereo.cpp:987-995: plane through p0 + normal*depth."""
    x0 = normal @ (p0 + normal * depth)
    nd = normal @ ray_d
    if abs(nd) < 1e-10:
        return None
    t = (x0 - normal @ ray_o) / nd
    if t < 1e-10:
        return None
    return ray_o + t * ray_d


def oracle_depth_map_oneview(rgb_ref, mask_ref, rgb_oth, mask_oth,
                             cam_ref: OracleCamera, cam_oth: OracleCamera,
                             cfg):
    """Depth-sweep WTA variant (twoviewstereo.cpp:308-329) with NCC."""
    h, w = rgb_ref.shape[:2]
    depth = np.full((h, w), NAN)
    C, pr_dir = cam_ref.principal_ray()
    for y in range(h):
        for x in range(w):
            if not mask_ref[y, x]:
                continue
            weights = oracle_geodesic_weights(
                rgb_ref, x, y, cfg.window_radius,
                cfg.weights.geodesic_sigma, cfg.weights.geodesic_iters)
            ro, rd = oracle_unproject(
                cam_ref, (x + 0.5) / cfg.image_scale,
                (y + 0.5) / cfg.image_scale)
            min_cost = INF
            second = INF
            for lab in range(cfg.num_depth_levels):
                dep = depth_from_label(lab, cfg.num_depth_levels,
                                       cfg.min_depth, cfg.max_depth)
                pt = point_from_depth(ro, rd, pr_dir, dep, cam_ref.C)
                if pt is None:
                    continue
                px, py, ok = oracle_project(cam_oth, pt)
                if not ok:
                    continue
                x2 = px * cfg.image_scale - 0.5
                y2 = py * cfg.image_scale - 0.5
                cost = oracle_cost_ncc(
                    rgb_ref, rgb_oth, mask_ref, mask_oth, weights,
                    x1=x, y1=y, x2=x2, y2=y2, radius=cfg.window_radius,
                    max_color_diff=cfg.max_color_diff, bad_ret=cfg.bad_ret)
                if cost + 1e-10 < min_cost:
                    second = min_cost
                    min_cost = cost
                    depth[y, x] = dep
            if min_cost > cfg.second_best_factor * second:
                depth[y, x] = INF
    return depth


def oracle_cost_ncc_mvs(img1, img2, weights, x1, y1, x2, y2, radius):
    """multiviewstereo.cpp:113-189: pixel() lookups, no mask checks."""
    meanL = meanR = total = 0.0
    for row in range(-radius, radius + 1):
        for col in range(-radius, radius + 1):
            lrgb = pixel(img1, x1 + col, y1 + row)
            if lrgb is None:
                continue
            rrgb = pixel(img2, x2 + col, y2 + row)
            if rrgb is None:
                continue
            wgt = weights[row + radius, col + radius]
            if wgt > WEPS:
                meanL += wgt * to_gray(lrgb)
                meanR += wgt * to_gray(rrgb)
                total += wgt
    if total < WEPS:
        return 0.0
    meanL /= total
    meanR /= total
    s1 = s2 = s3 = 0.0
    for row in range(-radius, radius + 1):
        for col in range(-radius, radius + 1):
            lrgb = pixel(img1, x1 + col, y1 + row)
            if lrgb is None:
                continue
            rrgb = pixel(img2, x2 + col, y2 + row)
            if rrgb is None:
                continue
            wgt = weights[row + radius, col + radius]
            if wgt > WEPS:
                gl = wgt * to_gray(lrgb)
                gr = wgt * to_gray(rrgb)
                s1 += (gl - meanL) * (gr - meanR)
                s2 += (gl - meanL) * (gl - meanL)
                s3 += (gr - meanR) * (gr - meanR)
    if s2 * s3 < WEPS:
        return 0.0
    return s1 / np.sqrt(s2 * s3)


def mvs_depth_from_label(label, num_levels, min_depth, max_depth):
    """Uniform sampling (multiviewstereo.cpp:733-736)."""
    t = label / (num_levels - 1.0)
    return min_depth * (1 - t) + max_depth * t


def oracle_mvs_oneview(rgbs, masks, cams, view_index, neighbours, cfg):
    """Dense-sweep analog of computeInitialEstimate (multiviewstereo.cpp:
    524-662): per pixel, collect NCC>thr peaks over (neighbour, depth)
    samples, WTA = best peak (ties -> larger depth), -1 when none."""
    rgb_ref = rgbs[view_index]
    mask_ref = masks[view_index]
    cam = cams[view_index]
    h, w = rgb_ref.shape[:2]
    depth = np.full((h, w), INF)
    C, pr_dir = cam.principal_ray()
    for y in range(h):
        for x in range(w):
            if not mask_ref[y, x]:
                continue
            weights = oracle_geodesic_weights(
                rgb_ref, x, y, cfg.window_radius,
                cfg.weights.geodesic_sigma, cfg.weights.geodesic_iters)
            ro, rd = oracle_unproject(cam, (x + 0.5) / cfg.image_scale,
                                      (y + 0.5) / cfg.image_scale)
            peaks = [(0.0, -1.0)] * cfg.top_k
            for j in neighbours:
                for lab in range(cfg.num_depth_levels):
                    dep = mvs_depth_from_label(
                        lab, cfg.num_depth_levels, cfg.min_depth,
                        cfg.max_depth)
                    pt = point_from_depth(ro, rd, pr_dir, dep, cam.C)
                    if pt is None:
                        continue
                    px, py, ok = oracle_project(cams[j], pt)
                    if not ok:
                        continue
                    x2 = px * cfg.image_scale - 0.5
                    y2 = py * cfg.image_scale - 0.5
                    c = oracle_cost_ncc_mvs(rgb_ref, rgbs[j], weights,
                                            x, y, x2, y2, cfg.window_radius)
                    if c > cfg.ncc_threshold:
                        peaks.append((c, dep))
            peaks.sort()
            depth[y, x] = peaks[-1][1]
    return depth


def oracle_mvs_cross_check(depths, cams, cfg):
    """multiviewstereo.cpp:666-729, sequential over views."""
    depths = [d.copy() for d in depths]
    for i, cam in enumerate(cams):
        h, w = depths[i].shape
        _, na = cam.principal_ray()
        for y in range(h):
            for x in range(w):
                d = depths[i][y, x]
                if not np.isfinite(d):
                    continue
                ro, rd = oracle_unproject(cam, (x + 0.5) / cfg.image_scale,
                                          (y + 0.5) / cfg.image_scale)
                p1 = point_from_depth(ro, rd, na, d, cam.C)
                if p1 is None:
                    continue
                found = False
                for j, ocam in enumerate(cams):
                    if j == i:
                        continue
                    px, py, ok = oracle_project(ocam, p1)
                    if not ok:
                        continue
                    x2 = px * cfg.image_scale
                    y2 = py * cfg.image_scale
                    hb, wb = depths[j].shape
                    if not (0 <= x2 < wb and 0 <= y2 < hb):
                        continue
                    od = depths[j][int(y2), int(x2)]
                    if not np.isfinite(od):
                        continue
                    r2o, r2d = oracle_unproject(
                        ocam, (x2 + 0.5) / cfg.image_scale,
                        (y2 + 0.5) / cfg.image_scale)
                    _, nb = ocam.principal_ray()
                    p2 = point_from_depth(r2o, r2d, nb, od, ocam.C)
                    if p2 is None:
                        continue
                    nrm = np.linalg.norm(p1 - p2)
                    if np.isfinite(nrm) and nrm < cfg.cross_check_threshold:
                        found = True
                        break
                if not found:
                    depths[i][y, x] = NAN
    return depths


def oracle_cross_check(depth_l, depth_r, cam_l: OracleCamera,
                       cam_r: OracleCamera, cfg):
    """twoviewstereo.cpp:596-672 (sequential: right pass sees updated
    left)."""
    def one_dir(da, db, ca, cb):
        h, w = da.shape
        hb, wb = db.shape
        _, na = ca.principal_ray()
        _, nb = cb.principal_ray()
        out = da.copy()
        for y in range(h):
            for x in range(w):
                d = out[y, x]
                if not np.isfinite(d):
                    continue
                ro, rd = oracle_unproject(ca, (x + 0.5) / cfg.image_scale,
                                          (y + 0.5) / cfg.image_scale)
                p1 = point_from_depth(ro, rd, na, d, ca.C)
                if p1 is None:
                    continue
                px, py, ok = oracle_project(cb, p1)
                if not ok:
                    out[y, x] = INF
                    continue
                x2 = px * cfg.image_scale
                y2 = py * cfg.image_scale
                if not (0 <= x2 < wb and 0 <= y2 < hb):
                    out[y, x] = INF
                    continue
                od = db[int(y2), int(x2)]
                if not np.isfinite(od):
                    out[y, x] = INF
                    continue
                r2o, r2d = oracle_unproject(cb, (x2 + 0.5) / cfg.image_scale,
                                            (y2 + 0.5) / cfg.image_scale)
                p2 = point_from_depth(r2o, r2d, nb, od, cb.C)
                if p2 is None:
                    out[y, x] = INF
                    continue
                nrm = np.linalg.norm(p1 - p2)
                if not np.isfinite(nrm) or nrm > cfg.inconsistency_thresh:
                    out[y, x] = INF
        return out

    dl = one_dir(depth_l, depth_r, cam_l, cam_r)
    dr = one_dir(depth_r, dl, cam_r, cam_l)
    return dl, dr
