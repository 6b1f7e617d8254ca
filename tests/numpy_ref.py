"""Independent numpy re-implementation of the render contract.

Written directly from the semantics summary in SURVEY.md §7 (which cites the
reference CUDA kernel line-by-line), deliberately NOT sharing any code with
volume_renderer_tpu, so that a bug in the shared JAX step math cannot hide
from the tests. Slow (python loop over march steps); use tiny scenes.
"""

from __future__ import annotations

import numpy as np

F = np.float32


def trilinear(vol: np.ndarray, cx, cy, cz):
    """CUDA-style normalized-coordinate trilinear fetch with clamp.

    vol: (D, H, W); cx/cy/cz arrays of normalized coords.
    """
    d, h, w = vol.shape
    ux = cx * w - 0.5
    uy = cy * h - 0.5
    uz = cz * d - 0.5
    x0 = np.floor(ux)
    y0 = np.floor(uy)
    z0 = np.floor(uz)
    fx = (ux - x0).astype(F)
    fy = (uy - y0).astype(F)
    fz = (uz - z0).astype(F)

    def gi(i, n):
        return np.clip(i.astype(np.int64), 0, n - 1)

    x0i, x1i = gi(x0, w), gi(x0 + 1, w)
    y0i, y1i = gi(y0, h), gi(y0 + 1, h)
    z0i, z1i = gi(z0, d), gi(z0 + 1, d)

    def at(zi, yi, xi):
        return vol[zi, yi, xi]

    c00 = at(z0i, y0i, x0i) * (1 - fx) + at(z0i, y0i, x1i) * fx
    c10 = at(z0i, y1i, x0i) * (1 - fx) + at(z0i, y1i, x1i) * fx
    c01 = at(z1i, y0i, x0i) * (1 - fx) + at(z1i, y0i, x1i) * fx
    c11 = at(z1i, y1i, x0i) * (1 - fx) + at(z1i, y1i, x1i) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return (c0 * (1 - fz) + c1 * fz).astype(F)


def vangle(ax, ay, az, bx, by, bz):
    # squared-length formulation with epsilon guard, matching the
    # framework's gradient-safe angle() (raymarch_core.ANGLE_DENOM_EPS)
    d2 = (ax * ax + ay * ay + az * az) * (bx * bx + by * by + bz * bz)
    dotv = ax * bx + ay * by + az * bz
    safe = d2 > F(1e-24)
    ratio = np.where(safe, dotv / np.sqrt(np.where(safe, d2, 1)), 0.0)
    return np.arccos(np.clip(ratio, -1.0, 1.0)).astype(F)


def render_numpy(
    emission,
    absorption,
    reflection,
    rotation,  # (3,3); columns are x/y/z basis vectors
    focal_length,
    distance,
    camera_x_offset,
    element_size_um,  # (sx, sy, sz)
    width,
    height,
    factor_emission=1.0,
    factor_reflection=1.0,
    factor_absorption=1.0,
    color=(1.0, 1.0, 1.0),
    opacity_threshold=0.95,
    lut=None,
    light_positions=None,  # (L,3)
    light_colors=None,
    gradient_volumes=None,  # (gx, gy, gz) arrays or None
):
    emission = np.asarray(emission, F)
    absorption = np.asarray(absorption, F)
    reflection = np.asarray(reflection, F)
    d, h, w = emission.shape

    sx, sy, sz = (F(v) for v in element_size_um)
    bx = F(1.0)
    by = F(sy * F(h)) / F(F(w) * sx)
    bz = F(sz * F(d)) / F(F(w) * sx)
    boxmin = np.array([-bx, -by, -bz], F)
    boxmax = np.array([bx, by, bz], F)
    boxscale = (F(1.0) / (boxmax - boxmin)).astype(F)

    diags = [
        np.sqrt(F(w * w + h * h)),
        np.sqrt(F(h * h + d * d)),
        np.sqrt(F(w * w + d * d)),
    ]
    tstep = F(1.0) / (F(2.2) * F(min(diags)))

    grad_step = np.array([1.0 / w, 1.0 / h, 1.0 / d], F)

    rot = np.asarray(rotation, F)
    xv = rot[:, 0]
    yv = rot[:, 1]
    zv = rot[:, 2]

    # rays
    xs = np.arange(width, dtype=F)
    ys = np.arange(height, dtype=F)
    px, py = np.meshgrid(xs, ys, indexing="xy")  # (H, W)
    u = (px / F(width)) * 2 - 1
    ratio = F(height) / F(width)
    v = (py / F(height)) * 2 * ratio - ratio

    xn = xv / np.sqrt(np.dot(xv, xv))
    dirs = (
        u[..., None] * xn[None, None, :]
        + v[..., None] * yv[None, None, :]
        + F(focal_length) * zv[None, None, :]
    ).astype(F)
    dirs = dirs / np.sqrt(np.sum(dirs * dirs, axis=-1, keepdims=True))
    origin = (F(camera_x_offset) * xv - F(distance) * zv).astype(F)

    # slab intersection
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = (1.0 / dirs).astype(F)
    t1 = (boxmin[None, None, :] - origin[None, None, :]) * inv
    t2 = (boxmax[None, None, :] - origin[None, None, :]) * inv
    tmin_ax = np.minimum(t1, t2)
    tmax_ax = np.maximum(t1, t2)
    tnear = np.max(tmin_ax, axis=-1)
    tfar = np.min(tmax_ax, axis=-1)
    hit = tnear <= tfar
    tnear = np.where(hit, np.maximum(tnear, 0), 0).astype(F)
    tfar = np.where(hit, tfar, -1).astype(F)

    color = np.asarray(color, F)
    fe, fr, fa = F(factor_emission), F(factor_reflection), F(factor_absorption)
    thr = F(opacity_threshold)

    pos = origin[None, None, :] + dirs * tnear[..., None]
    step = dirs * tstep
    t = tnear.copy()
    sum_rgb = np.zeros((height, width, 3), F)
    sum_w = np.zeros((height, width), F)
    active = hit.copy()

    lights_on = lut is not None and light_positions is not None and len(light_positions) > 0

    def shade_at(sp, p):
        """sp: (...,3) normalized sample coords; p: (...,3) world pos."""
        if gradient_volumes is not None:
            gx_v, gy_v, gz_v = gradient_volumes
            gx = trilinear(gx_v, sp[..., 0], sp[..., 1], sp[..., 2])
            gy = trilinear(gy_v, sp[..., 0], sp[..., 1], sp[..., 2])
            gz = trilinear(gz_v, sp[..., 0], sp[..., 1], sp[..., 2])
        else:
            comp = []
            for ax in range(3):
                delta = np.zeros(3, F)
                delta[ax] = grad_step[ax]
                p1 = ((p + delta) - boxmin) * boxscale
                p2 = ((p - delta) - boxmin) * boxscale
                comp.append(
                    (
                        trilinear(emission, p1[..., 0], p1[..., 1], p1[..., 2])
                        - trilinear(emission, p2[..., 0], p2[..., 1], p2[..., 2])
                    )
                    * F(0.5)
                )
            gx, gy, gz = comp
        g2 = gx * gx + gy * gy + gz * gz
        # match the framework's GRAD_EPS2 noise clamp (raymarch_core.py)
        gl = np.sqrt(g2)
        inv_gl = np.where(g2 > 1e-12, 1.0 / np.where(gl > 0, gl, 1), 0.0)
        nx = -gx * inv_gl
        ny = -gy * inv_gl
        nz = -gz * inv_gl

        refl = fr * trilinear(reflection, sp[..., 0], sp[..., 1], sp[..., 2])

        out = np.zeros(p.shape, F)
        for lp, lc in zip(light_positions, light_colors):
            lox = F(lp[0]) - p[..., 0]
            loy = F(lp[1]) - p[..., 1]
            loz = F(lp[2]) - p[..., 2]
            lix = origin[0] - p[..., 0]
            liy = origin[1] - p[..., 1]
            liz = origin[2] - p[..., 2]

            a = vangle(nx, ny, nz, lix, liy, liz) / F(np.pi)
            b = vangle(nx, ny, nz, lox, loy, loz) / F(np.pi)

            dot_o = lox * nx + loy * ny + loz * nz
            dot_i = lix * nx + liy * ny + liz * nz
            pox = lox - dot_o * nx
            poy = loy - dot_o * ny
            poz = loz - dot_o * nz
            pix = lix - dot_i * nx
            piy = liy - dot_i * ny
            piz = liz - dot_i * nz
            g = vangle(pix, piy, piz, pox, poy, poz) / F(np.pi)

            light = trilinear(lut, a, b, g)
            contrib = refl * light
            out[..., 0] += contrib * F(lc[0]) * color[0]
            out[..., 1] += contrib * F(lc[1]) * color[1]
            out[..., 2] += contrib * F(lc[2]) * color[2]
        return out

    max_steps = int(np.ceil(2 * np.sqrt(bx * bx + by * by + bz * bz) / tstep)) + 2
    for _ in range(max_steps):
        if not active.any():
            break
        sp = ((pos - boxmin) * boxscale).astype(F)
        em = fe * trilinear(emission, sp[..., 0], sp[..., 1], sp[..., 2])
        ab = fa * trilinear(absorption, sp[..., 0], sp[..., 1], sp[..., 2])
        alpha = (1 - np.exp(-ab * tstep)).astype(F)
        colored = em[..., None] * tstep * color[None, None, :]
        if lights_on:
            colored = colored + shade_at(sp, pos)
        shaded = colored * alpha[..., None]

        tr = (1 - sum_w)[..., None]
        new_rgb = tr * shaded + sum_rgb
        new_w = (1 - sum_w) * alpha + sum_w
        sum_rgb = np.where(active[..., None], new_rgb, sum_rgb)
        sum_w = np.where(active, new_w, sum_w)

        t = t + tstep
        active = active & (sum_w <= thr) & (t <= tfar)
        pos = pos + step

    return sum_rgb
