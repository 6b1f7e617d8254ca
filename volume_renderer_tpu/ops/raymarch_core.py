"""Shared per-step ray-march math (sampling + shading + compositing).

This module is the single source of truth for the march-step semantics of
the reference CUDA kernel ``d_render`` (reference
src/C/vr/volumeRender_kernel.cu:365-507) and ``shade``
(volumeRender_kernel.cu:308-353). Both the per-pixel oracle and the batched
production forward call these functions, so they agree bit-for-bit on any
backend.

Everything broadcasts: positions are SoA ``F3`` whose components may be
scalars (oracle) or (R,) arrays (batched forward).

Per step at world position ``pos`` (volumeRender_kernel.cu:435-493):

    pos_sample   = (pos - boxmin) * boxscale          # normalized [0,1]
    emission     = factor_emission   * tex(em, pos_sample)
    absorption   = factor_absorption * tex(ab, pos_sample)
    alpha        = 1 - exp(-absorption * tstep)
    colored      = emission * tstep * color
    illuminated  = colored + shade(...)
    shaded       = (illuminated * alpha, alpha)        # premultiplied
    sum          = (1 - sum.w) * shaded + sum          # front-to-back under
    break if sum.w > opacity_threshold, or t+tstep > tfar

shade(), per light source (volumeRender_kernel.cu:308-353):

    n      = -normalize(gradient)          # on-the-fly central differences
                                           # or precomputed dx/dy/dz lookup
    lightOut = lightPos - pos ; lightIn = eyeOrigin - pos
    alpha  = angle(n, lightIn)  / pi
    beta   = angle(n, lightOut) / pi
    gamma  = angle(proj_t(lightIn), proj_t(lightOut)) / pi   # tangent-plane
    result += factor_reflection * tex(re, pos_sample)
              * tex(lut, (alpha, beta, gamma)) * lightColor * color

Divergence from CUDA, by design: in flat emission regions the central
difference gradient is zero or pure float32 rounding noise (one ulp); the
GPU reference then shades with a noise (or NaN) normal. We clamp gradients
with |g|^2 <= GRAD_EPS2 to exactly zero, making the normal the zero vector
and ``angle`` degrade to acos(0) = pi/2 — deterministic, identical between
oracle/production kernels, and indistinguishable on real data where
surfaces have genuine gradients.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from volume_renderer_tpu.models.scene import RenderOptions, Scene
from volume_renderer_tpu.ops.float3 import F3, Array, dot, f3, length, normalize
from volume_renderer_tpu.ops.sampling import sample_trilinear


class Samplers(NamedTuple):
    """Role -> trilinear fetch callables (normalized global coords -> value).

    The march math is written against this indirection so the same code
    samples full volumes (default), halo-padded z-bricks of sharded
    volumes (parallel/bricks.py), or VMEM-staged slabs. Entries are None
    when the role is compiled out.
    """

    em: object
    ab: object
    re: object = None
    gx: object = None
    gy: object = None
    gz: object = None
    lut: object = None


def make_samplers(scene: Scene) -> Samplers:
    """Default samplers over the full volume arrays (with aliasing)."""
    em = lambda p: sample_trilinear(scene.emission.data, p)  # noqa: E731
    ab = em if scene.absorption_aliased else (
        lambda p: sample_trilinear(scene.absorption.data, p)
    )
    re = gx = gy = gz = lut = None
    if scene.has_lighting:
        re = em if scene.reflection_aliased else (
            lambda p: sample_trilinear(scene.reflection.data, p)
        )
        lut = lambda p: sample_trilinear(scene.illumination, p)  # noqa: E731
        if scene.has_gradient_volumes:
            gx = lambda p: sample_trilinear(scene.gradient_x.data, p)  # noqa: E731
            gy = lambda p: sample_trilinear(scene.gradient_y.data, p)  # noqa: E731
            gz = lambda p: sample_trilinear(scene.gradient_z.data, p)  # noqa: E731
    return Samplers(em=em, ab=ab, re=re, gx=gx, gy=gy, gz=gz, lut=lut)

# NB host-side np scalars, not jnp: module-level jnp constants would
# initialize the JAX backend at import time (locking the platform choice
# before the user can configure it).
PI = np.float32(3.14159265358979323846)

# Gradients with squared norm below this are rounding noise of float32
# trilinear differences (~(1e-7)^2 = 1e-14); treat as zero normal.
GRAD_EPS2 = np.float32(1e-12)

# angle() denominators (product of the two vector lengths) below this take
# the guarded branch: the angle is geometrically ill-defined and its
# gradient would overflow float32.
ANGLE_DENOM_EPS = np.float32(1e-12)


class MarchConsts(NamedTuple):
    """Traced per-render constants derived from Scene + RenderOptions."""

    boxmin: F3
    boxmax: F3
    boxscale: F3
    tstep: Array
    opacity_threshold: Array
    factor_emission: Array
    factor_absorption: Array
    factor_reflection: Array
    color: F3
    gradient_step: F3


def make_consts(scene: Scene, opts: RenderOptions) -> MarchConsts:
    bmin = f3(*opts.boxmin)
    bmax = f3(*opts.boxmax)
    boxscale = f3(
        1.0 / (opts.boxmax[0] - opts.boxmin[0]),
        1.0 / (opts.boxmax[1] - opts.boxmin[1]),
        1.0 / (opts.boxmax[2] - opts.boxmin[2]),
    )
    s = scene.settings
    return MarchConsts(
        boxmin=bmin,
        boxmax=bmax,
        boxscale=boxscale,
        tstep=jnp.float32(opts.tstep),
        opacity_threshold=s.opacity_threshold,
        factor_emission=s.factor_emission,
        factor_absorption=s.factor_absorption,
        factor_reflection=s.factor_reflection,
        color=F3(s.color[0], s.color[1], s.color[2]),
        gradient_step=f3(*opts.gradient_step),
    )


def angle(a: F3, b: F3) -> Array:
    """acos of the normalized dot product (volumeRender_kernel.cu:284-287),
    guarded against zero-length inputs and rounding outside [-1, 1].

    Gradient-safe in two ways:
    - acos'(x) -> -inf as |x| -> 1 (exactly aligned vectors) poisons
      reverse-mode with NaN via the clip's 0 * inf; near the poles the
      angle's gradient is taken as zero while the forward value is
      unchanged.
    - near-zero-length inputs (the zero surface normal; the tangent-plane
      projections when a light ray is (anti)parallel to the normal) make
      the naive sqrt(dot(a,a)) graph emit NaN/inf gradients even under a
      zero cotangent (sqrt'(0) = inf, and 0 * inf = NaN). The ratio is
      therefore built from SQUARED lengths with rsqrt, fully where-guarded:
      denominators below ANGLE_DENOM_EPS take the guarded branch
      (angle = pi/2, gradient 0). The angle is geometrically ill-defined
      there; the CUDA reference computes rounding garbage (or NaN).
    """
    d2 = dot(a, a) * dot(b, b)
    safe_d = d2 > ANGLE_DENOM_EPS * ANGLE_DENOM_EPS
    ratio = jnp.where(
        safe_d, dot(a, b) * jax.lax.rsqrt(jnp.where(safe_d, d2, 1.0)), 0.0
    )
    ratio = jnp.clip(ratio, -1.0, 1.0)
    safe = jnp.abs(ratio) < 1.0 - 1e-6
    acos_safe = jnp.arccos(jnp.where(safe, ratio, 0.0))
    acos_edge = jnp.arccos(jax.lax.stop_gradient(ratio))
    return jnp.where(safe, acos_safe, acos_edge)


def to_sample_coords(pos: F3, consts: MarchConsts) -> F3:
    return (pos - consts.boxmin) * consts.boxscale


def compute_gradient_otf(em_sampler, pos: F3, consts: MarchConsts) -> F3:
    """On-the-fly central differences on the emission texture
    (volumeRender_kernel.cu:212-253). Offsets are one voxel (gradient_step)
    in WORLD units, then normalized; factor 0.5; no emission factor."""
    gs = consts.gradient_step

    def diff(delta: F3) -> Array:
        p1 = to_sample_coords(pos + delta, consts)
        p2 = to_sample_coords(pos - delta, consts)
        return em_sampler(p1) - em_sampler(p2)

    zero = jnp.zeros_like(pos.x)
    gx = diff(F3(gs.x + zero, zero, zero))
    gy = diff(F3(zero, gs.y + zero, zero))
    gz = diff(F3(zero, zero, gs.z + zero))
    return F3(gx * 0.5, gy * 0.5, gz * 0.5)


def lookup_gradient(scene: Scene, sample_pos: F3) -> F3:
    """Precomputed gradient volumes (volumeRender_kernel.cu:266-276)."""
    return F3(
        sample_trilinear(scene.gradient_x.data, sample_pos),
        sample_trilinear(scene.gradient_y.data, sample_pos),
        sample_trilinear(scene.gradient_z.data, sample_pos),
    )


class Taps(NamedTuple):
    """Raw texture values fetched at one march step (before any factor).

    The split between ``gather_taps`` (pure fetches; gradients wrt the
    grids are handcrafted scatter-adds in the fused backward) and
    ``step_from_taps`` (closed-form differentiable math) is what makes the
    O(1)-memory replay backward possible.
    """

    em: Array  # emission at the sample position
    ab: Array  # absorption at the sample position
    re: Optional[Array]  # reflection (lighting only)
    grad_taps: Optional[Tuple[Array, ...]]
    # lighting only: on-the-fly mode -> 6 emission taps (xp, xm, yp, ym,
    # zp, zm); lookup mode -> 3 gradient-volume taps (gx, gy, gz)


class StepParams(NamedTuple):
    """The differentiable per-step parameters (subset of the settings)."""

    factor_emission: Array
    factor_absorption: Array
    factor_reflection: Array
    color: F3
    light_colors: Optional[Array]  # (L, 3)


def params_of(scene: Scene, consts: MarchConsts) -> StepParams:
    return StepParams(
        factor_emission=consts.factor_emission,
        factor_absorption=consts.factor_absorption,
        factor_reflection=consts.factor_reflection,
        color=consts.color,
        light_colors=scene.light_colors if scene.has_lighting else None,
    )


def otf_tap_positions(pos: F3, consts: MarchConsts) -> Tuple[F3, ...]:
    """Sample coords of the 6 central-difference taps (xp, xm, yp, ym, zp, zm)."""
    gs = consts.gradient_step
    zero = jnp.zeros_like(pos.x)
    out = []
    for delta in (
        F3(gs.x + zero, zero, zero),
        F3(zero, gs.y + zero, zero),
        F3(zero, zero, gs.z + zero),
    ):
        out.append(to_sample_coords(pos + delta, consts))
        out.append(to_sample_coords(pos - delta, consts))
    return tuple(out)


def gather_taps(scene: Scene, consts: MarchConsts, pos: F3, samplers=None) -> Taps:
    """All texture fetches of one march step.

    Aliased roles (scene.absorption/reflection None) reuse the emission
    fetch — the reference's texture aliasing (volumeRender_kernel.cu:
    631-648) turned into a statically deduplicated gather.
    """
    if samplers is None:
        samplers = make_samplers(scene)
    sample_pos = to_sample_coords(pos, consts)
    em = samplers.em(sample_pos)
    ab = em if samplers.ab is samplers.em else samplers.ab(sample_pos)
    re = None
    grad_taps = None
    if scene.has_lighting:
        re = em if samplers.re is samplers.em else samplers.re(sample_pos)
        if scene.has_gradient_volumes:
            grad_taps = (
                samplers.gx(sample_pos),
                samplers.gy(sample_pos),
                samplers.gz(sample_pos),
            )
        else:
            grad_taps = tuple(
                samplers.em(p) for p in otf_tap_positions(pos, consts)
            )
    return Taps(em=em, ab=ab, re=re, grad_taps=grad_taps)


def shade_from_taps(
    scene: Scene,
    consts: MarchConsts,
    params: StepParams,
    taps: Taps,
    pos: F3,
    eye_origin: F3,
    samplers: "Samplers" = None,
) -> F3:
    """Illumination sum over all light sources; zero F3 if lighting is off.

    Differentiable in ``taps`` and ``params``; the LUT grid itself is a
    closure constant (its corner fetches carry no gradient, but the angle
    coordinates do — gradients flow through the fractional lerp weights
    back to the surface normal and hence the emission taps).
    """
    zero = jnp.zeros_like(pos.x)
    if not scene.has_lighting:
        return F3(zero, zero, zero)
    if samplers is None:
        samplers = make_samplers(scene)

    if scene.has_gradient_volumes:
        gx, gy, gz = taps.grad_taps
        grad = F3(gx, gy, gz)
    else:
        xp, xm, yp, ym, zp, zm = taps.grad_taps
        grad = F3((xp - xm) * 0.5, (yp - ym) * 0.5, (zp - zm) * 0.5)

    # negative normalized gradient approximates the surface normal; noise-
    # level gradients (see GRAD_EPS2 note above) clamp to the zero normal.
    # NB the inner where must use the SAME predicate as the outer one: with
    # g2 > 0 inside, a denormal g2 makes rsqrt's gradient overflow to inf
    # and the outer 0 * inf poisons the backward pass with NaN.
    g2 = dot(grad, grad)
    inv_len = jnp.where(
        g2 > GRAD_EPS2, jax.lax.rsqrt(jnp.where(g2 > GRAD_EPS2, g2, 1.0)), 0.0
    )
    surface_normal = grad * (-inv_len)

    reflection = params.factor_reflection * taps.re

    result = F3(zero, zero, zero)
    num_lights = scene.light_positions.shape[0]
    for i in range(num_lights):  # static unroll; L is small (1-2 in examples)
        lp = scene.light_positions[i]
        lc = params.light_colors[i]
        light_pos = F3(lp[0], lp[1], lp[2])

        light_out = light_pos - pos
        light_in = eye_origin - pos

        a = angle(surface_normal, light_in) / PI
        b = angle(surface_normal, light_out) / PI

        light_out_proj = light_out - dot(light_out, surface_normal) * surface_normal
        light_in_proj = light_in - dot(light_in, surface_normal) * surface_normal
        g = angle(light_in_proj, light_out_proj) / PI

        light = samplers.lut(F3(a, b, g))

        contrib = reflection * light
        result = result + F3(contrib * lc[0] * params.color.x,
                             contrib * lc[1] * params.color.y,
                             contrib * lc[2] * params.color.z)
    return result


def step_from_taps(
    scene: Scene,
    consts: MarchConsts,
    params: StepParams,
    taps: Taps,
    pos: F3,
    eye_origin: F3,
    samplers: "Samplers" = None,
) -> Tuple[F3, Array]:
    """Closed-form step math from fetched taps: (premultiplied rgb, alpha)."""
    emission = params.factor_emission * taps.em
    absorption = params.factor_absorption * taps.ab

    alpha = 1.0 - jnp.exp(-absorption * consts.tstep)

    # colored = emission * tstep * color (emission is a grayscale float3)
    ds = consts.tstep
    colored = F3(
        emission * ds * params.color.x,
        emission * ds * params.color.y,
        emission * ds * params.color.z,
    )

    illumination = shade_from_taps(scene, consts, params, taps, pos, eye_origin, samplers)
    illuminated = colored + illumination

    shaded_rgb = F3(illuminated.x * alpha, illuminated.y * alpha, illuminated.z * alpha)
    return shaded_rgb, alpha


def march_step(
    scene: Scene,
    consts: MarchConsts,
    pos: F3,
    eye_origin: F3,
    samplers: "Samplers" = None,
) -> Tuple[F3, Array]:
    """One march step: returns (premultiplied rgb, alpha) at ``pos``."""
    if samplers is None:
        samplers = make_samplers(scene)
    taps = gather_taps(scene, consts, pos, samplers)
    return step_from_taps(
        scene, consts, params_of(scene, consts), taps, pos, eye_origin, samplers
    )


def composite_under(
    sum_rgb: F3, sum_w: Array, shaded_rgb: F3, alpha: Array
) -> Tuple[F3, Array]:
    """Front-to-back under operator: sum = (1 - sum.w) * shaded + sum."""
    t = 1.0 - sum_w
    new_rgb = F3(
        t * shaded_rgb.x + sum_rgb.x,
        t * shaded_rgb.y + sum_rgb.y,
        t * shaded_rgb.z + sum_rgb.z,
    )
    new_w = t * alpha + sum_w
    return new_rgb, new_w
