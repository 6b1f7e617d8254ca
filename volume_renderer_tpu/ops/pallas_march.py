"""Tiled Pallas TPU ray-march kernel — the fast forward path.

TPU-first re-design of the reference's per-pixel CUDA march (reference
src/C/vr/volumeRender_kernel.cu:365-507). The CUDA kernel leans on the
texture cache for its 8-corner trilinear fetches; the TPU has no gather
hardware, so the march is restructured around what the VPU can do fast —
128-lane dynamic gathers (``take_along_axis``) from VMEM-resident rows —
without changing the math:

- The image is cut into 32x32-pixel tiles (1024 rays = one (8,128) vreg
  set); the Pallas grid runs one program per tile (the analog of the
  reference's 16x16 thread blocks, src/C/mex/render.cpp:236-238).
- Each tile sweeps the volume along a per-render principal axis, one
  slice pair (s, s+1) at a time, front-to-back for every ray at once.
  A ray's march steps whose trilinear base slice is ``s`` form a
  contiguous step interval (the sweep coordinate is affine in the step
  index), so sweeping slice pairs in ray order preserves the exact
  front-to-back compositing semantics — including the per-ray opacity
  early exit (volumeRender_kernel.cu:485-492), applied as a mask.
- Per (tile, slice pair), the tile's sample footprint is a small window;
  the kernel computes its origin in-kernel (vector min over live rays),
  DMAs the (2, WR, WC) window from the HBM-resident volume into VMEM,
  and serves all 8 trilinear corner fetches with a row-scan of lane
  gathers over the window. The scan is bounded per step by the live
  rays' row range, so cost tracks the true footprint.
- Termination, box clipping, and the trilinear/compositing math match
  ops/forward.py (same formulas; positions in closed form pos0 + k*step
  like ops/slab.py — allclose, not bit-identical, to the accumulated
  positions of the while-loop path).

Scope (v1): lighting-off scenes (emission + absorption, absorption
optionally aliased). Lighting-on renders fall back to ops/forward.py.

The kernel cannot serve every camera: it requires all box-hitting rays
to advance monotonically along one axis (true for any perspective camera
whose field of view keeps direction components bounded away from zero —
every reference example qualifies). ``render_forward_fast`` checks this
on device and falls back to the flat path, and re-renders via the flat
path if a tile's footprint overflows the static window (overflow flag).
"""

from __future__ import annotations

import functools
import logging
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volume_renderer_tpu.models.scene import RenderOptions, Scene
from volume_renderer_tpu.ops.float3 import F3
from volume_renderer_tpu.ops.geometry import generate_rays, intersect_box

_log = logging.getLogger(__name__)

TILE = 32  # image tile edge (TILE*TILE == 8*128 rays, one vreg set)
_A_MIN = 0.05  # min |sweep-voxels per step|; below -> fallback (march
# would spend >~25 steps per slice pair and window drift is unbounded)
_BIG = 3.0e7  # safe pre-int-cast clamp magnitude (python float: kernels
# must not capture traced/jnp constants)


class _KCfg(NamedTuple):
    """Static kernel configuration (hashable; part of the jit key)."""

    d: int            # sweep-axis extent (real)
    h: int            # row-axis extent (real)
    w: int            # lane-axis extent (real)
    hp: int           # padded row extent (mult of 8)
    wp: int           # padded lane extent (mult of 128)
    wr: int           # window rows
    wc: int           # window lanes (128 or 256)
    ascending: bool
    ab_aliased: bool
    n_steps: int
    grad_mode: bool = False  # replay: also accumulate per-ray pieces of
    # the transfer-parameter gradients (see transfer_grads_fast)
    scatter: bool = False  # replay + in-kernel voxel-gradient scatter
    # (implies grad_mode; see voxel_grads_fast / docs/pallas_backward_design.md)
    lighting: bool = False  # HG-LUT shading with on-the-fly gradients
    # (reference volumeRender_kernel.cu:308-353; forward only)
    n_lights: int = 0
    lut_l: int = 0     # illumination LUT edge length
    lut_segs: int = 0  # 128-lane segments per LUT row (ceil(L^2/128))
    re_aliased: bool = True
    axis: str = "z"    # sweep axis (maps tap pairs to world gradient axes)
    lookup: bool = False  # lighting with PRECOMPUTED gradient volumes
    # (reference example1_grad / volumeRender_kernel.cu:266-276): three
    # more 2-slice windows replace the OTF tap machinery
    rs: int = 0  # scatter A-block rows (<= wr); the launcher ladder
    # widens it (wr//2 -> wr) for slabs whose row footprint overflows
    k: int = 8  # march steps per chunk (the (k*8, 128) sample batch)
    brick: bool = False  # z-brick segment march: the volume is one
    # halo-padded local brick, ww seeds from the gt input (entry opacity
    # from the two-phase transmittance relay, parallel/bricks.py), samples
    # composite only inside the owned global-z band, and the per-ray exit
    # opacity is returned alongside the image
    d_global: int = 0  # global sweep extent (brick mode affine scale)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


_K = 8  # march steps per chunk: samples are batched (K*8, 128) so every
# VPU op covers K vregs, amortizing issue/loop overhead across steps


def _identity128():
    """(128, 128) f32 identity — the MXU transpose operand."""
    r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return (r == c).astype(jnp.float32)


def _make_scans(ks: int):
    """Roll-based inclusive prefix ops over the ``ks // 8`` step groups
    of a (ks, 128) chunk block (each group is one 8-sublane vreg row).

    Returns (scan_mul, scan_add, scan_or, subl): front-to-back "under"
    compositing is a prefix product over step transmittances; the
    per-ray emission sum and the termination flag are a prefix sum / or.
    ``pltpu.roll(t, sh, axis=0)[i] = t[i - sh]`` shifts earlier steps
    into place; masking with ``subl >= sh`` keeps the scan exclusive of
    wrap-around. Unit-tested directly in interpret mode
    (tests/test_kernel_helpers.py).
    """
    subl = jax.lax.broadcasted_iota(jnp.int32, (ks, 128), 0)

    def scan(v, combine, pad):
        t = v
        sh = 8
        while sh < ks:
            t = combine(t, jnp.where(subl >= sh,
                                     pltpu.roll(t, sh, axis=0), pad))
            sh *= 2
        return t

    def scan_mul(v):
        return scan(v, jnp.multiply, 1.0)

    def scan_add(v):
        return scan(v, jnp.add, 0.0)

    def scan_or(v):
        return scan(v, jnp.bitwise_or, 0)

    return scan_mul, scan_add, scan_or, subl


def _mxu_t(a, ident):
    """Transpose a (128, 128) block on the MXU: out[j, i] = a[i, j].

    ``dot_general`` contracting both operands' sublane axes lowers to the
    lhs-transposed matmul pattern; with the identity as rhs the result is
    the exact transpose (integer-valued f32 inputs stay exact).
    """
    return jax.lax.dot_general(
        a, ident, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _scatter_chunk(cfg: "_KCfg", sarr_ref, gwin_ref, spec, ny, nx,
                   r8, seg_lo, n_segs):
    """Scatter-add one chunk's per-sample cotangents into the grad windows.

    Round-5 restructure of the MXU one-hot scatter
    (docs/pallas_backward_design.md): the round-4 version moved samples
    onto the contraction axis with hoisted MXU transposes plus a
    replication lane-gather per array per sublane group, and built the
    one-hots by integer compares against 128-row iotas. This version is
    GATHER- and TRANSPOSE-FREE:

    - the per-sample rows (window-coord floats ``yw``/``xw`` and the
      z-weighted cotangent products) are staged once per chunk into the
      ``sarr_ref`` VMEM scratch; each sublane group's row is then a
      dynamic full-row read broadcast along sublanes — the same
      proven-fast access the forward's ``gather_row`` uses;
    - the one-hot weights collapse to the trilinear HAT function,
      ``relu(1 - |(corner - iota) + frac|)``: the forward's separable
      corner weights ((1-f) at floor, f at floor+1) in 5 vector ops —
      no compares. The corner row is the forward's fully-clamped
      integer window row; the fraction is zeroed where the volume-edge
      clamp collapsed both corners onto one voxel, so clamped samples
      send weight 1 to the edge voxel exactly as the forward read it.
      Exactness: (corner - iota) is an exact small integer; adding the
      fraction rounds at ulp(2) inside the hat's support and the relu
      kills everything outside, so weights match the forward's to
      ~1e-7 — same class as the round-4 compare-built one-hots;
    - the Y one-hot is built ONCE per group at (WR, 128) — sublane
      blocks need not be 128-wide, halving both build and matmul versus
      the round-4 (128, 128) blocks — multiplied by each block's
      cotangent row, stacked to (nblk*WR, 128), and contracted against
      the X hat matrix (WC, 128) in ONE lane-contracting matmul
      (out[r, c] = sum_s A[r, s] X[c, s]).

    Samples masked inactive carry zero cotangents, so dead groups
    contribute exactly nothing. Adjoint of the reference march,
    volumeRender_kernel.cu:365-507.

    Round-5 footprint reductions, all driven by plan-table scalars (no
    vector->scalar extractions):

    - A-blocks span RS = wr // 2 rows at the slab's own 8-aligned row
      base ``r8`` (plan r_lo) instead of the full window — the typical
      slab footprint is ~20 rows of a 64-row window, so this halves (or
      better) both the A build and the matmul; slabs that genuinely
      exceed RS are flagged by the plan's scat_ovf and retry at wr=128
      (RS=64), beyond which the replay fallback serves them;
    - the X hat builds and contracts ONE 128-lane window segment per
      iteration of a ``n_segs``-trip loop over the slab's touched
      segments ([seg_lo, seg_lo+n_segs)) — at WC=256 almost every slab
      touches one; cross-segment fractional corners split naturally
      (the hat of the shifted coordinate is nonzero in exactly the
      segment(s) holding each corner);
    The lit backward reuses this machinery through the ``spec``
    generalization: samples may carry several distinct hat positions
    (the main corners plus the OTF tap corners) and several cotangent
    roles. ``sarr`` rows are laid out as [2*ny y-(corner, frac) pairs |
    2*nx x-pairs | dv rows]; ``spec`` is a static tuple of matmul
    groups ``(x_id, blocks)`` — each group contracts ONE x hat against
    a stack of A-blocks, where block ``(gwin_block, terms)`` sums
    ``y_hat[y_id] * dv_row`` over its ``(y_id, dv_row)`` terms (e.g. a
    4-slice emission block sums the main fetch and both row-tap
    cotangents, each under its own y hat, into one matmul operand).
    Blocks of different groups may target the same gwin block (the
    x-tap matmuls accumulate into the emission blocks).
    """
    KS = cfg.k * 8
    RS = cfg.rs
    f32 = jnp.float32
    # NB a dynamic group-loop trip bound is SLOWER (-11% round 4,
    # reconfirmed round 5): variable-trip lowering costs more than the
    # skipped dead tail groups save; the loop runs all KS groups.

    riota = jax.lax.broadcasted_iota(jnp.int32, (RS, 128), 0).astype(f32)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0).astype(f32)
    r8f = r8.astype(f32)
    dv0 = 2 * (ny + nx)

    # G sublane groups batch into ONE contraction by concatenating their
    # samples along the lane (contraction) axis — identical MACs, G-fold
    # fewer matmul issues. Measured round 5: with the hat BUILD removed
    # the scatter time barely moved, i.e. per-matmul issue/pipeline
    # overhead (not MACs, not the build) dominated the 64-small-matmul
    # structure; lane-batching attacks exactly that.
    G = 8

    def one_seg(seg, cbase):
        def body(sup, accs):
            def row(a, i, nrows):
                return jnp.broadcast_to(
                    sarr_ref[a, i, :].reshape(1, 128), (nrows, 128))

            y_cat = []   # per y-hat id: list of per-sub (RS, 128)
            x_cat = []
            blk_cat = {}  # (group idx, block idx) -> per-sub arrays
            for sub in range(G):
                i = sup * G + sub
                y_hats = [jnp.maximum(
                    0.0, 1.0 - jnp.abs(((row(2 * t, i, RS) - r8f) - riota)
                                       + row(2 * t + 1, i, RS)))
                    for t in range(ny)]
                x_hats = [jnp.maximum(
                    0.0, 1.0 - jnp.abs(
                        ((row(2 * ny + 2 * t, i, 128) - cbase) - ciota)
                        + row(2 * ny + 2 * t + 1, i, 128)))
                    for t in range(nx)]
                x_cat.append(x_hats)
                for gi, (x_id, blocks) in enumerate(spec):
                    for bi, (_, terms) in enumerate(blocks):
                        ab = None
                        for y_id, dv in terms:
                            term = y_hats[y_id] * row(dv0 + dv, i, RS)
                            ab = term if ab is None else ab + term
                        blk_cat.setdefault((gi, bi), []).append(ab)
            outs = []
            for gi, ((x_id, blocks), acc) in enumerate(zip(spec, accs)):
                a_full = jnp.concatenate(
                    [jnp.concatenate(blk_cat[(gi, bi)], axis=1)
                     for bi in range(len(blocks))], axis=0)
                x_full = jnp.concatenate(
                    [xh[x_id] for xh in x_cat], axis=1)
                # Lighting OFF: DEFAULT (one bf16 MXU pass) measured
                # against HIGHEST (fp32, ~4x passes) at 64^3 — gradient
                # error vs the replay VJP is IDENTICAL (the replay's
                # (tot - prefix) cancellation dominates, not matmul
                # rounding) while HIGHEST cost +29% scatter time.
                # Lighting ON: fp32 is REQUIRED — the OTF tap adjoint is
                # a +-difference stencil (adjacent voxels accumulate
                # large cancelling tap contributions), so bf16 rounding
                # of the big terms destroys the small difference
                # (measured: chip relL2 1.5e-2 vs the f32 interpret's
                # 7e-4 on the same scene).
                prec = (jax.lax.Precision.HIGHEST if cfg.lighting
                        else jax.lax.Precision.DEFAULT)
                outs.append(acc + jax.lax.dot_general(
                    a_full, x_full, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32, precision=prec))
            return tuple(outs)

        accs0 = tuple(jnp.zeros((len(blocks) * RS, 128), f32)
                      for _, blocks in spec)
        accs = jax.lax.fori_loop(0, KS // G, body, accs0)
        # gwin rows are (seg, window-row) flattened: seg*WR + r8 is
        # 8-aligned (WR mult of 8, r8 aligned), one traced sublane slice.
        # Blocks targeted by SEVERAL matmul groups (the lit emission
        # blocks receive the main AND both x-tap groups) combine in
        # registers first — one RMW statement per gwin block; repeated
        # dynamic-base `+=` on the same rows from separate statements is
        # an aliasing pattern best not left to the compiler.
        base = pl.multiple_of(seg * cfg.wr + r8, 8)
        per_blk = {}
        for (_, blocks), acc in zip(spec, accs):
            for bi, (blk, _) in enumerate(blocks):
                part = acc[bi * RS:(bi + 1) * RS]
                per_blk[blk] = (part if blk not in per_blk
                                else per_blk[blk] + part)
        for blk in sorted(per_blk):
            gwin_ref[blk, pl.ds(base, RS), :] += per_blk[blk]

    if cfg.wc == 128:
        # one window segment exists; seg_lo is always 0 — specialize
        # away the segment loop entirely
        one_seg(jnp.int32(0), jnp.float32(0.0))
    else:
        # WC=256: both segments statically — static store bases and no
        # variable-trip loop beat skipping the (often untouched) second
        # segment via a dynamic [seg_lo, seg_lo+n_segs) loop by 33%
        # (A/B at 512^3: 36.6 s vs 54.4 s scatter pass)
        del seg_lo, n_segs
        one_seg(jnp.int32(0), jnp.float32(0.0))
        one_seg(jnp.int32(1), jnp.float32(128.0))


def _rmw_grad_windows(cfg: "_KCfg", s, y0w, x0w, gwin_ref, gem_ref, gab_ref,
                      rmw_ref, rsem, gre_ref=None, zs0=None):
    """Accumulate the slab's grad windows into the HBM grids.

    Read-modify-write of the (wr, 128) window segments of every
    (role, z) block. Lighting off: 2 slices (s, s+1) per role. Lighting
    on (OTF): the EMISSION blocks span the 4-slice tap window
    (zs0..zs0+3, the same slices the forward's tap gathers read) and
    absorption/reflection keep 2 slices. All reads are issued before any
    wait; all writes are waited before returning, so the next slab's
    reads of the shared slices observe this slab's contribution. The
    sequential TPU grid makes the cross-tile accumulation race-free.
    """
    nseg = cfg.wc // 128
    plan = []
    k = 0
    if cfg.lighting:
        rolezs = [(gem_ref, zs0, j) for j in range(4)]
        if not cfg.ab_aliased:
            rolezs += [(gab_ref, s, z) for z in (0, 1)]
        if not cfg.re_aliased:
            rolezs += [(gre_ref, s, z) for z in (0, 1)]
    else:
        nblk = 2 if cfg.ab_aliased else 4
        rolezs = [(gem_ref if b < 2 else gab_ref, s, b % 2)
                  for b in range(nblk)]
    for b, (ref, zb, z) in enumerate(rolezs):
        for seg in range(nseg):
            plan.append((k, ref, zb, z, seg, b))
            k += 1

    def cp(k, ref, zb, z, seg, to_hbm):
        xs = pl.multiple_of(x0w + seg * 128, 128)
        hbm = ref.at[zb + z, pl.ds(y0w, cfg.wr), pl.ds(xs, 128)]
        buf = rmw_ref.at[k]
        src, dst = (buf, hbm) if to_hbm else (hbm, buf)
        return pltpu.make_async_copy(src, dst, rsem.at[k])

    for k, ref, zb, z, seg, b in plan:
        cp(k, ref, zb, z, seg, False).start()
    for k, ref, zb, z, seg, b in plan:
        cp(k, ref, zb, z, seg, False).wait()
    for k, ref, zb, z, seg, b in plan:
        # gwin layout: (nblk, nseg * wr, 128) — rows seg*wr..seg*wr+wr
        rmw_ref[k] += gwin_ref[b, seg * cfg.wr:(seg + 1) * cfg.wr, :]
    for k, ref, zb, z, seg, b in plan:
        cp(k, ref, zb, z, seg, True).start()
    for k, ref, zb, z, seg, b in plan:
        cp(k, ref, zb, z, seg, True).wait()


# ---------------------------------------------------------------------------
# lighting-mode helpers (reference volumeRender_kernel.cu:284-353)
# ---------------------------------------------------------------------------

_ANGLE_EPS2 = 1e-24  # squared-length-product guard (raymarch_core.ANGLE_DENOM_EPS^2)
_GRAD_EPS2 = 1e-12   # zero-normal clamp (raymarch_core.GRAD_EPS2)
_PI = 3.14159265358979323846


def _acos(x):
    """float32 arccos via the cephes asinf minimax polynomial (~1 ulp).

    Mosaic lowers no acos/atan primitives; this matches XLA's arccos (the
    oracle/flat paths) to ~1e-7 rad — far inside the allclose contract.
    """
    a = jnp.abs(x)
    big = a > 0.5
    z2 = jnp.where(big, 0.5 * (1.0 - a), a * a)
    r = jnp.where(big, jnp.sqrt(z2), a)
    p = ((((4.2163199048e-2 * z2 + 2.4181311049e-2) * z2
           + 4.5470025998e-2) * z2 + 7.4953002686e-2) * z2
         + 1.6666752422e-1)
    asin_r = r + r * z2 * p
    acos_a = jnp.where(big, 2.0 * asin_r, jnp.float32(_PI / 2) - asin_r)
    return jnp.where(x < 0, jnp.float32(_PI) - acos_a, acos_a)


def _vangle(ax, ay, az, bx, by, bz):
    """acos of the normalized dot product, guarded like raymarch_core.angle
    (forward value only — the lighting kernel is not differentiated)."""
    d2 = ((ax * ax + ay * ay + az * az)
          * (bx * bx + by * by + bz * bz))
    safe = d2 > _ANGLE_EPS2
    dotp = ax * bx + ay * by + az * bz
    ratio = jnp.where(safe,
                      dotp * jax.lax.rsqrt(jnp.where(safe, d2, 1.0)), 0.0)
    return _acos(jnp.clip(ratio, -1.0, 1.0))


def _vangle_bwd(ax, ay, az, bx, by, bz, d_ang):
    """Analytic VJP of ``_vangle`` (guards mirrored from the forward).

    angle = acos(clip(r)) with r = (a.b) * rsqrt(|a|^2 |b|^2); the
    gradient d r/d a_i = b_i/(|a||b|) - r a_i/|a|^2 (and symmetrically
    for b) times d acos = -1/sqrt(1 - r^2), zeroed where the forward's
    degenerate-length guard clamps (d2 <= eps2).

    Near-parallel vectors make acos' arbitrarily ill-conditioned —
    measured on the smooth flagship shell, whose camera-facing cap has
    normal == view over a large region, the replay's autodiff and any
    reimplementation disagree at relL2 ~1e-2 purely from rounding
    amplified by 1/sqrt(1-r^2) (adding 5% volume noise collapses the
    disagreement to 7e-4). The kernel therefore floors 1 - r^2 at 1e-6,
    bounding the amplification at 1e3: a deliberate deviation from raw
    autodiff, active only where the exact derivative is
    rounding-dominated, and the stable choice for inverse rendering.
    Returns (dax, day, daz, dbx, dby, dbz).
    """
    a2 = ax * ax + ay * ay + az * az
    b2 = bx * bx + by * by + bz * bz
    d2 = a2 * b2
    safe = d2 > _ANGLE_EPS2
    il = jnp.where(safe, jax.lax.rsqrt(jnp.where(safe, d2, 1.0)), 0.0)
    dotp = ax * bx + ay * by + az * bz
    r = jnp.clip(jnp.where(safe, dotp * il, 0.0), -1.0, 1.0)
    s2 = jnp.maximum(1.0 - r * r, 1e-6)
    dacos = jnp.where(
        safe, -jax.lax.rsqrt(s2), 0.0) * d_ang
    inv_a2 = jnp.where(safe, 1.0 / jnp.where(safe, a2, 1.0), 0.0)
    inv_b2 = jnp.where(safe, 1.0 / jnp.where(safe, b2, 1.0), 0.0)
    ra = r * inv_a2
    rb = r * inv_b2
    return (dacos * (bx * il - ra * ax), dacos * (by * il - ra * ay),
            dacos * (bz * il - ra * az), dacos * (ax * il - rb * bx),
            dacos * (ay * il - rb * by), dacos * (az * il - rb * bz))


def _lut_fetch(cfg: "_KCfg", lut_ref, act, a, b, g, with_grad: bool = False):
    """CUDA-semantics trilinear fetch of the illumination LUT at the
    normalized angle triple (a, b, g) for every sample of a chunk block.

    The LUT has no window coherence (coords are data-dependent normals),
    so instead of the volume windows' DMA machinery the whole LUT sits in
    VMEM laid out as (L * SEGS, 128) rows — row b*SEGS+seg holds lanes
    [seg*128, (seg+1)*128) of slice b's (g, a)-flattened plane — and the
    fetch loops the chunk's OCCUPIED (b-row, lane-segment) rectangle
    (vector min/max over active samples), broadcasting one row per
    iteration and lane-gathering the in-segment corners under masks. On
    coherent normals (real volumes are smooth) the rectangle is a few
    rows by a few segments; worst-case (noise normals) it degrades
    toward L*SEGS iterations, never worse than the XLA gather fallback.
    Exact trilinear-of-grid semantics (ops/sampling.py): u = c*L - 0.5,
    corner clamp, fractional weights from the unclamped floor.

    ``with_grad=True`` additionally returns the coordinate derivatives
    (d val / d a, d b, d g) — the trilinear lerp differences times L
    (u = c*L - 0.5 so du/dc = L), accumulated from the SAME corner
    fetches. Clamped corner pairs are equal, so edge derivatives vanish
    exactly as autodiff of the clamped fetch does. Returns
    (val, da, db, dg) then.
    """
    KS = cfg.k * 8
    L, SEGS = cfg.lut_l, cfg.lut_segs
    f32 = jnp.float32

    def setup(c, n):
        u = c * jnp.float32(n) - 0.5
        f0 = jnp.floor(u)
        fr = u - f0
        f0i = jnp.clip(f0, -_BIG, _BIG).astype(jnp.int32)
        return jnp.clip(f0i, 0, n - 1), jnp.clip(f0i + 1, 0, n - 1), fr

    a0, a1, fa = setup(a, L)
    b0, b1, fb = setup(b, L)
    g0, g1, fg = setup(g, L)

    idx_lo = g0 * L + a0
    idx_hi = g1 * L + a1

    big = jnp.int32(SEGS * 128 - 1)
    b_lo = jnp.min(jnp.where(act, b0, L - 1))
    b_hi = jnp.max(jnp.where(act, b1, 0))
    s_lo = jnp.min(jnp.where(act, idx_lo, big)) // 128
    s_hi = jnp.max(jnp.where(act, idx_hi, 0)) // 128
    nseg = s_hi - s_lo + 1
    count = jnp.maximum(0, b_hi - b_lo + 1) * jnp.maximum(0, nseg)

    fa1, fb1, fg1 = 1.0 - fa, 1.0 - fb, 1.0 - fg
    # per-corner (value weight, d/dfa weight, d/dfg weight)
    corners = (
        (idx_lo, fg1 * fa1, -fg1, -fa1),
        (g0 * L + a1, fg1 * fa, fg1, -fa),
        (g1 * L + a0, fg * fa1, -fg, fa1),
        (idx_hi, fg * fa, fg, fa),
    )

    zero = jnp.zeros((KS, 128), f32)

    def it(t, accs):
        acc, aa, ab_, ag = accs
        bq = b_lo + t // nseg
        seg = s_lo + t % nseg
        row = jnp.broadcast_to(
            lut_ref[bq * SEGS + seg, :].reshape(1, 128), (KS, 128))
        wb = (jnp.where(b0 == bq, fb1, 0.0) + jnp.where(b1 == bq, fb, 0.0))
        val = zero
        da = zero
        dg = zero
        for idx, w, wa, wg in corners:
            m = (idx // 128) == seg
            lane = jnp.clip(idx - seg * 128, 0, 127)
            v = jnp.take_along_axis(row, lane, axis=-1)
            vm = jnp.where(m, v, 0.0)
            val = val + vm * w
            if with_grad:
                da = da + vm * wa
                dg = dg + vm * wg
        if with_grad:
            dwb = (jnp.where(b0 == bq, -1.0, 0.0)
                   + jnp.where(b1 == bq, 1.0, 0.0))
            return (acc + val * wb, aa + da * wb, ab_ + val * dwb,
                    ag + dg * wb)
        return (acc + val * wb, aa, ab_, ag)

    out = jax.lax.fori_loop(0, count, it, (zero, zero, zero, zero))
    if with_grad:
        lf = jnp.float32(L)
        return out[0], out[1] * lf, out[2] * lf, out[3] * lf
    return out[0]


def _window_plans(S: int, ascending: bool, H: int, W: int, hp: int, wp: int,
                  wr: int, wc: int, rs: int, k: int,
                  x0v, xsv, y0v, ysv, u0v, av, icap, hit,
                  margin_y=None, margin_x=None):
    """Per-(tile, slab) window plan, precomputed in XLA.

    Round 4's kernel derived each slab's window origin in-kernel from
    vector min/max over live rays — ~5 vector->scalar extractions per
    slab at ~1 us each, a measured ~0.3 s per sweep at 256^3 (65k slab
    visits). The plan moves that reduction OUT of the kernel: window
    coordinates are affine in the step index with closed-form per-slab
    step intervals, so every (tile, slab) origin is computable up front
    in one vectorized XLA pass; the kernel then reads five scalars from
    an SMEM table. The plan uses the CONSERVATIVE live set (all
    box-hitting rays, ignoring opacity termination), so its windows are
    supersets of the round-4 ones: correctness is unchanged (windows
    must only CONTAIN the live footprint), overflow detection moves to
    XLA (may flag slightly more scenes than the live-set test did; those
    fall back exactly as before), and terminated tiles still skip whole
    slabs via the in-kernel any_live gate.

    Returns ``(plans, ovf_any, scat_ovf_any)``: plans int32
    (n_tiles, S, 10) with fields [y0w, x0w, n_chunks, r_lo, n_rows, ovf,
    nmax, scat_ovf, seg_lo, n_segs].
    Formulas mirror the round-4 in-kernel ``slab_ranges``/``ext`` exactly
    (same FP ops in the same order), minus the live-set ww term.

    The scatter-mode extras: ``nmax`` bounds the group loop (dead
    step-slots past every ray's own range are skipped), ``seg_lo`` /
    ``n_segs`` give the slab's touched 128-lane window segments (the X
    hat builds and contracts only those), and ``scat_ovf`` flags slabs
    whose row footprint exceeds the scatter's RS-row A-block — stricter
    than ``ovf``, applied only by the scatter launcher (forward windows
    still span the full wr rows; the scatter ladder widens rs on
    overflow).
    """
    f32 = jnp.float32
    icap_f = icap.astype(f32)
    inv_a = jnp.where(hit, 1.0 / jnp.where(hit, av, 1.0), 0.0)

    def one(s):
        sf = s.astype(f32)
        t1 = (sf - u0v) * inv_a
        t2 = (sf + 1.0 - u0v) * inv_a
        if ascending:
            lo = jnp.ceil(t1)
            hi = jnp.ceil(t2)
            first, last = s == 0, s == S - 1
        else:
            lo = jnp.floor(t2) + 1.0
            hi = jnp.floor(t1) + 1.0
            first, last = s == S - 1, s == 0
        lo = jnp.where(first, 0.0, lo) - 1.0
        hi = jnp.where(last, icap_f, hi) + 1.0
        lo = jnp.clip(lo, 0.0, icap_f).astype(jnp.int32)
        hi = jnp.clip(jnp.clip(hi, -_BIG, _BIG), 0.0, icap_f).astype(
            jnp.int32)
        lo = jnp.where(hit, lo, 0)
        hi = jnp.where(hit, hi, 0)
        mask = hit & (lo < hi)
        lof = lo.astype(f32)
        hif = (hi - 1).astype(f32)

        def ext(base, step_, n_real, margin):
            e1 = base + step_ * lof
            e2 = base + step_ * hif
            mn_e = jnp.minimum(e1, e2)
            mx_e = jnp.maximum(e1, e2)
            if margin is not None:
                mn_e = mn_e - margin
                mx_e = mx_e + margin
            lo_f = jnp.floor(mn_e)
            hi_f = jnp.floor(mx_e) + 1.0
            lo_i = jnp.clip(
                jnp.clip(lo_f, -_BIG, _BIG).astype(jnp.int32), 0, n_real - 1)
            hi_i = jnp.clip(
                jnp.clip(hi_f, -_BIG, _BIG).astype(jnp.int32), 0, n_real - 1)
            mn = jnp.min(jnp.where(mask, lo_i, jnp.int32(2 ** 30)),
                         axis=(1, 2))
            mx = jnp.max(jnp.where(mask, hi_i, jnp.int32(-1)), axis=(1, 2))
            return mn, mx

        ymn, ymx = ext(y0v, ysv, H, margin_y)
        xmn, xmx = ext(x0v, xsv, W, margin_x)
        y0w = jnp.clip((ymn // 8) * 8, 0, hp - wr)
        x0w = jnp.clip((xmn // 128) * 128, 0, wp - wc)
        ovf = ((ymx - y0w >= wr) | (xmx - x0w >= wc)).astype(jnp.int32)
        n_rows = jnp.clip(ymx - y0w + 1, 1, wr)
        r_lo = jnp.clip(ymn - y0w, 0, wr - 1)
        scat_ovf = (ovf | (n_rows - jnp.clip((r_lo // 8) * 8, 0, wr - rs)
                           > rs).astype(jnp.int32))
        seg_lo = jnp.clip(xmn - x0w, 0, wc - 1) // 128
        seg_hi = jnp.clip(xmx - x0w, 0, wc - 1) // 128
        n_segs = jnp.maximum(seg_hi - seg_lo + 1, 1)
        nmax = jnp.max(jnp.where(mask, hi - lo, 0), axis=(1, 2))
        n_chunks = (nmax + (k - 1)) // k
        any_m = jnp.any(mask, axis=(1, 2))
        z = jnp.zeros_like(y0w)
        return jnp.stack([
            jnp.where(any_m, y0w, 0),
            jnp.where(any_m, x0w, 0),
            jnp.where(any_m, n_chunks, 0),
            jnp.where(any_m, r_lo, 0),
            jnp.where(any_m, n_rows, 1),
            jnp.where(any_m, ovf, 0),
            jnp.where(any_m, nmax, 0),
            jnp.where(any_m, scat_ovf, 0),
            jnp.where(any_m, seg_lo, 0),
            jnp.where(any_m, n_segs, 1)], axis=-1)

    # batch the per-slab pass 8 slabs at a time: a bare lax.map(S) costs
    # a 511-trip XLA while loop at 512^3 (~7% of the forward); vmap
    # inside the map amortizes the loop overhead while keeping the
    # transient footprint bounded (~8 slabs of (n_tiles, 8, 128) rays)
    B = 8
    s_pad = ((S + B - 1) // B) * B
    ss = jnp.arange(s_pad).reshape(-1, B)
    plans = jax.lax.map(jax.vmap(one), ss).reshape(s_pad, -1, 10)[:S]
    plans = jnp.transpose(plans, (1, 0, 2))
    ovf_any = jnp.any(plans[:, :, 5] != 0)
    scat_ovf_any = jnp.any(plans[:, :, 7] != 0)
    return plans, ovf_any, scat_ovf_any


def _march_kernel(cfg: _KCfg, rayf_ref, rayi_ref, em_ref, ab_ref, consts_ref,
                  gt_ref, plan_ref, out_ref, wem, wab, sems,
                  gem_ref=None, gab_ref=None, gre_ref=None, gwin=None,
                  rmw=None, rsem=None,
                  sarr=None, lut_ref=None, re_ref=None, wre=None,
                  g_refs=None, wg=None):
    """One image tile: sweep all slice pairs, composite, write (4,8,128).

    Inner structure: per slice pair, the tile's owned march steps are
    processed in chunks of K steps; each chunk's 8*K*128 samples run
    through one window row-scan and a roll-based prefix-product
    compositor (front-to-back "under" is a prefix-scan over step
    transmittances), so per-step work is pure batched vector code.
    """
    D, H, W = cfg.d, cfg.h, cfg.w
    WR, WC = cfg.wr, cfg.wc
    S = D - 1  # sweep positions (slice pairs)
    K = cfg.k
    KS = K * 8

    x0v = rayf_ref[0, 0]
    xsv = rayf_ref[0, 1]
    y0v = rayf_ref[0, 2]
    ysv = rayf_ref[0, 3]
    u0v = rayf_ref[0, 4]
    av = rayf_ref[0, 5]
    icap = rayi_ref[0, 0]
    hit = rayi_ref[0, 1] != 0
    if cfg.grad_mode:
        gcolb = jnp.broadcast_to(gt_ref[0, 0].reshape(1, 8, 128),
                                 (K, 8, 128)).reshape(K * 8, 128)
        totb = jnp.broadcast_to(gt_ref[0, 1].reshape(1, 8, 128),
                                (K, 8, 128)).reshape(K * 8, 128)
        if cfg.lighting:
            # lit grads need the raw per-channel pixel cotangents
            # (shading couples channels through the light colors)
            gRb, gGb, gBb = (jnp.broadcast_to(
                gt_ref[0, 2 + c].reshape(1, 8, 128),
                (K, 8, 128)).reshape(K * 8, 128) for c in range(3))

    tstep = consts_ref[0]
    fem = consts_ref[1]
    fab = consts_ref[2]
    col_r = consts_ref[3]
    col_g = consts_ref[4]
    col_b = consts_ref[5]
    thr = consts_ref[6]
    if cfg.lighting:
        f_re = consts_ref[7]
        ogx, ogy, ogz = consts_ref[8], consts_ref[9], consts_ref[10]
        off_u = consts_ref[11]   # OTF gradient tap offsets, voxel units,
        off_rw = consts_ref[12]  # per (sweep, row, lane) role
        off_ln = consts_ref[13]
    if cfg.brick:
        own_lo = consts_ref[8]   # owned global-z band in LOCAL u units
        own_hi = consts_ref[9]
        z_off = consts_ref[10]   # local u -> global u offset (integer-valued)

    inv_a = jnp.where(hit, 1.0 / jnp.where(hit, av, 1.0), 0.0)
    icap_f = icap.astype(jnp.float32)

    def rep(v):
        """(8,128) -> (K*8,128): one copy per step slot of a chunk."""
        return jnp.broadcast_to(v.reshape(1, 8, 128), (K, 8, 128)).reshape(KS, 128)

    x0b, xsb, y0b, ysb, u0b, avb = map(rep, (x0v, xsv, y0v, ysv, u0v, av))
    if cfg.lighting:
        wxb, wxsb, wyb, wysb, wzb, wzsb = (
            rep(rayf_ref[0, c]) for c in range(6, 12))
    hitb = rep(rayi_ref[0, 1]) != 0

    scan_mul, scan_add, scan_or, subl = _make_scans(KS)
    kofs = (subl // 8).astype(jnp.float32)  # step offset within chunk

    def slab_ranges(s):
        """Widened per-ray step interval [lo, hi) owned by slice pair s."""
        sf = jnp.float32(s)
        t1 = (sf - u0v) * inv_a
        t2 = (sf + 1.0 - u0v) * inv_a
        if cfg.ascending:
            lo = jnp.ceil(t1)
            hi = jnp.ceil(t2)
            first, last = s == 0, s == S - 1
        else:
            lo = jnp.floor(t2) + 1.0
            hi = jnp.floor(t1) + 1.0
            first, last = s == S - 1, s == 0
        lo = jnp.where(first, 0.0, lo) - 1.0  # +-1: FP-boundary slack; the
        hi = jnp.where(last, icap_f, hi) + 1.0  # exact owner test masks steps
        lo = jnp.clip(lo, 0.0, icap_f).astype(jnp.int32)
        hi = jnp.clip(jnp.clip(hi, -_BIG, _BIG), 0.0, icap_f).astype(jnp.int32)
        return jnp.where(hit, lo, 0), jnp.where(hit, hi, 0)

    def gather_row(wref, z, r, xm0, xm1, xhi0, xhi1, fx):
        """x-lerped window row (z, r) values at the chunk's lane indices.

        Windows are stored as 128-lane SEGMENTS (leading static index) so
        every row load is a full 128-lane row at a dynamic sublane — the
        only dynamic-load shape Mosaic accepts here (a lane-slice or an
        offset value-slice at a dynamic sublane both fail to lower).
        """
        h0 = jnp.broadcast_to(wref[0, z, r, :].reshape(1, 128), (KS, 128))
        if WC == 128:
            g0 = jnp.take_along_axis(h0, xm0, axis=-1)
            g1 = jnp.take_along_axis(h0, xm1, axis=-1)
        else:
            h1 = jnp.broadcast_to(wref[1, z, r, :].reshape(1, 128), (KS, 128))
            g0 = jnp.where(xhi0, jnp.take_along_axis(h1, xm0, axis=-1),
                           jnp.take_along_axis(h0, xm0, axis=-1))
            g1 = jnp.where(xhi1, jnp.take_along_axis(h1, xm1, axis=-1),
                           jnp.take_along_axis(h0, xm1, axis=-1))
        return g0 + fx * (g1 - g0)

    def gather_lane(wref, z, r, xl):
        """Raw window-row gather at full-window lane indices ``xl``."""
        h0 = jnp.broadcast_to(wref[0, z, r, :].reshape(1, 128), (KS, 128))
        if WC == 128:
            return jnp.take_along_axis(h0, xl, axis=-1)
        h1 = jnp.broadcast_to(wref[1, z, r, :].reshape(1, 128), (KS, 128))
        lm = jnp.bitwise_and(xl, 127)
        return jnp.where(xl >= 128, jnp.take_along_axis(h1, lm, axis=-1),
                         jnp.take_along_axis(h0, lm, axis=-1))

    def slab_body(j, carry):
        if cfg.grad_mode:
            rr, gg, bb, ww, pref, eac, fac, extra = carry
        else:
            rr, gg, bb, ww = carry
        s = j if cfg.ascending else S - 1 - j

        lo, hi = slab_ranges(s)
        live = hit & (ww <= thr) & (lo < hi)
        any_live = jnp.any(live)

        def run(carry):
            if cfg.grad_mode:
                rr, gg, bb, ww, pref, eac, fac, extra = carry
            else:
                rr, gg, bb, ww = carry
            lof = lo.astype(jnp.float32)
            hif = (hi - 1).astype(jnp.float32)

            # window plan: origin/extent precomputed in XLA from the
            # conservative (all-hitting-rays) footprint — see
            # _window_plans; five SMEM scalar reads replace the round-4
            # per-slab vector min/max + extractions
            y0w = pl.multiple_of(plan_ref[0, s, 0], 8)
            x0w = pl.multiple_of(plan_ref[0, s, 1], 128)
            n_chunks = plan_ref[0, s, 2]
            r_lo = plan_ref[0, s, 3]
            n_rows = plan_ref[0, s, 4]
            if cfg.scatter:
                nmax_s = plan_ref[0, s, 6]
                seg_lo_s = plan_ref[0, s, 8]
                n_segs_s = plan_ref[0, s, 9]
                r8_s = jnp.clip((r_lo // 8) * 8, 0, WR - cfg.rs)

            nseg = WC // 128
            copies = []
            if cfg.lighting:
                if cfg.lookup:
                    # 2-slice windows for all six roles (no OTF taps;
                    # normals come from the precomputed gradient volumes)
                    zs0 = None
                    for seg in range(nseg):
                        xs = pl.multiple_of(x0w + seg * 128, 128)
                        copies.append(pltpu.make_async_copy(
                            em_ref.at[pl.ds(s, 2), pl.ds(y0w, WR),
                                      pl.ds(xs, 128)],
                            wem.at[seg, 0:2], sems.at[seg]))
                        if not cfg.ab_aliased:
                            copies.append(pltpu.make_async_copy(
                                ab_ref.at[pl.ds(s, 2), pl.ds(y0w, WR),
                                          pl.ds(xs, 128)],
                                wab.at[seg], sems.at[2 + seg]))
                        if not cfg.re_aliased:
                            copies.append(pltpu.make_async_copy(
                                re_ref.at[pl.ds(s, 2), pl.ds(y0w, WR),
                                          pl.ds(xs, 128)],
                                wre.at[seg], sems.at[4 + seg]))
                        for gi in range(3):
                            copies.append(pltpu.make_async_copy(
                                g_refs[gi].at[pl.ds(s, 2), pl.ds(y0w, WR),
                                              pl.ds(xs, 128)],
                                wg[gi].at[seg], sems.at[6 + gi * 2 + seg]))
                else:
                    # 4-slice emission window (s-1..s+2): the sweep-axis
                    # OTF gradient taps reach one slice either side
                    zs0 = jnp.clip(s - 1, 0, D - 4)
                    for seg in range(nseg):
                        xs = pl.multiple_of(x0w + seg * 128, 128)
                        for jz in range(4):
                            copies.append(pltpu.make_async_copy(
                                em_ref.at[zs0 + jz, pl.ds(y0w, WR),
                                          pl.ds(xs, 128)],
                                wem.at[seg, jz], sems.at[seg * 4 + jz]))
                        if not cfg.ab_aliased:
                            copies.append(pltpu.make_async_copy(
                                ab_ref.at[pl.ds(s, 2), pl.ds(y0w, WR),
                                          pl.ds(xs, 128)],
                                wab.at[seg], sems.at[8 + seg]))
                        if not cfg.re_aliased:
                            copies.append(pltpu.make_async_copy(
                                re_ref.at[pl.ds(s, 2), pl.ds(y0w, WR),
                                          pl.ds(xs, 128)],
                                wre.at[seg], sems.at[10 + seg]))
            else:
                zs0 = None
                for seg in range(nseg):
                    xs = pl.multiple_of(x0w + seg * 128, 128)
                    copies.append(pltpu.make_async_copy(
                        em_ref.at[pl.ds(s, 2), pl.ds(y0w, WR), pl.ds(xs, 128)],
                        wem.at[seg], sems.at[seg]))
                    if not cfg.ab_aliased:
                        copies.append(pltpu.make_async_copy(
                            ab_ref.at[pl.ds(s, 2), pl.ds(y0w, WR), pl.ds(xs, 128)],
                            wab.at[seg], sems.at[2 + seg]))
            for cp in copies:
                cp.start()

            # per-ray chunk indexing: ray r's chunk c covers its OWN steps
            # [lo_r + c*K, lo_r + (c+1)*K) — no lockstep step counter, so a
            # tilted tile (rays entering the slab at skewed step indices)
            # costs ceil(own-range / K) chunks, not ceil(skewed-union / K).
            # n_chunks comes precomputed from the plan table (conservative
            # live set; post-termination chunks fall to the any(act) skip).
            lob = rep(lof)
            hib = rep(hif) + 1.0  # back to exclusive bound, f32

            for cp in copies:
                cp.wait()

            def chunk_body(c, c2):
                if cfg.grad_mode:
                    rr, gg, bb, ww, pref, eac, fac, extra = c2
                else:
                    rr, gg, bb, ww = c2
                kb = lob + (c * K).astype(jnp.float32) + kofs

                u = u0b + avb * kb
                zf = jnp.floor(u)
                fz = u - zf
                zi = jnp.clip(zf, -_BIG, _BIG).astype(jnp.int32)
                if cfg.brick:
                    # clamp in GLOBAL coordinates (the reference's edge
                    # clamp binds at the volume boundary, not the brick's)
                    zoi = z_off.astype(jnp.int32)
                    z0 = jnp.clip(zi + zoi, 0, cfg.d_global - 1) - zoi
                    z1 = jnp.clip(zi + 1 + zoi, 0, cfg.d_global - 1) - zoi
                else:
                    z0 = jnp.clip(zi, 0, D - 1)
                    z1 = jnp.clip(zi + 1, 0, D - 1)
                owner = jnp.clip(zi, 0, D - 2) == s
                posm = hitb & owner & (kb < hib)  # kb >= lob by construction
                if cfg.brick:
                    # composite only the owned global-z band (the brick
                    # ownership cut of parallel/bricks.py: floor((u_g +
                    # 0.5) / bd) == b, expressed in local u with the edge
                    # bricks' bounds opened to +-inf by the launcher)
                    posm = posm & (u + 0.5 >= own_lo) & (u + 0.5 < own_hi)

                y = y0b + ysb * kb
                yf = jnp.floor(y)
                fy = y - yf
                yi = jnp.clip(yf, -_BIG, _BIG).astype(jnp.int32)
                wy0 = jnp.clip(jnp.clip(yi, 0, H - 1) - y0w, 0, WR - 1)
                wy1 = jnp.clip(jnp.clip(yi + 1, 0, H - 1) - y0w, 0, WR - 1)

                x = x0b + xsb * kb
                xf = jnp.floor(x)
                fx = x - xf
                xi = jnp.clip(xf, -_BIG, _BIG).astype(jnp.int32)
                xl0 = jnp.clip(jnp.clip(xi, 0, W - 1) - x0w, 0, WC - 1)
                xl1 = jnp.clip(jnp.clip(xi + 1, 0, W - 1) - x0w, 0, WC - 1)
                if WC == 128:
                    xm0, xm1 = xl0, xl1
                    xhi0 = xhi1 = None
                else:
                    xm0 = jnp.bitwise_and(xl0, 127)
                    xm1 = jnp.bitwise_and(xl1, 127)
                    xhi0 = xl0 >= 128
                    xhi1 = xl1 >= 128

                # separable corner weights: value = sum over touched window
                # rows of (x-lerped row value) * yfac * zfac. Same corner
                # values/weights as the reference's lerp cascade (ulp-level
                # reassociation only).
                wz0 = z0 - s
                wz1 = z1 - s
                zfac = [jnp.where(wz0 == z, 1.0 - fz, 0.0)
                        + jnp.where(wz1 == z, fz, 0.0) for z in (0, 1)]
                fy1 = 1.0 - fy

                zero = jnp.zeros((KS, 128), jnp.float32)

                if cfg.lighting:
                    if cfg.lookup:
                        # ---- lookup-mode shading (reference example1_grad,
                        # volumeRender_kernel.cu:266-276): world-axis
                        # normals fetched from the three precomputed
                        # gradient volumes, same row-scan as em/ab/re ----
                        def row_body_lu(r, accs):
                            em_a, ab_a, re_a, gx_a, gy_a, gz_a = accs
                            yfac = (jnp.where(wy0 == r, fy1, 0.0)
                                    + jnp.where(wy1 == r, fy, 0.0))
                            for z in (0, 1):
                                w2 = yfac * zfac[z]
                                em_a = em_a + gather_row(
                                    wem, z, r, xm0, xm1, xhi0, xhi1, fx) * w2
                                if not cfg.ab_aliased:
                                    ab_a = ab_a + gather_row(
                                        wab, z, r, xm0, xm1,
                                        xhi0, xhi1, fx) * w2
                                if not cfg.re_aliased:
                                    re_a = re_a + gather_row(
                                        wre, z, r, xm0, xm1,
                                        xhi0, xhi1, fx) * w2
                                gx_a = gx_a + gather_row(
                                    wg[0], z, r, xm0, xm1, xhi0, xhi1, fx) * w2
                                gy_a = gy_a + gather_row(
                                    wg[1], z, r, xm0, xm1, xhi0, xhi1, fx) * w2
                                gz_a = gz_a + gather_row(
                                    wg[2], z, r, xm0, xm1, xhi0, xhi1, fx) * w2
                            return (em_a, ab_a, re_a, gx_a, gy_a, gz_a)

                        (em_s, ab_s, re_s, gxw, gyw, gzw) = jax.lax.fori_loop(
                            r_lo, n_rows, row_body_lu, (zero,) * 6)
                        if cfg.ab_aliased:
                            ab_s = em_s
                        if cfg.re_aliased:
                            re_s = em_s
                    else:
                        # ---- HG-LUT shading march step (reference
                        # volumeRender_kernel.cu:308-353, 435-493): main fetch
                        # + 6 on-the-fly central-difference taps + per-light
                        # angle triple -> illumination LUT ----
                        fy1 = 1.0 - fy

                        def tapz(uu):
                            zf_ = jnp.floor(uu)
                            fz_ = uu - zf_
                            zi_ = jnp.clip(zf_, -_BIG, _BIG).astype(jnp.int32)
                            return (jnp.clip(zi_, 0, D - 1),
                                    jnp.clip(zi_ + 1, 0, D - 1), fz_)

                        zp0, zp1, fzp = tapz(u + off_u)
                        zq0, zq1, fzq = tapz(u - off_u)

                        def tapy(yy):
                            yf_ = jnp.floor(yy)
                            fy_ = yy - yf_
                            yi_ = jnp.clip(yf_, -_BIG, _BIG).astype(jnp.int32)
                            r0 = jnp.clip(jnp.clip(yi_, 0, H - 1) - y0w, 0, WR - 1)
                            r1 = jnp.clip(jnp.clip(yi_ + 1, 0, H - 1) - y0w,
                                          0, WR - 1)
                            return r0, r1, fy_, yi_

                        wyp0, wyp1, fyp, yip = tapy(y + off_rw)
                        wym0, wym1, fym, yim = tapy(y - off_rw)

                        def tapx(xx):
                            xf_ = jnp.floor(xx)
                            fx_ = xx - xf_
                            xi_ = jnp.clip(xf_, -_BIG, _BIG).astype(jnp.int32)
                            return xi_ - xi, fx_  # corner shift vs main: 0/+-1

                        dxp, fxp = tapx(x + off_ln)
                        dxm, fxm = tapx(x - off_ln)
                        dxp0 = dxp == 0
                        dxm0 = dxm == 0

                        xlc = [jnp.clip(jnp.clip(xi + m, 0, W - 1) - x0w,
                                        0, WC - 1) for m in (-1, 0, 1, 2)]

                        def row_body_lit(r, accs):
                            (em_a, ab_a, re_a, txp, txm, typ, tym,
                             tzp, tzm) = accs
                            yfac = (jnp.where(wy0 == r, fy1, 0.0)
                                    + jnp.where(wy1 == r, fy, 0.0))
                            yfp = (jnp.where(wyp0 == r, 1.0 - fyp, 0.0)
                                   + jnp.where(wyp1 == r, fyp, 0.0))
                            yfm = (jnp.where(wym0 == r, 1.0 - fym, 0.0)
                                   + jnp.where(wym1 == r, fym, 0.0))
                            for jz in range(4):
                                zab = zs0 + jz
                                zfj = (jnp.where(z0 == zab, 1.0 - fz, 0.0)
                                       + jnp.where(z1 == zab, fz, 0.0))
                                zfpj = (jnp.where(zp0 == zab, 1.0 - fzp, 0.0)
                                        + jnp.where(zp1 == zab, fzp, 0.0))
                                zfqj = (jnp.where(zq0 == zab, 1.0 - fzq, 0.0)
                                        + jnp.where(zq1 == zab, fzq, 0.0))
                                c = [gather_lane(wem, jz, r, xl) for xl in xlc]
                                xv = c[1] + fx * (c[2] - c[1])
                                xvp = jnp.where(dxp0,
                                                c[1] + fxp * (c[2] - c[1]),
                                                c[2] + fxp * (c[3] - c[2]))
                                xvm = jnp.where(dxm0,
                                                c[1] + fxm * (c[2] - c[1]),
                                                c[0] + fxm * (c[1] - c[0]))
                                em_a = em_a + xv * yfac * zfj
                                txp = txp + xvp * yfac * zfj
                                txm = txm + xvm * yfac * zfj
                                typ = typ + xv * yfp * zfj
                                tym = tym + xv * yfm * zfj
                                tzp = tzp + xv * yfac * zfpj
                                tzm = tzm + xv * yfac * zfqj
                            for z in (0, 1):
                                w2 = yfac * zfac[z]
                                if not cfg.ab_aliased:
                                    ab_a = ab_a + gather_row(
                                        wab, z, r, xm0, xm1, xhi0, xhi1, fx) * w2
                                if not cfg.re_aliased:
                                    re_a = re_a + gather_row(
                                        wre, z, r, xm0, xm1, xhi0, xhi1, fx) * w2
                            return (em_a, ab_a, re_a, txp, txm, typ, tym,
                                    tzp, tzm)

                        (em_s, ab_s, re_s, t_xp, t_xm, t_yp, t_ym, t_zp,
                         t_zm) = jax.lax.fori_loop(
                            r_lo, n_rows, row_body_lit, (zero,) * 9)
                        if cfg.ab_aliased:
                            ab_s = em_s
                        if cfg.re_aliased:
                            re_s = em_s


                        # world-axis gradient from the (sweep, row, lane) tap
                        # pairs (roles depend on the sweep axis)
                        diffs = {0: (t_zp - t_zm) * 0.5,
                                 1: (t_yp - t_ym) * 0.5,
                                 2: (t_xp - t_xm) * 0.5}
                        roles = _AXIS_SETUP[cfg.axis][1]
                        comp = {roles[i]: diffs[i] for i in range(3)}
                        gxw, gyw, gzw = comp["x"], comp["y"], comp["z"]
                    alpha = 1.0 - jnp.exp(-(fab * ab_s) * tstep)
                    aq = jnp.where(posm, alpha, 0.0)
                    p_incl = scan_mul(1.0 - aq)
                    p_excl = jnp.where(subl >= 8,
                                       pltpu.roll(p_incl, 8, axis=0), 1.0)
                    w_before = 1.0 - (1.0 - rep(ww)) * p_excl
                    over = jnp.where(w_before > thr, jnp.int32(1),
                                     jnp.int32(0))
                    act = posm & (scan_or(over) == 0)
                    t_k = (1.0 - rep(ww)) * p_excl
                    g2 = gxw * gxw + gyw * gyw + gzw * gzw
                    inv_len = jnp.where(
                        g2 > _GRAD_EPS2,
                        jax.lax.rsqrt(jnp.where(g2 > _GRAD_EPS2, g2, 1.0)),
                        0.0)
                    nx = gxw * (-inv_len)
                    ny = gyw * (-inv_len)
                    nz = gzw * (-inv_len)

                    pxw = wxb + wxsb * kb
                    pyw = wyb + wysb * kb
                    pzw = wzb + wzsb * kb
                    lix = ogx - pxw
                    liy = ogy - pyw
                    liz = ogz - pzw
                    dot_li_n = lix * nx + liy * ny + liz * nz
                    lipx = lix - dot_li_n * nx
                    lipy = liy - dot_li_n * ny
                    lipz = liz - dot_li_n * nz
                    reflection = f_re * re_s

                    inv_pi = jnp.float32(1.0 / _PI)
                    em_term = fem * em_s * tstep
                    ta = t_k * alpha
                    grad = cfg.grad_mode  # OTF only: the launcher routes
                    # lookup-mode gradient scenes to the replay fallback
                    shade_r = zero
                    shade_g = zero
                    shade_b = zero
                    if grad:
                        lsum = zero      # sum_il lutv * (g . wlc_il)
                        p_chans = []     # per (il, c): ta g_c f_re re lut
                        dn_x = dn_y = dn_z = zero
                    for il in range(cfg.n_lights):
                        base = 14 + 6 * il
                        lox = consts_ref[base] - pxw
                        loy = consts_ref[base + 1] - pyw
                        loz = consts_ref[base + 2] - pzw
                        aang = _vangle(nx, ny, nz, lix, liy, liz) * inv_pi
                        bang = _vangle(nx, ny, nz, lox, loy, loz) * inv_pi
                        dot_lo_n = lox * nx + loy * ny + loz * nz
                        lopx = lox - dot_lo_n * nx
                        lopy = loy - dot_lo_n * ny
                        lopz = loz - dot_lo_n * nz
                        gang = _vangle(lipx, lipy, lipz,
                                       lopx, lopy, lopz) * inv_pi
                        if grad and cfg.scatter:
                            lutv, d_la, d_lb, d_lg = _lut_fetch(
                                cfg, lut_ref, act, aang, bang, gang,
                                with_grad=True)
                        else:
                            lutv = _lut_fetch(cfg, lut_ref, act,
                                              aang, bang, gang)
                        contrib = reflection * lutv
                        shade_r = shade_r + contrib * consts_ref[base + 3]
                        shade_g = shade_g + contrib * consts_ref[base + 4]
                        shade_b = shade_b + contrib * consts_ref[base + 5]
                        if grad:
                            # g . wlc_il — the per-ray upstream weight of
                            # this light's contribution
                            gwl = (gRb * consts_ref[base + 3]
                                   + gGb * consts_ref[base + 4]
                                   + gBb * consts_ref[base + 5])
                            lsum = lsum + lutv * gwl
                            frr = jnp.where(act, ta * f_re * re_s, 0.0)
                            p_chans += [frr * gRb * lutv,
                                        frr * gGb * lutv,
                                        frr * gBb * lutv]
                        if grad and cfg.scatter:
                            # shading-chain cotangents: d lut -> d angles
                            # -> d normal (the projections' VJPs pull the
                            # gang path back to n as well)
                            dlut = jnp.where(act, ta * f_re * re_s * gwl,
                                             0.0)
                            dax, day, daz, _, _, _ = _vangle_bwd(
                                nx, ny, nz, lix, liy, liz,
                                dlut * d_la * inv_pi)
                            dbx, dby, dbz, _, _, _ = _vangle_bwd(
                                nx, ny, nz, lox, loy, loz,
                                dlut * d_lb * inv_pi)
                            ux, uy, uz, vx, vy, vz = _vangle_bwd(
                                lipx, lipy, lipz, lopx, lopy, lopz,
                                dlut * d_lg * inv_pi)
                            # lip = li - (li.n) n  =>  dn -= (u.n) li +
                            # (li.n) u (and symmetrically for lop)
                            un = ux * nx + uy * ny + uz * nz
                            vn = vx * nx + vy * ny + vz * nz
                            dn_x = (dn_x + dax + dbx
                                    - un * lix - dot_li_n * ux
                                    - vn * lox - dot_lo_n * vx)
                            dn_y = (dn_y + day + dby
                                    - un * liy - dot_li_n * uy
                                    - vn * loy - dot_lo_n * vy)
                            dn_z = (dn_z + daz + dbz
                                    - un * liz - dot_li_n * uz
                                    - vn * loz - dot_lo_n * vz)

                    cr = jnp.where(act, ta * (em_term * col_r + shade_r), 0.0)
                    cg = jnp.where(act, ta * (em_term * col_g + shade_g), 0.0)
                    cb = jnp.where(act, ta * (em_term * col_b + shade_b), 0.0)
                    rr = rr + scan_add(cr)[KS - 8:KS, :]
                    gg = gg + scan_add(cg)[KS - 8:KS, :]
                    bb = bb + scan_add(cb)[KS - 8:KS, :]

                    aq2 = jnp.where(act, alpha, 0.0)
                    p_full = scan_mul(1.0 - aq2)[KS - 8:KS, :]
                    new_ww = 1.0 - (1.0 - ww) * p_full
                    if not grad:
                        return (rr, gg, bb, new_ww)

                    # ---- lit replay: transfer/light gradients + scatter
                    # (formulas: docs/pallas_backward_design.md with the
                    # unlit source em' (g.col) generalized to sdot = g .
                    # (em' col + shade); reference volumeRender_kernel.cu:
                    # 308-353 is the chain being adjoint-ed) ----
                    sdot = (em_term * gcolb + gRb * shade_r
                            + gGb * shade_g + gBb * shade_b)
                    contrib_g = jnp.where(act, ta * sdot, 0.0)
                    cg_scan = scan_add(contrib_g)
                    pref_incl = rep(pref) + cg_scan
                    e_chunk = scan_add(
                        jnp.where(act, ta * em_s, 0.0))[KS - 8:KS, :]
                    fab_term = jnp.where(
                        act,
                        ab_s * tstep * (sdot * t_k * (1.0 - alpha)
                                        - (totb - pref_incl)),
                        0.0)
                    f_chunk = scan_add(fab_term)[KS - 8:KS, :]
                    pref = pref + cg_scan[KS - 8:KS, :]
                    rac = extra[0] + scan_add(
                        jnp.where(act, ta * re_s * lsum, 0.0))[KS - 8:KS, :]
                    pch = tuple(
                        extra[1 + i] + scan_add(p_chans[i])[KS - 8:KS, :]
                        for i in range(3 * cfg.n_lights))
                    extra_new = (rac,) + pch

                    if cfg.scatter:
                        # normal -> world-gradient vector: n = -g/|g|
                        dng = dn_x * gxw + dn_y * gyw + dn_z * gzw
                        il3 = inv_len * inv_len * inv_len
                        dgx = (-inv_len) * dn_x + dng * il3 * gxw
                        dgy = (-inv_len) * dn_y + dng * il3 * gyw
                        dgz = (-inv_len) * dn_z + dng * il3 * gzw
                        dcomp = {"x": dgx, "y": dgy, "z": dgz}
                        rolesv = _AXIS_SETUP[cfg.axis][1]
                        dsw = 0.5 * dcomp[rolesv[0]]
                        drw = 0.5 * dcomp[rolesv[1]]
                        dlw = 0.5 * dcomp[rolesv[2]]

                        dv_em = jnp.where(
                            act, ta * (fem * tstep) * gcolb, 0.0)
                        dv_ab = jnp.where(
                            act,
                            (fab * tstep) * (sdot * t_k * (1.0 - alpha)
                                             - (totb - pref_incl)),
                            0.0)
                        dv_re = jnp.where(act, ta * f_re * lsum, 0.0)
                        if os.environ.get("VRT_LIT_DBG") == "dsw":
                            # debug: carry the sweep-tap cotangent on the
                            # (verified-correct) reflection-grid path
                            dv_re = dsw
                        elif os.environ.get("VRT_LIT_DBG") == "dlw":
                            dv_re = dlw
                        elif os.environ.get("VRT_LIT_DBG") == "drw":
                            dv_re = drw
                        dv_all = dv_em
                        if cfg.ab_aliased:
                            dv_all = dv_all + dv_ab
                        if cfg.re_aliased:
                            dv_all = dv_all + dv_re

                        # hat frac rows, volume-edge-clamp zeroed
                        fry = jnp.where((yi < 0) | (yi >= H - 1), 0.0, fy)
                        frx = jnp.where((xi < 0) | (xi >= W - 1), 0.0, fx)
                        fryp = jnp.where((yip < 0) | (yip >= H - 1),
                                         0.0, fyp)
                        frym = jnp.where((yim < 0) | (yim >= H - 1),
                                         0.0, fym)
                        xip = xi + dxp
                        xim = xi + dxm
                        xp0 = jnp.clip(jnp.clip(xip, 0, W - 1) - x0w,
                                       0, WC - 1)
                        xm0_t = jnp.clip(jnp.clip(xim, 0, W - 1) - x0w,
                                         0, WC - 1)
                        frxp = jnp.where((xip < 0) | (xip >= W - 1),
                                         0.0, fxp)
                        frxm = jnp.where((xim < 0) | (xim >= W - 1),
                                         0.0, fxm)

                        # 4-slice z weights (emission window zs0..zs0+3)
                        zf4 = [jnp.where(z0 == zs0 + j, 1.0 - fz, 0.0)
                               + jnp.where(z1 == zs0 + j, fz, 0.0)
                               for j in range(4)]
                        zp4 = [jnp.where(zp0 == zs0 + j, 1.0 - fzp, 0.0)
                               + jnp.where(zp1 == zs0 + j, fzp, 0.0)
                               for j in range(4)]
                        zq4 = [jnp.where(zq0 == zs0 + j, 1.0 - fzq, 0.0)
                               + jnp.where(zq1 == zs0 + j, fzq, 0.0)
                               for j in range(4)]

                        def do_scatter(_):
                            sarr[0] = wy0.astype(jnp.float32)
                            sarr[1] = fry
                            sarr[2] = wyp0.astype(jnp.float32)
                            sarr[3] = fryp
                            sarr[4] = wym0.astype(jnp.float32)
                            sarr[5] = frym
                            sarr[6] = xl0.astype(jnp.float32)
                            sarr[7] = frx
                            sarr[8] = xp0.astype(jnp.float32)
                            sarr[9] = frxp
                            sarr[10] = xm0_t.astype(jnp.float32)
                            sarr[11] = frxm
                            for j in range(4):
                                sarr[12 + j] = (dv_all * zf4[j]
                                                + dsw * zp4[j]
                                                - dsw * zq4[j])
                                sarr[16 + j] = drw * zf4[j]
                                sarr[20 + j] = -drw * zf4[j]
                                sarr[24 + j] = dlw * zf4[j]
                                sarr[28 + j] = -dlw * zf4[j]
                            # spec dv indices are RELATIVE to the coord
                            # rows (dv0 = 12): sarr row = 12 + rel
                            nb = 4
                            main_blocks = [
                                (j, ((0, j), (1, 4 + j),
                                     (2, 8 + j))) for j in range(4)]
                            kdv = 32
                            if not cfg.ab_aliased:
                                for z in (0, 1):
                                    sarr[kdv + z] = dv_ab * zfac[z]
                                    main_blocks.append(
                                        (nb + z, ((0, kdv - 12 + z),)))
                                nb += 2
                                kdv += 2
                            if not cfg.re_aliased:
                                for z in (0, 1):
                                    sarr[kdv + z] = dv_re * zfac[z]
                                    main_blocks.append(
                                        (nb + z, ((0, kdv - 12 + z),)))
                                nb += 2
                            spec = (
                                (0, tuple(main_blocks)),
                                (1, tuple((j, ((0, 12 + j),))
                                          for j in range(4))),
                                (2, tuple((j, ((0, 16 + j),))
                                          for j in range(4))),
                            )
                            _scatter_chunk(cfg, sarr, gwin, spec, 3, 3,
                                           r8_s, seg_lo_s, n_segs_s)
                            return 0

                        jax.lax.cond(jnp.any(act), do_scatter,
                                     lambda _: 0, 0)

                    return (rr, gg, bb, new_ww, pref, eac + e_chunk,
                            fac + f_chunk, extra_new)

                def row_body(r, accs):
                    em_acc, ab_acc = accs
                    yfac = (jnp.where(wy0 == r, fy1, 0.0)
                            + jnp.where(wy1 == r, fy, 0.0))
                    for z in (0, 1):
                        w2 = yfac * zfac[z]
                        xv = gather_row(wem, z, r, xm0, xm1, xhi0, xhi1, fx)
                        em_acc = em_acc + xv * w2
                        if not cfg.ab_aliased:
                            xa = gather_row(wab, z, r, xm0, xm1, xhi0, xhi1, fx)
                            ab_acc = ab_acc + xa * w2
                    return (em_acc, ab_acc)

                em_s, ab_s = jax.lax.fori_loop(
                    r_lo, n_rows, row_body, (zero, zero))
                if cfg.ab_aliased:
                    ab_s = em_s

                # front-to-back compositing as a prefix scan over the chunk
                alpha = 1.0 - jnp.exp(-(fab * ab_s) * tstep)
                aq = jnp.where(posm, alpha, 0.0)
                p_incl = scan_mul(1.0 - aq)
                p_excl = jnp.where(subl >= 8, pltpu.roll(p_incl, 8, axis=0), 1.0)
                w_before = 1.0 - (1.0 - rep(ww)) * p_excl
                over = jnp.where(w_before > thr, jnp.int32(1), jnp.int32(0))
                act = posm & (scan_or(over) == 0)

                t_k = (1.0 - rep(ww)) * p_excl
                contrib = jnp.where(act, t_k * alpha * (fem * em_s * tstep), 0.0)
                csum = scan_add(contrib)[KS - 8:KS, :]

                aq2 = jnp.where(act, alpha, 0.0)
                p_full = scan_mul(1.0 - aq2)[KS - 8:KS, :]

                rr = rr + csum * col_r
                gg = gg + csum * col_g
                bb = bb + csum * col_b
                new_ww = 1.0 - (1.0 - ww) * p_full
                if not cfg.grad_mode:
                    return (rr, gg, bb, new_ww)

                # transfer-parameter gradient pieces (per-ray reductions;
                # formulas in docs/pallas_backward_design.md):
                #   prefix_k (incl) = sum_{j<=k} T_j (g . s_j)
                #   E   = sum T alpha em           -> d_fem, d_color
                #   Fab = sum ab dt [gcol em' T (1-alpha) - (tot - prefix_k)]
                em_term = fem * em_s * tstep
                contrib_g = jnp.where(act, t_k * alpha * em_term * gcolb, 0.0)
                cg_scan = scan_add(contrib_g)
                pref_incl = rep(pref) + cg_scan
                e_chunk = scan_add(
                    jnp.where(act, t_k * alpha * em_s, 0.0))[KS - 8:KS, :]
                fab_term = jnp.where(
                    act,
                    ab_s * tstep * (gcolb * em_term * t_k * (1.0 - alpha)
                                    - (totb - pref_incl)),
                    0.0)
                f_chunk = scan_add(fab_term)[KS - 8:KS, :]
                pref = pref + cg_scan[KS - 8:KS, :]

                if cfg.scatter:
                    # per-tap cotangents (docs/pallas_backward_design.md):
                    # d(em tap) = T alpha f_em dt (g.col); d(ab tap) =
                    # f_ab dt [(1-alpha) T em' (g.col) - (tot - prefix)]
                    dv_em = jnp.where(
                        act, t_k * alpha * (fem * tstep) * gcolb, 0.0)
                    dv_ab = jnp.where(
                        act,
                        (fab * tstep) * (gcolb * em_term * t_k * (1.0 - alpha)
                                         - (totb - pref_incl)),
                        0.0)
                    if cfg.ab_aliased:
                        # same grid, same corner weights: one combined scatter
                        dv_em = dv_em + dv_ab

                    # hat coordinates: the forward's fully-clamped
                    # integer corner (wy0/xl0, exact) + an exact frac,
                    # zeroed where the volume-edge clamp collapsed both
                    # corners onto one voxel (then the hat sends weight
                    # 1 to the edge voxel, matching the forward's
                    # wy0==wy1 double-corner sum)
                    fry = jnp.where((yi < 0) | (yi >= H - 1), 0.0, fy)
                    frx = jnp.where((xi < 0) | (xi >= W - 1), 0.0, fx)
                    nblk = 2 if cfg.ab_aliased else 4

                    def do_scatter(_):
                        sarr[0] = wy0.astype(jnp.float32)
                        sarr[1] = fry
                        sarr[2] = xl0.astype(jnp.float32)
                        sarr[3] = frx
                        sarr[4] = dv_em * zfac[0]
                        sarr[5] = dv_em * zfac[1]
                        if not cfg.ab_aliased:
                            sarr[6] = dv_ab * zfac[0]
                            sarr[7] = dv_ab * zfac[1]
                        spec = ((0, tuple((b, ((0, b),))
                                          for b in range(nblk))),)
                        _scatter_chunk(cfg, sarr, gwin, spec, 1, 1,
                                       r8_s, seg_lo_s, n_segs_s)
                        return 0

                    # post-termination chunks carry zero cotangents: skip
                    # the whole hat/matmul cascade
                    jax.lax.cond(jnp.any(act), do_scatter, lambda _: 0, 0)
                return (rr, gg, bb, new_ww, pref, eac + e_chunk,
                        fac + f_chunk, extra)

            if cfg.scatter:
                gwin[...] = jnp.zeros_like(gwin)
            if cfg.grad_mode:
                rr, gg, bb, ww, pref, eac, fac, extra = jax.lax.fori_loop(
                    0, n_chunks, chunk_body,
                    (rr, gg, bb, ww, pref, eac, fac, extra))
                if cfg.scatter:
                    _rmw_grad_windows(cfg, s, y0w, x0w, gwin,
                                      gem_ref, gab_ref, rmw, rsem,
                                      gre_ref=gre_ref,
                                      zs0=(zs0 if cfg.lighting else None))
                return (rr, gg, bb, ww, pref, eac, fac, extra)
            rr, gg, bb, ww = jax.lax.fori_loop(
                0, n_chunks, chunk_body, (rr, gg, bb, ww))
            return (rr, gg, bb, ww)

        carry = ((rr, gg, bb, ww, pref, eac, fac, extra) if cfg.grad_mode
                 else (rr, gg, bb, ww))
        return jax.lax.cond(any_live, run, lambda c: c, carry)

    zero = jnp.zeros((8, 128), jnp.float32)
    if cfg.grad_mode:
        # brick grad replay seeds from the relay: gt = [gcol, tot,
        # entry opacity, upstream prefix-dot] (parallel/bricks.py)
        ww0 = gt_ref[0, 2] if cfg.brick else zero
        pref0 = gt_ref[0, 3] if cfg.brick else zero
        n_extra = (1 + 3 * cfg.n_lights) if cfg.lighting else 0
        rr, gg, bb, ww, pref, eac, fac, extra = jax.lax.fori_loop(
            0, S, slab_body,
            (zero, zero, zero, ww0, pref0, zero, zero,
             (zero,) * n_extra))
        out_ref[0, 4] = eac
        out_ref[0, 5] = fac
        for ei in range(n_extra):
            out_ref[0, 6 + ei] = extra[ei]
    else:
        ww0 = gt_ref[0, 0] if cfg.brick else zero  # relay entry opacity
        rr, gg, bb, ww = jax.lax.fori_loop(
            0, S, slab_body, (zero, zero, zero, ww0))
    out_ref[0, 0] = rr
    out_ref[0, 1] = gg
    out_ref[0, 2] = bb
    out_ref[0, 3] = ww


# ---------------------------------------------------------------------------
# launcher
# ---------------------------------------------------------------------------


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


# (sweep axis -> array permutation, (sweep, row, lane) coordinate roles)
# volume arrays are (D, H, W) == (z, y, x); coordinate components are x/y/z
_AXIS_SETUP = {
    "z": ((0, 1, 2), ("z", "y", "x")),
    "y": ((1, 0, 2), ("y", "z", "x")),
    "x": ((2, 0, 1), ("x", "z", "y")),
}


def _tile_image(arr_2d: jnp.ndarray) -> jnp.ndarray:
    """(Hp, Wp) -> (n_tiles, 8, 128), TILE x TILE blocks in row-major order."""
    hp, wp = arr_2d.shape
    t = arr_2d.reshape(hp // TILE, TILE, wp // TILE, TILE)
    t = t.transpose(0, 2, 1, 3).reshape(-1, TILE * TILE)
    return t.reshape(t.shape[0], 8, 128)


def _untile_image(tiles: jnp.ndarray, hp: int, wp: int) -> jnp.ndarray:
    """(n_tiles, 8, 128) -> (Hp, Wp)."""
    t = tiles.reshape(hp // TILE, wp // TILE, TILE, TILE)
    return t.transpose(0, 2, 1, 3).reshape(hp, wp)


def _launch(scene: Scene, opts: RenderOptions, camera_x_offset,
            axis: str, ascending: bool, wr: int, interpret: bool,
            grad_inputs=None, scatter: bool = False, band=None,
            brick=None, rs: int = 0):
    """Shared setup + kernel launch (forward / grad-replay / full backward).

    grad_inputs=None: forward; returns (image, ovf_any, dir_ok).
    grad_inputs=(g_img, out_img): replay with transfer-parameter gradient
    accumulation; returns (d_fem, d_fab, d_color, ovf_any, dir_ok).
    scatter=True (with grad_inputs): additionally scatter per-tap
    cotangents into voxel-grid gradient buffers in-kernel; returns
    (d_em_grid, d_ab_grid_or_None, d_fem, d_fab, d_color, ovf_any,
    dir_ok). The adjoint of the CUDA march (reference
    volumeRender_kernel.cu:365-507) at kernel speed.
    band=(y0, n_rows): render only image rows [y0, y0+n_rows) — the
    rays-DP shard unit (y0 may be traced, e.g. axis_index * n_rows from
    inside shard_map; n_rows must be static and TILE-aligned). Band-mode
    grad_inputs are band-sized; the returned image keeps all n_rows
    (pad rows render as misses). Forward-band returns shape
    (n_rows, W, 3).
    brick=(d_global, z_off, own_lo, own_hi, ww0): z-brick segment march
    for the two-phase transmittance relay (parallel/bricks.py): the
    scene's volumes are ONE halo-padded local brick, the sweep affine is
    scaled by the global extent and offset by z_off (traced), samples
    composite only where local u + 0.5 is in [own_lo, own_hi), and the
    march seeds from the entry-opacity image ww0 ((H, W), or None for
    phase 1). Returns (image, exit_opacity_image, ovf_any, dir_ok).
    Forward lighting-off only; requires axis == "z".
    """
    perm, roles = _AXIS_SETUP[axis]
    lighting = scene.has_lighting

    em = jnp.transpose(scene.emission.data, perm)
    ab = None
    if not scene.absorption_aliased:
        ab = jnp.transpose(scene.absorption.data, perm)
    re = None
    if lighting and not scene.reflection_aliased:
        re = jnp.transpose(scene.reflection.data, perm)
    lookup = lighting and scene.has_gradient_volumes
    gvols = []
    if lookup:
        gvols = [jnp.transpose(v.data, perm) for v in
                 (scene.gradient_x, scene.gradient_y, scene.gradient_z)]

    D, H, W = em.shape
    HP, WP = _round_up(H, 8), _round_up(W, 128)
    WC = 256 if WP > 256 else WP
    WR = min(wr, HP)
    # Scatter A-block rows: default = the FULL window. Measured (round
    # 5, plan statistics at 64^3-512^3): slab row footprints fill the
    # window almost everywhere (n_rows p99 = WR) because tilted rays'
    # per-slab step ranges reach ~3 chunks and drag the row extent, so
    # a half-window block just triggers the overflow ladder (TWO full
    # kernel launches) and loses.
    RS = min(rs if rs > 0 else WR, WR)
    KCH = int(os.environ.get("VRT_K_SCATTER", "8")) if scatter else _K
    if em.shape != (D, HP, WP):
        em = jnp.pad(em, ((0, 0), (0, HP - H), (0, WP - W)))
        if ab is not None:
            ab = jnp.pad(ab, ((0, 0), (0, HP - H), (0, WP - W)))
        if re is not None:
            re = jnp.pad(re, ((0, 0), (0, HP - H), (0, WP - W)))
        gvols = [jnp.pad(g_, ((0, 0), (0, HP - H), (0, WP - W)))
                 for g_ in gvols]

    # ---- rays over the TILE-padded image (or one rays-DP band) ----
    w_img, h_img = opts.width, opts.height
    wp_img = _round_up(w_img, TILE)
    if band is None:
        hp_img = _round_up(h_img, TILE)
        y_base = 0
    else:
        y_base, hp_img = band
        assert hp_img % TILE == 0
    py, px = jnp.mgrid[0:hp_img, 0:wp_img]
    px = _tile_image(px.astype(jnp.int32))
    py = _tile_image(py.astype(jnp.int32)) + jnp.int32(y_base)
    in_image = (px < w_img) & (py < h_img)

    x_vec, y_vec, z_vec = scene.camera.basis()
    focal = jnp.float32(scene.camera.focal_length)
    dist = jnp.float32(scene.camera.distance_to_object)
    cam_off = jnp.float32(camera_x_offset)

    origin, direction = generate_rays(
        w_img, h_img, x_vec, y_vec, z_vec, cam_off, focal, dist, px, py)
    bm = F3(*(jnp.float32(v) for v in opts.boxmin))
    bx = F3(*(jnp.float32(v) for v in opts.boxmax))
    hit, tnear, tfar = intersect_box(origin, direction, bm, bx)
    tnear = jnp.maximum(tnear, 0.0)
    tnear = jnp.where(hit, tnear, 0.0)
    tfar = jnp.where(hit, tfar, -1.0)
    hit = hit & in_image

    tstep = jnp.float32(opts.tstep)
    pos0 = F3(
        jnp.broadcast_to(origin.x, px.shape) + direction.x * tnear,
        jnp.broadcast_to(origin.y, px.shape) + direction.y * tnear,
        jnp.broadcast_to(origin.z, px.shape) + direction.z * tnear,
    )
    step = direction * tstep

    # voxel-coordinate affines (coord = base + step_index * slope)
    span = {
        "x": (bm.x, jnp.float32(opts.boxmax[0] - opts.boxmin[0])),
        "y": (bm.y, jnp.float32(opts.boxmax[1] - opts.boxmin[1])),
        "z": (bm.z, jnp.float32(opts.boxmax[2] - opts.boxmin[2])),
    }
    n_of_role = {roles[0]: D, roles[1]: H, roles[2]: W}
    if brick is not None:
        # the sweep affine maps to GLOBAL voxel coords (the brick is a
        # window of the global volume), then shifts into local indices
        n_of_role[roles[0]] = brick[0]

    def affine(comp: str):
        n = jnp.float32(n_of_role[comp])
        lo, ext = span[comp]
        scale = n / ext
        p0 = getattr(pos0, comp)
        st = getattr(step, comp)
        return (p0 - lo) * scale - 0.5, st * scale

    u0v, av = affine(roles[0])
    y0v, ysv = affine(roles[1])
    x0v, xsv = affine(roles[2])
    if brick is not None:
        u0v = u0v - brick[1]

    nf = jnp.floor((tfar - tnear) / tstep) + 1.0
    icap = jnp.clip(nf, 1.0, jnp.float32(opts.n_steps)).astype(jnp.int32)
    icap = jnp.where(hit, icap, 0)

    sgn = 1.0 if ascending else -1.0
    dir_ok = jnp.all(~hit | (av * sgn >= _A_MIN))

    ray_ch = [x0v, xsv, y0v, ysv, u0v, av]
    if lighting:
        shp = px.shape
        ray_ch += [jnp.broadcast_to(v, shp) for v in
                   (pos0.x, step.x, pos0.y, step.y, pos0.z, step.z)]
    rayf = jnp.stack(ray_ch, axis=1)  # (n_tiles, 6 or 12, 8, 128)
    rayi = jnp.stack([icap, hit.astype(jnp.int32)], axis=1)

    s = scene.settings
    const_list = [
        tstep, s.factor_emission, s.factor_absorption,
        s.color[0], s.color[1], s.color[2], s.opacity_threshold,
        jnp.float32(0),
    ]
    n_lights = 0
    lut2 = None
    lut_l = lut_segs = 0
    if lighting:
        # tap offsets (voxel units) per (sweep, row, lane) role: world
        # gradient_step scaled by each role's voxels-per-world-unit
        gs_world = {"x": opts.gradient_step[0], "y": opts.gradient_step[1],
                    "z": opts.gradient_step[2]}
        offs = []
        for comp in roles:
            lo_, e_ = span[comp]
            offs.append(jnp.float32(gs_world[comp]) * n_of_role[comp] / e_)
        wlc = scene.light_colors * scene.settings.color[None, :]
        n_lights = int(scene.light_positions.shape[0])
        const_list[7] = s.factor_reflection
        const_list += [origin.x, origin.y, origin.z, *offs]
        for il in range(n_lights):
            const_list += [scene.light_positions[il, 0],
                           scene.light_positions[il, 1],
                           scene.light_positions[il, 2],
                           wlc[il, 0], wlc[il, 1], wlc[il, 2]]

        # illumination LUT packed as (L * SEGS, 128): row b*SEGS+seg holds
        # lanes of slice b's (g, a)-flattened plane (see _lut_fetch)
        lut = scene.illumination
        lut_l = int(lut.shape[0])
        lut_segs = max(1, -(-(lut_l * lut_l) // 128))
        lutT = jnp.transpose(lut, (1, 0, 2)).reshape(lut_l, lut_l * lut_l)
        pad_l = lut_segs * 128 - lut_l * lut_l
        if pad_l:
            lutT = jnp.pad(lutT, ((0, 0), (0, pad_l)))
        lut2 = lutT.reshape(lut_l * lut_segs, 128)
    if brick is not None:
        const_list += [jnp.float32(brick[2]), jnp.float32(brick[3]),
                       jnp.float32(brick[1])]
    consts = jnp.stack(const_list)

    n_tiles = rayf.shape[0]
    # per-(tile, slab) window plans, precomputed in XLA (see _window_plans)
    plans, ovf_any, scat_ovf_any = _window_plans(
        D - 1, ascending, H, W, HP, WP, WR, WC, RS, KCH,
        x0v, xsv, y0v, ysv, u0v, av, icap, hit,
        margin_y=(offs[1] if lighting else None),
        margin_x=(offs[2] if lighting else None))
    if scatter:
        # the scatter's RS-row A-blocks have a stricter footprint bound
        ovf_any = ovf_any | scat_ovf_any
    grad_mode = grad_inputs is not None
    cfg = _KCfg(d=D, h=H, w=W, hp=HP, wp=WP, wr=WR, wc=WC, rs=RS, k=KCH,
                ascending=ascending, ab_aliased=scene.absorption_aliased,
                n_steps=opts.n_steps, grad_mode=grad_mode, scatter=scatter,
                lighting=lighting, n_lights=n_lights, lut_l=lut_l,
                lut_segs=lut_segs,
                re_aliased=(scene.reflection_aliased if lighting else True),
                axis=axis, lookup=lookup, brick=brick is not None,
                d_global=(int(brick[0]) if brick is not None else 0))

    if grad_mode:
        g_img, out_img = grad_inputs
        colv = scene.settings.color

        def pad_tile(a2d):
            a = jnp.zeros((hp_img, wp_img), jnp.float32)
            a = a.at[:a2d.shape[0], :w_img].set(a2d)
            return _tile_image(a)

        gcol_t = pad_tile(g_img[..., 0] * colv[0] + g_img[..., 1] * colv[1]
                          + g_img[..., 2] * colv[2])
        tot_t = pad_tile(jnp.sum(g_img * out_img, axis=-1))
        if brick is not None:
            gt = jnp.stack([gcol_t, tot_t, pad_tile(brick[4]),
                            pad_tile(brick[5])], axis=1)
        elif lighting:
            # lit grads need the raw per-channel cotangents too (the
            # shading couples channels through the light colors)
            gt = jnp.stack([gcol_t, tot_t,
                            pad_tile(g_img[..., 0]),
                            pad_tile(g_img[..., 1]),
                            pad_tile(g_img[..., 2])], axis=1)
        else:
            gt = jnp.stack([gcol_t, tot_t], axis=1)  # (n_tiles, 2, 8, 128)
    elif brick is not None and brick[4] is not None:
        ww0 = jnp.zeros((hp_img, wp_img), jnp.float32)
        ww0 = ww0.at[:brick[4].shape[0], :w_img].set(brick[4])
        gt = jnp.stack(
            [_tile_image(ww0), jnp.zeros_like(_tile_image(ww0))], axis=1)
    else:
        gt = jnp.zeros((n_tiles, 2, 8, 128), jnp.float32)

    has_ab = ab is not None

    has_re = re is not None

    def kernel(*refs):
        it = iter(refs)
        rayf_r, rayi_r, em_r = next(it), next(it), next(it)
        ab_r = next(it) if has_ab else None
        consts_r, gt_r, plan_r = next(it), next(it), next(it)
        lut_r = next(it) if lighting else None
        re_r = next(it) if has_re else None
        g_refs = [next(it) for _ in range(3)] if lookup else None
        if scatter:
            next(it)  # gem seed (aliased to the gem output; RMW uses out)
            if has_ab:
                next(it)  # gab seed
            if scat_re:
                next(it)  # gre seed
        out_r = next(it)
        gem_o = next(it) if scatter else None
        gab_o = next(it) if (scatter and has_ab) else None
        gre_o = next(it) if (scatter and scat_re) else None
        wem_s, wab_s, sems_s = next(it), next(it), next(it)
        wre_s = next(it) if lighting else None
        wg_s = [next(it) for _ in range(3)] if lookup else None
        gwin_s = next(it) if scatter else None
        rmw_s = next(it) if scatter else None
        rsem_s = next(it) if scatter else None
        sarr_s = next(it) if scatter else None
        _march_kernel(cfg, rayf_r, rayi_r, em_r, ab_r, consts_r, gt_r,
                      plan_r, out_r, wem_s, wab_s, sems_s,
                      gem_ref=gem_o, gab_ref=gab_o, gre_ref=gre_o,
                      gwin=gwin_s, rmw=rmw_s, rsem=rsem_s, sarr=sarr_s,
                      lut_ref=lut_r, re_ref=re_r, wre=wre_s,
                      g_refs=g_refs, wg=wg_s)

    ab_in = [ab] if has_ab else []
    ab_spec = [pl.BlockSpec(memory_space=pl.ANY)] if has_ab else []
    nseg = WC // 128
    wab_scratch = (pltpu.VMEM((nseg, 2, WR, 128), jnp.float32) if has_ab
                   else pltpu.VMEM((1, 1, 1, 128), jnp.float32))
    n_out_ch = 4
    if grad_mode:
        n_out_ch = 6 + ((1 + 3 * n_lights) if lighting else 0)
    n_ray_ch = 12 if lighting else 6
    n_gt_ch = 2
    if brick is not None and grad_mode:
        n_gt_ch = 4
    elif lighting and grad_mode:
        n_gt_ch = 5
    scat_re = scatter and lighting and has_re

    in_specs = [
        pl.BlockSpec((1, n_ray_ch, 8, 128), lambda t: (t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, 8, 128), lambda t: (t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        *ab_spec,
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n_gt_ch, 8, 128), lambda t: (t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, D - 1, 10), lambda t: (t, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    lit_in = []
    if lighting:
        lit_in.append(lut2)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if has_re:
            lit_in.append(re)
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        if lookup:
            for g_ in gvols:
                lit_in.append(g_)
                in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    out_specs = [
        pl.BlockSpec((1, n_out_ch, 8, 128), lambda t: (t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, n_out_ch, 8, 128), jnp.float32),
    ]
    nz_em = 2 if (not lighting or lookup) else 4
    scratch_shapes = [
        pltpu.VMEM((nseg, nz_em, WR, 128), jnp.float32),
        wab_scratch,
        pltpu.SemaphoreType.DMA((12 if lighting else 4,)),
    ]
    if lighting:
        scratch_shapes.append(
            pltpu.VMEM((nseg, 2, WR, 128), jnp.float32) if has_re
            else pltpu.VMEM((1, 1, 1, 128), jnp.float32))
        if lookup:
            scratch_shapes += [
                pltpu.VMEM((nseg, 2, WR, 128), jnp.float32)
                for _ in range(3)]
    grad_in = []
    aliases = {}
    if scatter:
        if lighting:
            nblk = 4 + (2 if has_ab else 0) + (2 if has_re else 0)
            n_sarr = 36
        else:
            nblk = 4 if has_ab else 2
            n_sarr = 4 + nblk
        grid_shape = (D, HP, WP)
        n_grids = 1 + (1 if has_ab else 0) + (1 if scat_re else 0)
        seed_base = 6 + (1 if has_ab else 0) + len(lit_in)
        for gi in range(n_grids):
            grad_in.append(jnp.zeros(grid_shape, jnp.float32))
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            out_shape.append(jax.ShapeDtypeStruct(grid_shape, jnp.float32))
            aliases[seed_base + gi] = 1 + gi
        scratch_shapes += [
            pltpu.VMEM((nblk, nseg * WR, 128), jnp.float32),
            pltpu.VMEM((nblk * nseg, WR, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((nblk * nseg,)),
            pltpu.VMEM((n_sarr, KCH * 8, 128), jnp.float32),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(rayf, rayi, em, *ab_in, consts, gt, plans, *lit_in, *grad_in)
    out = outs[0]

    if grad_mode:
        ts = jnp.float32(opts.tstep)
        rows_out = h_img if band is None else hp_img
        e_img = _untile_image(out[:, 4], hp_img, wp_img)[:rows_out, :w_img]
        f_img = _untile_image(out[:, 5], hp_img, wp_img)[:rows_out, :w_img]
        gcol_img = (g_img[..., 0] * colv[0] + g_img[..., 1] * colv[1]
                    + g_img[..., 2] * colv[2])
        d_fem = ts * jnp.sum(gcol_img * e_img)
        d_fab = jnp.sum(f_img)
        d_color = (scene.settings.factor_emission * ts
                   * jnp.sum(g_img * e_img[..., None], axis=(0, 1)))
        extras = {}
        if lighting:
            # lit channels: 6 = rac (d f_re), 7.. = per-(light, channel)
            # P sums (see the kernel's lit replay block); the color and
            # light-color pullbacks close in XLA where the raw light
            # colors are at hand
            rac_img = _untile_image(out[:, 6], hp_img, wp_img)[
                :rows_out, :w_img]
            extras["factor_reflection"] = jnp.sum(rac_img)
            lc = scene.light_colors  # (n_lights, 3), raw
            colv3 = scene.settings.color
            d_lc = []
            d_col_shade = jnp.zeros(3, jnp.float32)
            for il in range(n_lights):
                p_c = [jnp.sum(_untile_image(
                    out[:, 7 + 3 * il + c], hp_img, wp_img)[
                        :rows_out, :w_img]) for c in range(3)]
                p_c = jnp.stack(p_c)
                d_lc.append(p_c * colv3)
                d_col_shade = d_col_shade + p_c * lc[il]
            extras["light_colors"] = jnp.stack(d_lc)
            d_color = d_color + d_col_shade
        if scatter:
            inv = tuple(int(i) for i in np.argsort(perm))
            d_em_grid = jnp.transpose(outs[1][:, :H, :W], inv)
            oi = 2
            d_ab_grid = None
            if has_ab:
                d_ab_grid = jnp.transpose(outs[oi][:, :H, :W], inv)
                oi += 1
            if scat_re:
                extras["reflection"] = jnp.transpose(
                    outs[oi][:, :H, :W], inv)
            return (d_em_grid, d_ab_grid, d_fem, d_fab, d_color,
                    extras, ovf_any, dir_ok)
        return d_fem, d_fab, d_color, extras, ovf_any, dir_ok

    rows_out = h_img if band is None else hp_img
    img_r = _untile_image(out[:, 0], hp_img, wp_img)[:rows_out, :w_img]
    img_g = _untile_image(out[:, 1], hp_img, wp_img)[:rows_out, :w_img]
    img_b = _untile_image(out[:, 2], hp_img, wp_img)[:rows_out, :w_img]
    image = jnp.stack([img_r, img_g, img_b], axis=-1)
    if brick is not None:
        ww_img = _untile_image(out[:, 3], hp_img, wp_img)[:rows_out, :w_img]
        return image, ww_img, ovf_any, dir_ok
    return image, ovf_any, dir_ok


@functools.partial(
    jax.jit,
    static_argnames=("opts", "axis", "ascending", "wr", "interpret"),
)
def _render_tiled(scene: Scene, opts: RenderOptions, camera_x_offset,
                  axis: str, ascending: bool, wr: int, interpret: bool):
    return _launch(scene, opts, camera_x_offset, axis, ascending, wr,
                   interpret)


@functools.partial(
    jax.jit,
    static_argnames=("opts", "axis", "ascending", "wr", "interpret"),
)
def _replay_grads_tiled(scene: Scene, opts: RenderOptions, camera_x_offset,
                        axis: str, ascending: bool, wr: int, interpret: bool,
                        g_img, out_img):
    return _launch(scene, opts, camera_x_offset, axis, ascending, wr,
                   interpret, grad_inputs=(g_img, out_img))


@functools.partial(
    jax.jit,
    static_argnames=("opts", "axis", "ascending", "wr", "rs", "interpret"),
)
def _voxel_grads_tiled(scene: Scene, opts: RenderOptions, camera_x_offset,
                       axis: str, ascending: bool, wr: int, rs: int,
                       interpret: bool, g_img, out_img):
    return _launch(scene, opts, camera_x_offset, axis, ascending, wr,
                   interpret, grad_inputs=(g_img, out_img), scatter=True,
                   rs=rs)


def choose_sweep_axis(scene: Scene) -> Tuple[str, bool]:
    """Host-side principal-axis pick from the (concrete) camera basis.

    The central view ray is the camera z basis vector; sweep along the
    volume axis it is most aligned with. Returns (axis, ascending).
    """
    _, _, z_vec = scene.camera.basis()
    z = np.asarray([float(z_vec.x), float(z_vec.y), float(z_vec.z)])
    axis = ("x", "y", "z")[int(np.argmax(np.abs(z)))]
    ascending = bool(z[("x", "y", "z").index(axis)] >= 0)
    return axis, ascending


def pallas_supported(scene: Scene, opts: RenderOptions,
                     grads: bool = False) -> bool:
    """Static-shape / feature eligibility for the Pallas fast path.

    ``grads=True`` asks about the gradient modes (transfer_grads_fast /
    voxel_grads_fast), which do not cover lighting yet.
    """
    return unsupported_reason(scene, opts, grads=grads) is None


def unsupported_reason(scene: Scene, opts: RenderOptions,
                       grads: bool = False) -> Optional[str]:
    """None when the kernel can serve the scene, else a short reason."""
    if scene.has_lighting:
        if grads and scene.has_gradient_volumes:
            return ("lookup-gradient lighting backward (rides the replay "
                    "path)")
        if scene.illumination is None:
            return "lighting without an illumination LUT"
        ls = scene.illumination.shape
        if len(ls) != 3 or ls[0] != ls[1] or ls[1] != ls[2]:
            return f"non-cubic illumination LUT {ls}"
        if int(np.prod(ls)) * 4 > 4 * 2 ** 20:
            return f"illumination LUT {ls} exceeds the 4 MiB VMEM budget"
        if scene.has_gradient_volumes:
            for gv in (scene.gradient_x, scene.gradient_y, scene.gradient_z):
                if (gv.data.shape != scene.emission.data.shape
                        or gv.data.dtype != jnp.float32):
                    return ("gradient volume shape/dtype differs from "
                            "emission (kernel windows need one layout)")
        else:
            if min(scene.emission.data.shape) < 4:
                return "volume too small for the 4-slice tap window"
            # OTF tap offsets must stay within one voxel so the
            # sweep-axis taps fit the (s-1..s+2) window
            ext_ = [opts.boxmax[i] - opts.boxmin[i] for i in range(3)]
            w_, h_, d_ = scene.emission.extent_xyz
            for gs_, n_, e_ in zip(opts.gradient_step, (w_, h_, d_), ext_):
                if gs_ * n_ / e_ > 1.0 + 1e-6:
                    return "gradient tap offset exceeds one voxel"
    for vol in (scene.emission, scene.absorption,
                scene.reflection if scene.has_lighting else None):
        if vol is None:
            continue
        d = vol.data.shape
        if len(d) != 3 or min(d) < 2 or vol.data.dtype != jnp.float32:
            return f"volume shape/dtype {d}/{vol.data.dtype} outside envelope"
    if not scene.absorption_aliased:
        if scene.absorption.data.shape != scene.emission.data.shape:
            return "emission/absorption shape mismatch"
    if scene.has_lighting and not scene.reflection_aliased:
        if scene.reflection.data.shape != scene.emission.data.shape:
            return "emission/reflection shape mismatch"
    return None


_last_fallback: Optional[str] = None


def last_fallback_reason() -> Optional[str]:
    """Why the most recent ``render_forward_fast`` / ``*_grads_fast``
    call LEFT the Pallas kernel (None = the kernel served the call).

    The reference's memory manager at least reports when it cannot serve
    a render (mmanager.hxx:144-173); this is the kernel-envelope analog —
    a silent 100x perf cliff is a bug, not a fallback. The reason is also
    logged at WARNING level, and ``VolumeRenderer.last_plan`` records it.
    """
    return _last_fallback


def _note_fallback(reason: Optional[str]) -> None:
    global _last_fallback
    _last_fallback = reason
    if reason is not None:
        _log.warning("pallas march fell back to the flat path: %s", reason)


def render_forward_fast(
    scene: Scene,
    opts: RenderOptions,
    camera_x_offset: float = 0.0,
    *,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fast forward render via the Pallas march, with safe fallback.

    Semantics match ``ops.forward.render_forward`` (allclose). Falls back
    to the flat path when the scene/camera is outside the kernel's
    envelope (lighting on, degenerate ray directions, window overflow).
    Host-driven (reads the camera concretely); not jit-compatible.
    """
    from volume_renderer_tpu.ops.forward import render_forward

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    reason = unsupported_reason(scene, opts)
    if reason is not None:
        _note_fallback(reason)
        return render_forward(scene, opts, camera_x_offset)

    axis, ascending = choose_sweep_axis(scene)
    for wr in (64, 128):
        image, ovf, dir_ok = _render_tiled(
            scene, opts, jnp.float32(camera_x_offset), axis, ascending,
            wr, bool(interpret))
        if not bool(dir_ok):
            _note_fallback(
                "degenerate sweep direction (camera fov too wide for the "
                f"monotone {axis}-sweep)")
            return render_forward(scene, opts, camera_x_offset)
        if not bool(ovf):
            _note_fallback(None)
            return image
    _note_fallback("tile sample footprint overflowed the 128-row window")
    return render_forward(scene, opts, camera_x_offset)


def transfer_grads_fast(
    scene: Scene,
    opts: RenderOptions,
    g: jnp.ndarray,
    camera_x_offset: float = 0.0,
    *,
    interpret: Optional[bool] = None,
    image: Optional[jnp.ndarray] = None,
):
    """Transfer-parameter gradients at forward-kernel speed.

    Given the pixel cotangent ``g`` (H, W, 3), returns
    ``(image, {"factor_emission", "factor_absorption", "color"})`` where
    the gradients are exact (same formulas as the custom-VJP replay,
    docs/pallas_backward_design.md) but computed by a second Pallas sweep
    — per-ray reductions only, no scatter — so a transfer-function fit
    (the reference's paper_scale_permutations workload) runs ~100x faster
    than the full-replay path. Voxel-grid gradients are NOT produced;
    use ops.vjp.render_fused (or the slab/brick variants) for those.

    Pass ``image`` to reuse an already-rendered forward image (it must
    be the kernel's own output for the gradients to be exact) — a train
    step that computed ``g`` from the rendered image then pays ONE sweep
    here instead of two (round-4 weak #3). Falls back to the replay path
    off the kernel's envelope.
    """
    import jax as _jax

    from volume_renderer_tpu.ops.vjp import merge_scene, render_fused, split_scene

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def fallback():
        diff, template = split_scene(scene)

        def forward(d):
            return render_fused(merge_scene(template, d), opts, camera_x_offset)

        image, vjp_fn = _jax.vjp(forward, diff)
        d = vjp_fn(jnp.asarray(g, jnp.float32))[0]
        out = {
            "factor_emission": d["factor_emission"],
            "factor_absorption": d["factor_absorption"],
            "factor_reflection": d["factor_reflection"],
            "color": d["color"],
        }
        if scene.has_lighting:
            out["light_colors"] = d["light_colors"]
        return image, out

    reason = unsupported_reason(scene, opts, grads=True)
    if reason is not None:
        _note_fallback(reason)
        return fallback()

    axis, ascending = choose_sweep_axis(scene)
    for wr in (64, 128):
        if image is None or wr != 64:
            img_f, ovf, dir_ok = _render_tiled(
                scene, opts, jnp.float32(camera_x_offset), axis, ascending,
                wr, bool(interpret))
            if not bool(dir_ok):
                _note_fallback("degenerate sweep direction")
                return fallback()
            if bool(ovf):
                continue
        else:
            img_f = image
        d_fem, d_fab, d_color, extras, ovf2, dir_ok2 = _replay_grads_tiled(
            scene, opts, jnp.float32(camera_x_offset), axis, ascending,
            wr, bool(interpret), jnp.asarray(g, jnp.float32), img_f)
        if not bool(dir_ok2):
            _note_fallback("degenerate sweep direction")
            return fallback()
        if bool(ovf2):
            continue
        _note_fallback(None)
        out = {
            "factor_emission": d_fem,
            "factor_absorption": d_fab,
            "factor_reflection": extras.get(
                "factor_reflection", jnp.float32(0.0)),
            "color": d_color,
        }
        if scene.has_lighting:
            out["light_colors"] = extras["light_colors"]
        return img_f, out
    _note_fallback("tile sample footprint overflowed the 128-row window")
    return fallback()


def voxel_grads_fast(
    scene: Scene,
    opts: RenderOptions,
    g: jnp.ndarray,
    camera_x_offset: float = 0.0,
    *,
    interpret: Optional[bool] = None,
    image: Optional[jnp.ndarray] = None,
):
    """Full backward (pixel -> voxel-grid + transfer gradients) at kernel
    speed: the in-kernel MXU one-hot scatter (Option A of
    docs/pallas_backward_design.md) replaces the XLA replay path's serial
    scatter-adds, which were the ~100x fwd+bwd bottleneck.

    Given the pixel cotangent ``g`` (H, W, 3), returns
    ``(image, grads)`` where ``grads`` carries the same keys as
    ``ops.vjp.split_scene``'s diff for a lighting-off scene: ``emission``
    (voxel grid), ``absorption`` (if not aliased), ``reflection`` zeros
    (if a reflection volume is attached but lighting is off),
    ``factor_emission``, ``factor_absorption``, ``factor_reflection``
    (zero: lighting off), ``color``. Values match ``jax.vjp`` of
    ``ops.vjp.render_fused`` (allclose); geometry is non-differentiable
    here exactly as there. Adjoint of the reference march,
    volumeRender_kernel.cu:365-507.

    Pass ``image`` to reuse an already-rendered forward image (it must be
    the kernel's own output for the gradients to be exact). Falls back to
    the replay VJP path off the kernel's envelope. Host-driven; not
    jit-compatible — for jax.grad composition use ops.vjp.render_fused.
    """
    import jax as _jax

    from volume_renderer_tpu.ops.vjp import merge_scene, render_fused, split_scene

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def fallback():
        diff, template = split_scene(scene)

        def forward(d):
            return render_fused(merge_scene(template, d), opts, camera_x_offset)

        img, vjp_fn = _jax.vjp(forward, diff)
        return img, vjp_fn(jnp.asarray(g, jnp.float32))[0]

    reason = unsupported_reason(scene, opts, grads=True)
    if reason is not None:
        _note_fallback(reason)
        return fallback()

    axis, ascending = choose_sweep_axis(scene)
    # (wr, rs) ladder: full-window wr for the forward windows, RS-row
    # scatter A-blocks widening on footprint overflow (plan scat_ovf)
    img = image
    last_wr = 64 if image is not None else None
    for wr, rs in ((64, 64), (128, 128)):
        if last_wr != wr:
            img, ovf, dir_ok = _render_tiled(
                scene, opts, jnp.float32(camera_x_offset), axis, ascending,
                wr, bool(interpret))
            last_wr = wr
            if not bool(dir_ok):
                _note_fallback("degenerate sweep direction")
                return fallback()
            if bool(ovf):
                last_wr = None  # img invalid: a later rung re-renders
                continue
        (d_em, d_ab, d_fem, d_fab, d_color, extras, ovf2,
         dir_ok2) = _voxel_grads_tiled(
            scene, opts, jnp.float32(camera_x_offset), axis, ascending,
            wr, rs, bool(interpret), jnp.asarray(g, jnp.float32), img)
        if not bool(dir_ok2):
            _note_fallback("degenerate sweep direction")
            return fallback()
        if bool(ovf2):
            continue
        grads = {
            "emission": d_em,
            "factor_emission": d_fem,
            "factor_absorption": d_fab,
            "factor_reflection": extras.get(
                "factor_reflection", jnp.float32(0.0)),
            "color": d_color,
        }
        if not scene.absorption_aliased:
            grads["absorption"] = d_ab
        if not scene.reflection_aliased:
            grads["reflection"] = extras.get(
                "reflection",
                jnp.zeros(scene.reflection.data.shape, jnp.float32))
        if scene.has_lighting:
            grads["light_colors"] = extras["light_colors"]
        _note_fallback(None)
        return img, grads
    _note_fallback("tile sample footprint overflowed the 128-row window")
    return fallback()
