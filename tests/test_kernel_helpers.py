"""Direct unit tests of the Pallas kernel's factored helpers (interpret
mode on CPU): the roll-based prefix scans, the MXU identity-transpose,
the cephes arccos, and the VMEM LUT fetch — the building blocks the
march/scatter/lighting modes compose."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volume_renderer_tpu.ops.pallas_march import (
    _KCfg,
    _acos,
    _identity128,
    _lut_fetch,
    _make_scans,
    _mxu_t,
)

KS = 64


def _run_kernel(fn, *arrays, out_shape=None):
    """Run ``fn(*vals) -> val`` as a tiny interpret-mode pallas kernel."""
    if out_shape is None:
        out_shape = jax.ShapeDtypeStruct(arrays[0].shape, arrays[0].dtype)

    def kernel(*refs):
        *ins, out = refs
        out[...] = fn(*(r[...] for r in ins))

    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        interpret=True,
    )(*arrays)


def test_prefix_scans_match_numpy():
    rng = np.random.RandomState(0)
    v = rng.rand(KS, 128).astype(np.float32) * 0.5 + 0.5
    b = (rng.rand(KS, 128) > 0.7).astype(np.int32)

    def f_mul(x):
        return _make_scans(KS)[0](x)

    def f_add(x):
        return _make_scans(KS)[1](x)

    def f_or(x):
        return _make_scans(KS)[2](x)

    # the scans run over the K step groups: group g = sublanes [8g, 8g+8)
    def ref_scan(a, op, init):
        out = np.empty_like(a)
        for lane in range(128):
            for sub in range(8):
                acc = init
                for g in range(KS // 8):
                    acc = op(acc, a[g * 8 + sub, lane])
                    out[g * 8 + sub, lane] = acc
        return out

    np.testing.assert_allclose(
        np.asarray(_run_kernel(f_mul, jnp.asarray(v))),
        ref_scan(v, lambda a, b_: a * b_, 1.0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(_run_kernel(f_add, jnp.asarray(v))),
        ref_scan(v, lambda a, b_: a + b_, 0.0), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(_run_kernel(f_or, jnp.asarray(b))),
        ref_scan(b, lambda a, b_: a | b_, 0))


def test_mxu_transpose_exact():
    rng = np.random.RandomState(1)
    a = (rng.randint(0, 1 << 20, size=(128, 128))).astype(np.float32)

    def f(x):
        return _mxu_t(x, _identity128())

    out = np.asarray(_run_kernel(f, jnp.asarray(a)))
    np.testing.assert_array_equal(out, a.T)


def test_acos_matches_numpy():
    x = np.linspace(-1.0, 1.0, 4096).astype(np.float32)
    got = np.asarray(_acos(jnp.asarray(x)))
    ref = np.arccos(x.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-6)


@pytest.mark.parametrize("l", [8, 16, 32], ids=lambda l: f"L{l}")
def test_lut_fetch_matches_sample_trilinear(l):
    """The in-kernel LUT fetch == CUDA-semantics trilinear sampling of
    the (L, L, L) grid at the (a, b, g) coordinate triple."""
    from volume_renderer_tpu.ops.float3 import F3
    from volume_renderer_tpu.ops.sampling import sample_trilinear

    rng = np.random.RandomState(2)
    lut = rng.rand(l, l, l).astype(np.float32)
    segs = max(1, -(-(l * l) // 128))
    lutT = jnp.transpose(jnp.asarray(lut), (1, 0, 2)).reshape(l, l * l)
    pad = segs * 128 - l * l
    if pad:
        lutT = jnp.pad(lutT, ((0, 0), (0, pad)))
    lut2 = lutT.reshape(l * segs, 128)

    cfg = _KCfg(d=2, h=2, w=2, hp=8, wp=128, wr=8, wc=128,
                ascending=True, ab_aliased=True, n_steps=1,
                lighting=True, lut_l=l, lut_segs=segs)

    a = rng.rand(KS, 128).astype(np.float32)
    b = rng.rand(KS, 128).astype(np.float32)
    g = rng.rand(KS, 128).astype(np.float32)
    act = rng.rand(KS, 128) > 0.3

    def f(lut_ref, act_, a_, b_, g_):
        return _lut_fetch(cfg, lut_ref, act_ != 0, a_, b_, g_)

    got = np.asarray(pl.pallas_call(
        lambda lut_ref, act_r, a_r, b_r, g_r, out: out.__setitem__(
            ..., f(lut_ref, act_r[...], a_r[...], b_r[...], g_r[...])),
        out_shape=jax.ShapeDtypeStruct((KS, 128), jnp.float32),
        interpret=True,
    )(lut2, jnp.asarray(act, jnp.int32), jnp.asarray(a), jnp.asarray(b),
      jnp.asarray(g)))

    ref = np.asarray(sample_trilinear(
        jnp.asarray(lut), F3(jnp.asarray(a), jnp.asarray(b), jnp.asarray(g))))
    np.testing.assert_allclose(got[act], ref[act], rtol=1e-6, atol=1e-7)
