"""Henyey-Greenstein LUT vs an independent direct evaluation."""

import numpy as np
import pytest

from volume_renderer_tpu.ops.hg import henyey_greenstein_lut


def hg_direct(n, g):
    """Direct scalar-loop evaluation following HenyeyGreenstein.cc:62-91."""
    out = np.zeros((n, n, n), np.float32)
    frac = np.float32(np.pi / n)
    for c in range(n):
        gamma = c * frac
        for a in range(n):
            alpha = a * frac
            light_out = np.array([np.sin(alpha), 0.0, np.cos(alpha)], np.float32)
            s, co = np.sin(gamma), np.cos(gamma)
            rot = np.array([[1, 0, 0], [0, co, s], [0, -s, co]], np.float32)
            lo_rot = rot @ light_out
            for b in range(n):
                beta = b * frac
                light_in = np.array([np.sin(beta), 0.0, np.cos(beta)], np.float32)
                cos_theta = float(lo_rot @ light_in)
                num = 1.0 - g * g
                den = np.sqrt((1.0 + g * g - 2.0 * g * cos_theta) ** 3)
                out[c, a, b] = 1.0 / (4.0 * np.pi) * num / den
    return out


@pytest.mark.parametrize("g", [0.8, -0.5, 0.0])
def test_matches_direct(g):
    n = 8
    got = np.asarray(henyey_greenstein_lut(n, g))
    want = hg_direct(n, g)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_shape_and_positive():
    lut = np.asarray(henyey_greenstein_lut(16))
    assert lut.shape == (16, 16, 16)
    assert (lut > 0).all()


def test_g_validation():
    with pytest.raises(ValueError):
        henyey_greenstein_lut(8, 1.5)


def test_isotropic_constant():
    """g = 0 makes the phase function the constant 1/(4 pi)."""
    lut = np.asarray(henyey_greenstein_lut(8, 0.0))
    np.testing.assert_allclose(lut, 1.0 / (4 * np.pi), rtol=1e-6)
