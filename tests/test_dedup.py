"""Content-hash volume dedup in the session layer (reference parity:
syncWithDevice aliases pairwise-EQUAL volumes, volumeRender_kernel.cu:
739-867, not just same-object ones)."""

import numpy as np

from volume_renderer_tpu.api.renderer import VolumeRenderer
from volume_renderer_tpu.models.volume import Volume


def _renderer(em, ab, re=None):
    r = VolumeRenderer()
    r.volume_emission = Volume.create(em)
    r.volume_absorption = Volume.create(ab)
    if re is not None:
        r.volume_reflection = Volume.create(re)
    r.focal_length, r.distance_to_object = 3.0, 6.0
    r.image_resolution = (8, 8)
    return r


def test_equal_valued_distinct_arrays_alias():
    rng = np.random.default_rng(0)
    em = rng.random((8, 8, 8)).astype(np.float32)
    ab = em.copy()  # equal values, distinct array object
    scene = _renderer(em, ab)._build_scene()
    assert scene.absorption is None  # aliased to emission


def test_different_values_do_not_alias():
    rng = np.random.default_rng(0)
    em = rng.random((8, 8, 8)).astype(np.float32)
    ab = em.copy()
    ab[3, 3, 3] += 1e-3
    scene = _renderer(em, ab)._build_scene()
    assert scene.absorption is not None


def test_different_shapes_do_not_alias():
    rng = np.random.default_rng(0)
    em = rng.random((8, 8, 8)).astype(np.float32)
    ab = rng.random((8, 8, 4)).astype(np.float32)
    scene = _renderer(em, ab)._build_scene()
    assert scene.absorption is not None


def test_reflection_aliases_by_content():
    rng = np.random.default_rng(1)
    em = rng.random((8, 8, 8)).astype(np.float32)
    scene = _renderer(em, em * 0.5, re=em.copy())._build_scene()
    assert scene.reflection is None
    assert scene.absorption is not None


def test_hash_cache_reused():
    rng = np.random.default_rng(2)
    em = rng.random((8, 8, 8)).astype(np.float32)
    r = _renderer(em, em.copy())
    r._build_scene()
    n_entries = len(r._hash_cache)
    r._build_scene()  # second build: cache hit, no growth
    assert len(r._hash_cache) == n_entries


def test_aliased_render_matches_unaliased():
    """Rendering with a content-aliased absorption equals rendering with
    the same values passed as a distinct (non-aliased) grid."""
    rng = np.random.default_rng(4)
    em = rng.random((12, 10, 8)).astype(np.float32)

    r1 = _renderer(em, em.copy())
    img1 = np.asarray(r1.render())
    assert r1._build_scene().absorption is None

    ab = em.copy()
    ab[0, 0, 0] += 1e-7  # break content equality; values ~identical
    r2 = _renderer(em, ab)
    img2 = np.asarray(r2.render())
    assert r2._build_scene().absorption is not None
    np.testing.assert_allclose(img1, img2, rtol=1e-3, atol=1e-5)


def test_mem_info_reports_content_sharing():
    """mem_info uses the same content-equality rule as the render path:
    two equal-VALUED distinct arrays report as one resident grid."""
    rng = np.random.default_rng(5)
    em = rng.random((8, 8, 8)).astype(np.float32)
    r = _renderer(em, em.copy())  # distinct array, equal content
    info = r.mem_info()
    assert "shared with volume_emission" in info
    nbytes = em.size * 4
    assert f"total (deduplicated): {nbytes / 2**20:.1f} MiB" in info
