"""Cache semantics (model: reference test/test_cache.py)."""
import os

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from chroma_tpu import make
from chroma_tpu.cache import Cache, GeometryNotFoundError, BVHNotFoundError
from chroma_tpu.geometry import Geometry, Solid, vacuum
from chroma_tpu.bvh import make_simple_bvh


@pytest.fixture
def cache(tmp_path):
    return Cache(str(tmp_path / 'cache'))


def flat_geometry():
    geo = Geometry(vacuum)
    geo.add_solid(Solid(make.cube(1.0), vacuum, vacuum))
    geo.flatten()
    return geo


def test_creates_directories(tmp_path):
    Cache(str(tmp_path / 'c'))
    assert os.path.isdir(str(tmp_path / 'c' / 'geo'))
    assert os.path.isdir(str(tmp_path / 'c' / 'bvh'))


def test_geometry_round_trip(cache):
    geo = flat_geometry()
    cache.save_geometry('cube', geo)
    assert cache.list_geometry() == ['cube']
    loaded = cache.load_geometry('cube')
    assert len(loaded.mesh.triangles) == len(geo.mesh.triangles)
    assert cache.get_geometry_hash('cube') == geo.mesh.md5()
    cache.remove_geometry('cube')
    assert cache.list_geometry() == []
    with pytest.raises(GeometryNotFoundError):
        cache.load_geometry('cube')


def test_default_geometry(cache):
    geo = flat_geometry()
    cache.save_geometry('cube', geo)
    with pytest.raises(GeometryNotFoundError):
        cache.load_default_geometry()
    cache.set_default_geometry('cube')
    assert cache.load_default_geometry() is not None


def test_bvh_round_trip(cache):
    geo = flat_geometry()
    bvh = make_simple_bvh(geo.mesh, degree=2)
    mesh_hash = geo.mesh.md5()
    assert not cache.exist_bvh(mesh_hash)
    cache.save_bvh(bvh, mesh_hash)
    assert cache.exist_bvh(mesh_hash)
    assert cache.list_bvh(mesh_hash) == ['default']
    loaded = cache.load_bvh(mesh_hash)
    assert len(loaded) == len(bvh)
    cache.save_bvh(bvh, mesh_hash, 'alt')
    assert sorted(cache.list_bvh(mesh_hash)) == ['alt', 'default']
    cache.remove_bvh(mesh_hash, 'alt')
    with pytest.raises(BVHNotFoundError):
        cache.load_bvh(mesh_hash, 'alt')
