"""Rendering + camera tests: the chroma-cam path end to end."""
import numpy as np

import tests.conftest  # noqa: F401
import jax.numpy as jnp

from chroma_tpu import make
from chroma_tpu.geometry import Solid, Geometry, vacuum
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu import gpu
from chroma_tpu.ops.render import render, GPURays
from chroma_tpu.tools import from_film


def test_render_sphere_silhouette():
    geo = create_geometry_from_obj(
        Solid(make.sphere(100.0, nsteps=24), vacuum, vacuum,
              color=0x00ff0000), update_bvh_cache=False)
    gg = gpu.GPUGeometry(geo)
    size = (64, 48)
    pos, dirs = from_film((0.0, -500.0, 0.0), size=size, width=35.0,
                          focal_length=18.0)
    pixels = np.asarray(render(jnp.asarray(pos, jnp.float32),
                               jnp.asarray(dirs, jnp.float32), gg.geom))
    img = pixels.reshape(size[0], size[1])
    # center pixel sees the (opaque red, shaded) sphere
    center = img[size[0] // 2, size[1] // 2]
    red = (center >> 16) & 0xFF
    blue = center & 0xFF
    assert red > 100 and blue < 50
    # corner pixel sees background (gray)
    corner = img[0, 0]
    assert ((corner >> 16) & 0xFF) == ((corner >> 8) & 0xFF) \
        == (corner & 0xFF)


def test_camera_snapshot(tmp_path):
    from chroma_tpu.camera import Camera
    geo = create_geometry_from_obj(
        Solid(make.cube(100.0), vacuum, vacuum, color=0x3300ff00),
        update_bvh_cache=False)
    cam = Camera(geo, size=(40, 30))
    path = str(tmp_path / 'snap.png')
    cam.snapshot(path)
    from PIL import Image
    img = Image.open(path)
    assert img.size == (40, 30)


def test_gpurays_transforms():
    pos = np.array([[1.0, 0, 0]], np.float32)
    dir = np.array([[0, 1.0, 0]], np.float32)
    rays = GPURays(pos, dir)
    rays.rotate(np.pi / 2, (0, 0, 1.0))
    np.testing.assert_allclose(np.asarray(rays.pos), [[0, -1, 0]],
                               atol=1e-6)
    rays.translate((1.0, 0, 0))
    np.testing.assert_allclose(np.asarray(rays.pos), [[1, -1, 0]],
                               atol=1e-6)


def test_color_solids():
    geo = Geometry(vacuum)
    geo.add_solid(Solid(make.cube(1.0), vacuum, vacuum, color=0x111111))
    geo.add_solid(Solid(make.cube(1.0), vacuum, vacuum, color=0x222222),
                  displacement=(5, 0, 0))
    geo = create_geometry_from_obj(geo, update_bvh_cache=False)
    gg = gpu.GPUGeometry(geo)
    nt = len(geo.mesh.triangles)
    gg.color_solids(np.array([False, True]),
                    np.array([0, 0xABCDEF], np.uint32))
    colors = np.asarray(gg.geom.colors)
    assert (colors[:nt // 2] == 0x111111).all()
    assert (colors[nt // 2:] == 0xABCDEF).all()
