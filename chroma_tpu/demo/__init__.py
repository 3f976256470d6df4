"""Demo detectors (parity: chroma/demo/__init__.py).

``detector()`` builds the benchmark geometry: a black sphere lined with
10,055 8-inch PMTs (full variant) placed on a spherical spiral, filled with water.
``tiny()`` is a small variant for tests.

Provenance note: ``spherical_spiral`` and the ``detector()`` parameters
(radii, spiral step, PMT count) are intentionally identical to the
reference demo (chroma/demo/__init__.py:25-65) — this module DEFINES the
benchmark geometry, so any divergence here would invalidate the
performance comparison against the reference baseline.  Everything the
geometry feeds into (meshing, BVH, engine) is original.
"""
from math import sin, cos, sqrt

import numpy as np

from chroma_tpu.make import sphere
from chroma_tpu.geometry import Solid
from chroma_tpu.detector import Detector
from chroma_tpu.transform import make_rotation_matrix, normalize
from chroma_tpu.demo.pmt import build_8inch_pmt_with_lc
from chroma_tpu.demo.optics import water, black_surface
from chroma_tpu.demo.checkerboard import build_checkerboard_scene \
    as checkerboard_scene
from chroma_tpu.log import logger


def spherical_spiral(radius, spacing):
    """Points approximately equidistant along a spiral wrapping a
    sphere."""
    dl = spacing / radius
    t = 0.0
    a = np.pi / dl
    while t < np.pi:
        yield np.array([sin(t) * sin(a * t), sin(t) * cos(a * t),
                        cos(t)]) * radius
        t += dl / sqrt(1 + a ** 2 * sin(t) ** 2)


def detector(pmt_radius=14000.0, sphere_radius=14500.0, spiral_step=350.0):
    """The benchmark detector: PMTs on a spherical spiral inside a black
    sphere of water (reference: chroma/demo/__init__.py:32)."""
    pmt = build_8inch_pmt_with_lc()
    geo = Detector(water)

    geo.add_solid(Solid(sphere(sphere_radius, nsteps=200), water, water,
                        surface=black_surface, color=0xBBFFFFFF))

    y_axis = np.array((0.0, 1.0, 0.0))
    for position in spherical_spiral(pmt_radius, spiral_step):
        direction = -normalize(position)
        # PMT mesh starts facing +y; rotate to face inward
        axis = np.cross(direction, y_axis)
        angle = np.arccos(np.dot(y_axis, direction))
        rotation = make_rotation_matrix(angle, axis)
        geo.add_pmt(pmt, rotation, position)

    time_rms = 1.5      # ns
    charge_mean = 1.0
    charge_rms = 0.1
    geo.set_time_dist_gaussian(time_rms, -5 * time_rms, 5 * time_rms)
    geo.set_charge_dist_gaussian(charge_mean, charge_rms, 0.0,
                                 charge_mean + 5 * charge_rms)

    logger.info('Demo detector: %d PMTs' % geo.num_channels())
    return geo


def tiny():
    """Small demo detector for tests."""
    return detector(2000.0, 2500.0, 700.0)
