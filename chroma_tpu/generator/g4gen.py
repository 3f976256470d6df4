"""Geant4-backed photon generation (parity: chroma/generator/g4gen.py).

The reference builds a Geant4 world of the detector material, converts
chroma Materials into G4 materials with scintillation property tables,
fires the particle gun, and harvests optical photons from a tracking
action that kills them at creation (reference: chroma/generator/
g4gen.py + src/G4chroma.cc).  A Geant4 installation (with python
bindings, e.g. geant4_pybind) is not part of this image, so this
module provides the same interface and raises a helpful ImportError
when Geant4 is unavailable; the worker pool then falls back to the
ParametricGenerator (chroma_tpu/generator/photon.py).
"""
import numpy as np

try:
    import geant4_pybind as g4  # noqa: F401
    HAVE_GEANT4 = True
except ImportError:
    try:
        import Geant4 as g4  # noqa: F401
        HAVE_GEANT4 = True
    except ImportError:
        HAVE_GEANT4 = False


class G4Generator(object):
    """In-process Geant4 photon generator."""

    def __init__(self, material, seed=None, orb_radius=10.0):
        if not HAVE_GEANT4:
            raise ImportError(
                'No Geant4 python bindings found (tried geant4_pybind, '
                'Geant4). Install one, or use geant4_processes=0 / the '
                'parametric generator.')
        raise NotImplementedError(
            'Geant4 bindings detected but the G4 world construction is '
            'not wired up in this build; use the parametric generator.')

    def generate_photons(self, vertices, mute=False):
        raise NotImplementedError
