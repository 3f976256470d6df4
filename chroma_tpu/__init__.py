"""chroma_tpu: a TPU-native optical photon Monte Carlo framework.

A ground-up re-engineering of the capabilities of Chroma
(github.com/pennneutrinos/chroma) for TPU hardware: photons are SoA JAX
arrays propagated by wavefront kernels (XLA + Pallas) through a
BVH-accelerated triangle-mesh geometry, with counter-based (threefry)
RNG and segment-reductions in place of CUDA atomics.

Public API mirrors the reference framework (see /root/reference):
Geometry / Detector / Solid / Material / Surface build scenes,
Simulation drives event generation + propagation + DAQ, and
Likelihood/PDF machinery supports event reconstruction.
"""

__version__ = "0.1.0"

from chroma_tpu import event
from chroma_tpu.event import Photons, Vertex, Event, Channels
from chroma_tpu.geometry import (Mesh, Solid, Material, Surface,
                                 DichroicProps, Geometry, vacuum,
                                 standard_wavelengths)
from chroma_tpu.detector import Detector
from chroma_tpu import make
from chroma_tpu.stl import mesh_from_stl
from chroma_tpu.loader import load_geometry_from_string, create_geometry_from_obj

__all__ = [
    'event', 'Photons', 'Vertex', 'Event', 'Channels',
    'Mesh', 'Solid', 'Material', 'Surface', 'DichroicProps', 'Geometry',
    'vacuum', 'standard_wavelengths', 'Detector', 'make', 'mesh_from_stl',
    'load_geometry_from_string', 'create_geometry_from_obj',
]
