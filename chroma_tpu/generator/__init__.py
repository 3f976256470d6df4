"""Photon/vertex generation (parity: chroma/generator/)."""
from chroma_tpu.generator import vertex
from chroma_tpu.generator import photon
from chroma_tpu.generator.photon import (G4ParallelGenerator,
                                         ParametricGenerator, photon_bomb)

__all__ = ['vertex', 'photon', 'G4ParallelGenerator',
           'ParametricGenerator', 'photon_bomb']
