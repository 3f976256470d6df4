"""GDML/RATDB geometry import (parity subset: chroma/rat)."""
from chroma_tpu.rat.loader import RATGeoLoader, Volume
from chroma_tpu.rat.ratdb_parser import RatDBParser

__all__ = ['RATGeoLoader', 'Volume', 'RatDBParser']
