"""Histogram utilities (parity: chroma/histogram)."""
from chroma_tpu.histogram.histogram import Histogram
from chroma_tpu.histogram.histogramdd import HistogramDD
from chroma_tpu.histogram.graph import Graph

__all__ = ['Histogram', 'HistogramDD', 'Graph']
