"""Detector models: codec-MV cluster detector (flagship) and the
pixel-domain SAD fallback."""

from .mv_detector import MVClusterDetector
from .sad_detector import SADDetector

__all__ = ["MVClusterDetector", "SADDetector"]
