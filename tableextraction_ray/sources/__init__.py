"""Dataset sources for the engine's storage layouts."""

from .media import read_media
from .corpus import read_documents, read_golden

__all__ = ["read_media", "read_documents", "read_golden"]
