"""Index types (L3 equivalent of faiss/*.h)."""

from .base import Index, SearchStats  # noqa: F401
from .flat import IndexFlat, IndexFlatIP, IndexFlatL2  # noqa: F401
