from .build import build_index  # noqa: F401
from .reader import IndexReader  # noqa: F401
