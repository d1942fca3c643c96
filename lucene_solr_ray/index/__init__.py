from .build import build_index  # noqa: F401
from .reader import IndexReader  # noqa: F401
from .update import add_documents, add_indexes, delete_by_keys, delete_by_query, update_documents  # noqa: F401
