from .query import BooleanQuery, MatchAllQuery, Query, TermQuery, parse_query  # noqa: F401
from .searcher import Searcher  # noqa: F401
