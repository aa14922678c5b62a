"""activecube_graphql_spark — a PySpark-native multi-dimensional (OLAP cube)
analytics engine with the query semantics of bitquery/activecube-graphql,
re-expressed Spark-first (DataFrame/Catalyst; see SURVEY.md).
"""

from .errors import InputArgumentError, ShapeError
from .model import Cube, Dimension, JoinSpec, Metric, Representation, Selector
from .query import CubeQueryBuilder, PATH_PREFIX
from .session import get_spark
from .sources.registry import SourceRegistry

__all__ = [
    "Cube", "CubeQueryBuilder", "Dimension", "InputArgumentError", "JoinSpec",
    "Metric", "PATH_PREFIX", "Representation", "Selector", "ShapeError",
    "SourceRegistry",
    "get_spark",
]

__version__ = "0.1.0"
