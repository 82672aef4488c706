from .oracle import execute_query_numpy
from .executor import JaxEngine

__all__ = ["execute_query_numpy", "JaxEngine"]
