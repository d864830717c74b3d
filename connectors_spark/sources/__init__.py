"""Sources & sinks beyond the table core (SURVEY.md §2.1): parallel
JDBC import (S9), Parquet-directory adoption (CONVERT TO DELTA)."""

from .convert import convert_to_delta
from .jdbc_import import (apply_transforms, import_to_delta,
                          read_jdbc_in_parallel)

__all__ = ["convert_to_delta", "apply_transforms", "import_to_delta",
           "read_jdbc_in_parallel"]
