"""connectors-spark: a PySpark-native table-format + analytics engine with the
query and data-processing capabilities of delta-io/connectors, re-expressed
Spark-first (DataFrame/SQL plans, Catalyst optimization, distributed state
reconstruction), plus large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal columns).
"""

from .table import DeltaLog, DeltaTable, TableMaintenance
from .scan import DeltaScan
from .expressions import Col, Lit
from .catalog import DeltaCatalog, read_delta
from .log.actions import (AddFile, CommitInfo, Metadata, Protocol,
                          RemoveFile, SetTransaction)

__all__ = [
    "DeltaLog", "DeltaTable", "DeltaScan", "TableMaintenance",
    "Col", "Lit", "DeltaCatalog", "read_delta",
    "AddFile", "CommitInfo", "Metadata", "Protocol", "RemoveFile",
    "SetTransaction",
]

__version__ = "0.1.0"
