"""Streaming integration (SURVEY.md §2.9): version-offset change feed
(batch + Structured Streaming source) and exactly-once idempotent sink.
"""

from .changes import changes_df, validated_adds_per_version
from .sink import DeltaStreamSink
from .source import DeltaStreamDataSource, register_stream_source

__all__ = ["changes_df", "validated_adds_per_version",
           "DeltaStreamSink", "DeltaStreamDataSource",
           "register_stream_source"]
