"""Structured Streaming surface.

The reference is pure batch (SURVEY.md §1.3: no streams), but a
training-data pipeline at 100 TB ingests continuously. The same long-form
transforms run unchanged on streaming DataFrames; this package adds the
stream-only operators: watermarked windowed aggregation, within-watermark
dedup, and custom stateful sessionization.
"""

from .ops import (
    sessionize,
    stream_jsonl_nodes,
    streaming_dedup,
    windowed_event_counts,
)

__all__ = [
    "stream_jsonl_nodes",
    "streaming_dedup",
    "windowed_event_counts",
    "sessionize",
]
