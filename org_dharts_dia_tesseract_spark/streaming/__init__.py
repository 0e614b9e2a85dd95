from .sessions import (sessionize_stream, streaming_event_counts,
                       streaming_span_extraction)

__all__ = ["streaming_event_counts", "sessionize_stream",
           "streaming_span_extraction"]
