from .events_stream import run_windowed_counts_once, windowed_event_counts

__all__ = ["run_windowed_counts_once", "windowed_event_counts"]
