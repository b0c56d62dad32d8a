from .sessionize import sessionize_stream, stream_events_from_dir  # noqa: F401
