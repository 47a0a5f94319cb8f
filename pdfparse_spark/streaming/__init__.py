from .stream_extract import start_stream_extraction  # noqa: F401
