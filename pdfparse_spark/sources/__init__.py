from .io import iceberg_available, load_transcripts, write_output  # noqa: F401
