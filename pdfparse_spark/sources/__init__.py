from .io import iceberg_available, load_transcripts, write_output, write_range_clustered  # noqa: F401
