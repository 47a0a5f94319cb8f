from .stream_extract import start_stream_extraction  # noqa: F401
from .windowed import start_windowed_stats, windowed_turn_stats  # noqa: F401
from .dedup import dedup_stream, start_stream_dedup  # noqa: F401
from .neardup import (  # noqa: F401
    fold_band_verdicts,
    minhash_cols,
    read_neardup_verdicts,
    start_stream_neardup,
)
from .anomaly import start_anomaly_stream, with_anomaly_units  # noqa: F401
from .stream_extract import start_stream_extraction_dedup  # noqa: F401
from .bloom_dedup import (  # noqa: F401
    bloom_pos_cols,
    read_bloom_verdicts,
    start_stream_bloom_dedup,
)
