from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pdfparse_spark.pipeline.session import get_spark

    s = get_spark(master="local[4]", app_name="pytest", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
