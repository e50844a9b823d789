from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from hexspark.session import get_spark

    s = get_spark(
        app_name="hexspark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
