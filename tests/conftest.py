from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from htep_spark.sources.io import get_spark

    session = get_spark("htep-tests", cores=4, shuffle_partitions=8)
    yield session
    session.stop()
