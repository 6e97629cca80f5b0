from __future__ import annotations

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from pandas_td_spark.engine.session import get_spark

    s = get_spark(app_name="pandas_td_spark_tests")
    yield s
