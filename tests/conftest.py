from __future__ import annotations

import pytest

from halvesting_geometric_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hgs-tests", cores=4, shuffle_partitions=4,
                  driver_memory="8g")
    yield s
    s.stop()
