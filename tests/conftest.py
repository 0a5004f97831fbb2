from __future__ import annotations

import pytest

from invoice_anomaly_detection_sieve_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sieve-tests", cores=4, shuffle_partitions=4)
    yield s
