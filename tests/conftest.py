from __future__ import annotations

import pytest

from fairtracks_validator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="ftval-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/ftval-warehouse"},
    )
    yield s


def rows_set(df, cols=None):
    """Order-insensitive set of tuples for exact-set assertions."""
    if cols is not None:
        df = df.select(*cols)
    return {tuple(r) for r in df.collect()}
