import pytest

from kgce.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kgce-tests", cores=4, shuffle_partitions=8)
    yield s
