from __future__ import annotations

import shutil
import tempfile

import pytest

from mimic_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(parallelism=8, app_name="mimic_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_table_dir():
    d = tempfile.mkdtemp(prefix="mimic_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
