"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("APITAP_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from apitap_spark.session import get_session

    import tempfile

    spark = get_session(
        app_name="apitap-tests",
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="apitap_wh_")},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
