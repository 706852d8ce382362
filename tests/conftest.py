from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

import ray

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "fixtures")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def unit_table():
    return pq.read_table(os.path.join(FIXDIR, "transcripts_unit.parquet"))


@pytest.fixture(scope="session")
def golden_path():
    return os.path.join(FIXDIR, "transcripts_golden.parquet")


@pytest.fixture(scope="session")
def golden_labeled():
    return pq.read_table(os.path.join(FIXDIR, "transcripts_golden_labeled.parquet"))
