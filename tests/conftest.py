from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (round 14, VERDICT r13 #1): the full suite grew
    past the driver's verify window (~36 min wall; the round-13 verify
    was cut at ~92% with zero failures). Tests marked ``slow`` — sink
    crash-recovery storms, streaming-vs-batch replays, media decode,
    amplification/scaling probes — are deselected by default and run
    with ``RUN_SLOW=1 python -m pytest tests/ -q`` (builders run the
    full suite and record it every round). Oracle-parity, plan audits
    and operator-correctness proofs all stay in the default tier."""
    if os.environ.get("RUN_SLOW"):
        return
    selected, deselected = [], []
    for item in items:
        (deselected if "slow" in item.keywords else selected).append(item)
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = selected


@pytest.fixture(scope="session")
def spark():
    from osmart_etl_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    return con
