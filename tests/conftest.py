from __future__ import annotations

import os

# MUST run before numpy is first imported anywhere: OpenBLAS threading
# changes GEMM reduction order (+-1 ulp), which would make the eager
# oracle (driver process) disagree with Spark's single-threaded Python
# workers on borderline probabilities.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

import pytest


@pytest.fixture(scope="session")
def spark():
    from uie_pytorch_spark.session import get_spark

    s = get_spark(app_name="uie-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
