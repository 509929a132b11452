"""Pure-NumPy kernel math shared by the Spark UDFs and the eager test
oracle. No Spark imports allowed in this subpackage — everything here
runs inside executor Python workers via Arrow batches."""

import ctypes
import glob
import os


def pin_blas_single_thread() -> None:
    """Force BLAS to one thread per process.

    Spark runs one Python worker per core; nested OpenBLAS threading
    oversubscribes the box (and changes GEMM reduction order, breaking
    float determinism vs the eager oracle). Env vars only work BEFORE
    numpy first loads, which we can't guarantee inside a Spark worker
    (pyspark may import pandas/numpy first), so also flip the runtime
    switch on the already-loaded OpenBLAS via ctypes — best effort."""
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    try:
        import numpy as np

        libs_dir = os.path.join(os.path.dirname(np.__file__), "..", "numpy.libs")
        for so in glob.glob(os.path.join(libs_dir, "libscipy_openblas*.so*")) + glob.glob(
            os.path.join(libs_dir, "libopenblas*.so*")
        ):
            try:
                lib = ctypes.CDLL(so)
                for fn in (
                    "openblas_set_num_threads64_",  # ILP64 build (numpy wheels)
                    "openblas_set_num_threads",
                    "scipy_openblas_set_num_threads",
                ):
                    if hasattr(lib, fn):
                        getattr(lib, fn)(1)
                        return
            except OSError:
                continue
    except Exception:
        pass


pin_blas_single_thread()
