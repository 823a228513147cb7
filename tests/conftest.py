"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session.

Kernel tests never touch Ray; stage/pipeline tests request ``ray_session``.
"""

import os

import pytest

# before ray.init: workers inherit the raylet's env — numpy's MADV_HUGEPAGE
# causes synchronous-THP-compaction storms (see liblevenshtein_rust_ray.__init__)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()
