"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §7: multi-chip
sharding is validated on a virtual CPU mesh; real-TPU benchmarking happens
in bench.py, not in the test suite).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

# repo root on sys.path so `import x265_tpu` works without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the JAX_PLATFORMS env var is ignored when the axon TPU plugin is
# registered — force the CPU backend through the config (must run before
# the first backend initialization)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Test-suite default: --merange 8 (single-stage ME).  The production
# default (57) compiles reach-60 hierarchical-search programs whose CPU
# compile time would dominate the suite; the hierarchical path itself is
# covered explicitly by tests/test_me_range.py.  Tests that pass an
# explicit me_range are unaffected.
from x265_tpu.common.params import Params as _Params  # noqa: E402

_orig_params_init = _Params.__init__


def _test_params_init(self, *args, **kwargs):
    kwargs.setdefault("me_range", 8)
    # Adaptive B placement (default b-adapt 2, honored since round 5)
    # restructures mini-GOPs by content; the conformance suites assert
    # the FIXED patterns they were written for.  Adaptive placement is
    # covered explicitly by tests/test_badapt.py.
    kwargs.setdefault("b_adapt", 0)
    _orig_params_init(self, *args, **kwargs)


_Params.__init__ = _test_params_init
