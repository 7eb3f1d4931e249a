"""Make ``toyslam_tpu`` importable when scripts run from a source checkout.

No-op when the package is installed (pyproject.toml); otherwise falls back
to the repo root.  Scripts just ``import _bootstrap`` (the script's own
directory is always on ``sys.path`` when invoked as ``python scripts/x.py``).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

try:
    import toyslam_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, REPO)

# Persistent XLA compilation cache: on the remote-TPU ('axon') platform
# every fresh process pays a remote compile (and the compile helper is the
# flakiest link in the chain — observed multi-minute stalls); with the
# disk cache a program compiles once per HLO and every later process loads
# the serialized executable locally.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
