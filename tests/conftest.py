"""Test bootstrap: force an 8-virtual-device CPU JAX platform.

Multi-chip sharding tests run on virtual CPU devices per the standard JAX recipe;
the real TPU is exercised by bench.py, not the unit suite.
Must run before any `import jax` in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the TPU backend and
# forces jax_platforms="axon,cpu" regardless of the env var; override via config
# before any backend initialization.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the per-file pytest processes of
# tests/run_suite.sh recompile identical graphs every run; caching the big ones
# nearly halves heavy-file wall time (test_fused_decode 58s -> 32s warm).
# Entries are keyed by HLO hash, so edits can't serve stale code.
# Disable with MARS5_TEST_CACHE=0.
if os.environ.get("MARS5_TEST_CACHE", "1") == "1":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/mars5_test_xla_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# SURVEY §5.2 sanitizer config: MARS5_DEBUG_NANS=1 makes every jitted graph in
# the suite raise at the op that produced a NaN (jax re-runs it un-jitted to
# localize). Off by default — it disables most fusions and slows the suite.
if os.environ.get("MARS5_DEBUG_NANS", "0") == "1":
    jax.config.update("jax_debug_nans", True)

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# The PyTorch reference implementation (read-only) — used as a numerical oracle in
# parity tests. Its pure-torch modules (mars5.model, mars5.diffuser, mars5.samplers,
# mars5.minbpe) import fine without encodec/vocos/torchaudio.
REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_ROOT / "mars5").exists()


def add_reference_to_path():
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-geometry / multi-minute tests")
    config.addinivalue_line(
        "markers",
        "heavy: expensive coverage beyond the fast per-family core — run via "
        "tests/run_suite.sh --heavy (or plain pytest); the fast tier "
        "(run_suite.sh default, CI) deselects these to stay under 5 min")
