"""Test bootstrap: force an 8-virtual-device CPU JAX platform.

Multi-chip sharding tests run on virtual CPU devices per the standard JAX recipe;
the real TPU is exercised by bench.py, not the unit suite.
Must run before any `import jax` in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

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
