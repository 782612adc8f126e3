"""Test harness: force CPU with 8 virtual devices so sharding/pjit paths are
exercised without real multi-chip hardware (SURVEY.md §4 implication)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_PATH = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_PATH)


def load_reference_module(relpath: str, name: str):
    """Import a single module file from the read-only reference tree for
    golden behavioral comparison (never copied into this repo)."""
    import importlib.util

    path = os.path.join(REFERENCE_PATH, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
