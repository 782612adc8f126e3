"""Test harness: force CPU with 8 virtual devices so sharding/pjit paths are
exercised without real multi-chip hardware (SURVEY.md §4 implication)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU harness pins JAX_PLATFORMS=axon and ignores the env override,
# so force the platform through the config API (must run before any backend
# initialization).
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NOTE: the persistent compilation cache is NOT used on the CPU backend at
# all anymore — both the write path (zstandard serialization) and the READ
# path (compilation_cache.get_executable_and_time deserializing
# machine-feature-mismatched XLA:CPU AOT entries) intermittently segfault
# on this host, killing whole suite runs mid-flight. setup_jax() now
# disables the cache whenever the platform is cpu (utils/jax_setup.py), so
# entry modules imported by tests cannot re-enable it behind our back.
# Opt back in with LZT_TEST_CACHE=1 + LZT_FORCE_CPU_CACHE=1 at your own risk.
if os.environ.get("LZT_TEST_CACHE", "0") == "1":
    from lightzero_tpu.utils.jax_setup import setup_jax  # noqa: E402

    setup_jax(os.path.expanduser("~/.cache/lightzero_tpu_jax_tests"))

REFERENCE_PATH = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_PATH)


def load_reference_module(relpath: str, name: str = ""):
    """Import a single module file from the read-only reference tree for
    golden behavioral comparison (never copied into this repo). A synthetic
    parent package is registered so the module's relative imports resolve."""
    import importlib.util
    import types

    path = os.path.join(REFERENCE_PATH, relpath)
    pkg_name = "refpkg_" + os.path.dirname(relpath).replace("/", "_").replace(".", "_")
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [os.path.dirname(path)]
        sys.modules[pkg_name] = pkg
    mod_name = pkg_name + "." + os.path.splitext(os.path.basename(path))[0]
    if mod_name in sys.modules:
        return sys.modules[mod_name]
    spec = importlib.util.spec_from_file_location(mod_name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod
