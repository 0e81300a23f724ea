"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes its backends.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin (if present) overrides JAX_PLATFORMS with "axon,cpu";
# force CPU through the config API before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def import_reference_module(name: str):
    """Import a module from the reference tree (oracle for parity tests).

    Stubs out optional deps the reference imports but this image lacks
    (blobfile), and keeps sys.path/module namespace clean.
    """
    import importlib
    import importlib.machinery
    import types

    if "blobfile" not in sys.modules:
        stub = types.ModuleType("blobfile")
        # give the stub a real spec so importlib.util.find_spec (used by
        # transformers' dependency probing) doesn't raise
        stub.__spec__ = importlib.machinery.ModuleSpec("blobfile", None)
        sys.modules["blobfile"] = stub

    sys.path.insert(0, REFERENCE_DIR)
    try:
        mod = sys.modules.get(f"_ref_{name}")
        if mod is None:
            spec = importlib.util.spec_from_file_location(
                f"_ref_{name}", os.path.join(REFERENCE_DIR, f"{name}.py"))
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"_ref_{name}"] = mod
            spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(REFERENCE_DIR)
