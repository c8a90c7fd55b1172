"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host devices (the driver separately dry-runs the multi-chip path
via __graft_entry__.dryrun_multichip).
"""

import os
import subprocess
from pathlib import Path

# force CPU: the environment pins JAX_PLATFORMS=axon (real TPU via tunnel),
# which is wrong for tests — every op would round-trip the tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# the axon sitecustomize's register() forces jax_platforms="axon,cpu" at
# interpreter start, overriding the env var — force it back to cpu-only
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: scan-heavy codec kernels are expensive to compile
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
_HARNESS_SRC = REPO / "tests" / "cross_check" / "ref_codec_harness.cpp"
_HARNESS_BIN = REPO / "tests" / "cross_check" / "ref_codec_harness"


@pytest.fixture(scope="session")
def ref_codec_harness():
    """Path to the compiled reference-codec harness, or skip if the read-only
    reference checkout is unavailable."""
    if not REFERENCE.exists():
        pytest.skip("reference checkout not available")
    if not _HARNESS_BIN.exists() or _HARNESS_BIN.stat().st_mtime < _HARNESS_SRC.stat().st_mtime:
        subprocess.run(
            [
                "g++", "-O2", "-std=c++17",
                f"-I{REFERENCE}",
                str(_HARNESS_SRC),
                str(REFERENCE / "custom_invlist_cpp" / "codec.cpp"),
                "-o", str(_HARNESS_BIN),
            ],
            check=True,
        )
    return _HARNESS_BIN
