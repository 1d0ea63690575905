"""Test config: force JAX onto a virtual 8-device CPU mesh.

The ambient environment pins JAX_PLATFORMS=axon (the tunneled TPU); tests
must run on host CPU — a single remote chip cannot serve many concurrent
test processes, and sharding tests need 8 virtual devices.  Overriding the
env var alone is NOT enough (the axon plugin re-registers itself), so we
also set jax.config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# smaller Pippenger windows on CPU: same code path, far cheaper compiles
os.environ.setdefault("ZEROCHAIN_MSM_C", "4")

import pathlib
import resource
import sys

# XLA's CPU compiler recurses deeply on the big witness/MSM graphs; the
# default 8 MB thread stack segfaults LLVM.  glibc samples RLIMIT_STACK for
# pthread defaults at process start, so raising it is only effective after
# a re-exec — done in pytest_configure below, where pytest's capture
# manager is available: exec'ing mid-capture would hand the child
# redirected fds pointing at the dead parent's temp files (all test
# output silently vanishes), so capture must be suspended first.


def pytest_configure(config):
    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    if soft == resource.RLIM_INFINITY or os.environ.get("_ZC_REEXEC"):
        return
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (hard, hard))
    except (ValueError, OSError):
        return
    os.environ["_ZC_REEXEC"] = "1"
    os.environ["PYTHONUNBUFFERED"] = "1"
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    os.execv(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]])

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
# 8 virtual CPU devices for the sharding tests.  NB: the old
# --xla_force_host_platform_device_count XLA flag is dead on jax 0.9.0;
# jax_num_cpu_devices is the working mechanism (must run pre-backend-init).
jax.config.update("jax_num_cpu_devices", 8)
# persistent compilation cache: limb-kernel graphs are expensive to compile.
# Key the cache dir by the host's CPU feature set — sessions migrate across
# heterogeneous machines, and loading an AOT result built for a CPU with
# different features SIGILLs (observed as random segfaults mid-suite).
import hashlib as _hl

try:
    _flags = ""
    for _line in open("/proc/cpuinfo"):
        if _line.startswith("flags"):
            _flags = _line
            break
    _cpu_tag = _hl.sha256(_flags.encode()).hexdigest()[:12]
except OSError:
    _cpu_tag = "generic"
jax.config.update(
    "jax_compilation_cache_dir", f"/root/repo/.jax_cache/cpu-{_cpu_tag}"
)
# Cache READS on, WRITES off by default: XLA:CPU intermittently segfaults
# inside executable.serialize() during jax's put_executable_and_time (seen
# at test_msm, then test_ntt — it follows whichever module needs a fresh
# big compile, so per-module shields are whack-a-mole).  The write gate
# consulted per compile is the min-compile-time threshold; the cache-dir
# config is latched at first use and cannot disable writes later.
# ZEROCHAIN_CACHE_WRITE=1 re-enables writes for an explicit (crash-prone)
# cache-warming run.
if os.environ.get("ZEROCHAIN_CACHE_WRITE"):
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
else:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)

VECTORS = pathlib.Path(__file__).parent / "vectors"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    The suite runs ~140 tests in one process; XLA:CPU keeps every
    compiled module resident, and late-suite LLVM compiles then segfault
    intermittently (observed at test_ntt inside the full suite; the same
    module passes alone in 38s).  Shapes are rarely shared across
    modules, so clearing costs little."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def vectors_dir():
    return VECTORS
