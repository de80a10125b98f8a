"""Test configuration: force JAX onto 8 virtual CPU devices.

This image's sitecustomize imports jax and registers the real-TPU 'axon'
backend in EVERY python process, so env vars alone are too late — we must
re-point the config and clear the backend cache before any test touches jax.
Multi-chip sharding is then validated on a host-CPU mesh via
--xla_force_host_platform_device_count per the JAX multi-device test recipe.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
try:
    jax.clear_backends()
except Exception:
    from jax._src import xla_bridge

    xla_bridge._clear_backends()

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is dominated by XLA compile time
# (~240 jitting tests x 1-9 s on this 1-CPU box); warm runs reuse the
# compiled executables.  Opt out with LLAVAMOD_TEST_NO_COMPILE_CACHE=1.
if not os.environ.get("LLAVAMOD_TEST_NO_COMPILE_CACHE"):
    _cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_compile_cache"))
    # Stale entries (written by a different jax/jaxlib build or an
    # interrupted writer) abort the CPU runtime at EXECUTION time with a
    # bare SIGABRT — seen as a silent "Fatal Python error: Aborted" inside
    # a metrics fetch.  Stamp the cache with the producing versions and
    # wipe it on mismatch.
    import shutil

    import jaxlib

    _stamp_path = os.path.join(_cache, "VERSION_STAMP")
    _dirty_path = os.path.join(_cache, "SESSION_DIRTY")
    # The stamp must also pin the HOST CPU: XLA:CPU AOT entries embed the
    # compile machine's feature set, and loading them on a different host
    # "could lead to execution errors such as SIGILL" (cpu_aot_loader) —
    # observed as wrong numerics / bare SIGABRTs when this repo's cache
    # travels between machines.  Hash /proc/cpuinfo's flags line.
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            _lines = f.readlines()
        # flags AND model name: XLA's prefer-no-gather/scatter tuning
        # depends on the detected CPU model, not just the feature flags
        _flags = "".join(ln for ln in _lines
                         if ln.startswith(("flags", "model name")))[:4096]
    except OSError:
        import platform

        _flags = platform.processor() + platform.machine()
    _cpu = hashlib.sha256(_flags.encode()).hexdigest()[:16]
    _stamp = f"jax={jax.__version__} jaxlib={jaxlib.__version__} cpu={_cpu}"
    try:
        with open(_stamp_path) as f:
            _ok = f.read().strip() == _stamp
    except OSError:
        _ok = False
    # a sentinel left behind means the previous session was killed mid-run
    # (e.g. by `timeout`) and may have truncated an entry mid-write
    if os.path.exists(_dirty_path):
        _ok = False
    if not _ok:
        shutil.rmtree(_cache, ignore_errors=True)
        os.makedirs(_cache, exist_ok=True)
        with open(_stamp_path, "w") as f:
            f.write(_stamp)
    with open(_dirty_path, "w") as f:
        f.write(str(os.getpid()))

    import atexit

    atexit.register(lambda: os.path.exists(_dirty_path)
                    and os.remove(_dirty_path))
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
