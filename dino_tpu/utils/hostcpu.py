"""Host-CPU capability tag for machine-specific on-disk caches.

Two caches in this package store artifacts that are only valid on the CPU
that produced them: the ``-march=native`` C++ loader (.so, see
data/native_loader.py) and the persistent XLA compilation cache, whose
XLA:CPU entries are AOT executables compiled for the build host's exact ISA
feature set (loading one on a different CPU generation logs
"Machine type used for XLA:CPU compilation doesn't match ..." and can
SIGILL or mis-execute). Both caches key their path on this tag so a shared
checkout / home directory across heterogeneous hosts never reuses a
foreign-CPU artifact.

stdlib-only: imported from dino_tpu/__init__ before jax is configured.
"""
from __future__ import annotations

import hashlib
import os
import platform


def cpu_tag() -> str:
    """Hash of the host CPU's ISA flags (not hostname: containerized hosts
    often share hostname+machine across different CPU generations, which
    would collide the cache and reintroduce the SIGILL this tag exists to
    prevent)."""
    sig = platform.machine()
    got_flags = False
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    sig += " ".join(sorted(line.split(":", 1)[1].split()))
                    got_flags = True
                    break
    except OSError:
        pass
    if not got_flags:
        # no flags/Features line (non-Linux, or cpuinfo formats like
        # RISC-V 'isa'): fall back to per-host keying rather than letting
        # different CPU generations collide on one machine()-only slot
        sig += platform.node()
    return hashlib.md5(sig.encode()).hexdigest()[:8]


def compile_env_tag() -> str:
    """Cache key for the persistent XLA compilation cache: cpu_tag plus the
    env vars that change XLA:CPU codegen *on the same CPU*.

    XLA embeds compile-option pseudo-features (e.g. +prefer-no-scatter,
    +prefer-no-gather) in its AOT executables as machine features, and those
    options differ between runtime environments (a forced-host-CPU mesh vs a
    CPU fallback next to a TPU plugin).  Reusing an entry across environments
    makes every load log a 'machine type ... doesn't match' error.  Keying
    the cache dir on XLA_FLAGS / JAX_PLATFORMS keeps each environment's
    entries separate; within one environment the cache still hits."""
    sig = cpu_tag()
    for var in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME"):
        sig += f"|{var}={os.environ.get(var, '')}"
    return hashlib.md5(sig.encode()).hexdigest()[:8]
