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
