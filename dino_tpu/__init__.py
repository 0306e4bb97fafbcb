"""dino_tpu: TPU-native coarse-segmentation framework (DINO ViT backbone).

Public surface mirrors the reference package (dt_segmentation/__init__.py):
DINOSeg, DuckieSegDataset, parse_class_names.
"""
import os as _os


def _enable_persistent_compile_cache() -> None:
    """Opt-out persistent XLA compilation cache.

    TPU compiles of the fused predict/train programs cost seconds to minutes;
    caching them on disk makes every process after the first start instantly.
    Disable with DINO_TPU_NO_COMPILE_CACHE=1 or by setting
    JAX_COMPILATION_CACHE_DIR yourself.

    The directory is keyed per host-CPU capability AND per codegen
    environment (utils/hostcpu.compile_env_tag): XLA:CPU cache entries are
    AOT executables for the compiling host's exact ISA features *plus*
    compile-option pseudo-features set by the runtime environment, and
    loading one on a different CPU generation (shared home dir, migrated
    container) or under different XLA flags mis-executes, SIGILLs, or at
    minimum logs a loader error per entry.
    """
    if _os.environ.get("DINO_TPU_NO_COMPILE_CACHE") == "1":
        return
    # Enable the cache only when this process plausibly targets a TPU:
    # XLA:CPU compiles are cheap to redo, and this XLA version stamps
    # compile-option pseudo-features (+prefer-no-scatter/-gather) into every
    # CPU AOT entry that its own loader then reports as a machine-feature
    # mismatch on EVERY cache hit — one loader error line per program, even
    # on the machine that wrote it.  "Plausibly TPU" = the platform env
    # explicitly names a non-cpu backend, or (env unset) a TPU runtime is
    # importable — checking the env alone would leave the silent
    # no-accelerator CPU fallback spamming.  Set JAX_COMPILATION_CACHE_DIR
    # to force the cache on regardless (honored below).
    plats = (_os.environ.get("JAX_PLATFORMS")
             or _os.environ.get("JAX_PLATFORM_NAME") or "")
    first = plats.split(",")[0].strip().lower()
    if first == "cpu":
        return
    if not first:
        import importlib.util
        if (importlib.util.find_spec("libtpu") is None
                and importlib.util.find_spec("libtpu_nightly") is None):
            return
    try:
        import jax
        if _os.environ.get("JAX_COMPILATION_CACHE_DIR") is None:
            from dino_tpu.utils.hostcpu import compile_env_tag
            cache = _os.path.join(_os.path.expanduser("~"), ".cache",
                                  "dino_tpu", "xla_cache", compile_env_tag())
            _os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()


def _enable_debug_nans() -> None:
    """NaN sanitizer (SURVEY §5 'race detection/sanitizers' row): set
    DINO_TPU_DEBUG_NANS=1 to make any NaN-producing jitted op raise with the
    offending primitive — the functional-world equivalent of a data race
    detector for numerics."""
    if _os.environ.get("DINO_TPU_DEBUG_NANS") == "1":
        import jax
        jax.config.update("jax_debug_nans", True)


_enable_debug_nans()

from dino_tpu.api import DINOSeg  # noqa: E402
from dino_tpu.data.dataset import DuckieSegDataset  # noqa: E402
from dino_tpu.serving import (export_predict,  # noqa: E402
                              load_exported_predict)
from dino_tpu.utils.labels import parse_class_names  # noqa: E402

__version__ = "0.1.0"
__all__ = ["DINOSeg", "DuckieSegDataset", "parse_class_names",
           "export_predict", "load_exported_predict", "__version__"]
