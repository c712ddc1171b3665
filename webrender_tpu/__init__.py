"""webrender_tpu — a TPU-native 2D rendering framework with the capabilities
of servo/webrender (see SURVEY.md for the reference's structural map).

Pipeline: DisplayListBuilder → Transaction → scene build (flatten, spatial
tree, clips, pictures) → frame build (visibility, prepare, tile binning,
fixed-shape instance arrays) → TPU raster (Pallas/XLA kernels over an
HBM-resident framebuffer and texture atlas) → composite.
"""

__version__ = "0.1.0"

# Persistent XLA/Mosaic compilation cache: raster kernel variants are
# per-(shape, feature-set) and the remote TPU compile service is slow;
# caching makes reftest/bench runs usable across processes.
import os as _os

try:
    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ.get("WRTPU_JAX_CACHE",
                                       "/tmp/wrtpu_jax_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 4.0)
except Exception:  # noqa: BLE001 — cache is best-effort
    pass
