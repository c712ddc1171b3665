"""webrender_tpu — a TPU-native 2D rendering framework with the capabilities
of servo/webrender (see SURVEY.md for the reference's structural map).

Pipeline: DisplayListBuilder → Transaction → scene build (flatten, spatial
tree, clips, pictures) → frame build (visibility, prepare, tile binning,
fixed-shape instance arrays) → TPU raster (Pallas/XLA kernels over an
HBM-resident framebuffer and texture atlas) → composite.
"""

__version__ = "0.1.0"
