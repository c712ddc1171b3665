"""Native C++ span rasterizer == numpy oracle, bit-exact.

The native rasterizer (native/span_raster.cpp) is both the swgl-class CPU
baseline for bench.py and an accelerated oracle; its interior-span fast
paths (opaque fills, translucent solid spans, coverage/clip-skipping
interior runs, rounded-clip inset folding, shared-coords sample_rgba)
must not change a single pixel vs the pure-numpy reference
(`swgl`'s determinism contract, ci-scripts/linux-release-tests.sh:28)."""
import numpy as np
import pytest

from webrender_tpu.oracle import native


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_matches_numpy_oracle():
    import sys
    sys.argv = ["test"]
    from bench import build_4k_scene

    # small but fully mixed: solids (opaque + translucent spans), gradients,
    # images (scaled + repeating), text, rounded clip, scroll frame
    backend = build_4k_scene(w=640, h=400, n_rects=60, n_grads=16,
                             n_images=12, n_text=8)
    frame = backend.build_frame()
    backend.renderer.apply_uploads(backend.resources.take_uploads())
    from webrender_tpu.oracle.sw import SoftwareRenderer
    sw_np = SoftwareRenderer(backend.renderer.color_atlas_host,
                             backend.renderer.alpha_atlas_host)
    sw_nat = SoftwareRenderer(backend.renderer.color_atlas_host,
                              backend.renderer.alpha_atlas_host,
                              use_native=True)
    a = sw_np.render(frame)
    b = sw_nat.render(frame)
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.max() == 0, f"native diverges: max {diff.max()}"


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_pack_rgba8_matches_numpy():
    rng = np.random.RandomState(0)
    fb = rng.rand(4, 33, 57).astype(np.float32) * 1.2 - 0.1
    fb[0, 0, 0] = np.nan
    got = native.pack_rgba8(fb)
    v = np.transpose(fb, (1, 2, 0)).astype(np.float64) * 255.0
    want = np.clip(np.floor(np.nan_to_num(v) + 0.5), 0, 255).astype(np.uint8)
    assert (got == want).all()
