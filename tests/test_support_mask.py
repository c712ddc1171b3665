"""The vectorized per-tile Pallas eligibility mask must equal the scalar
specification (`_instance_supported`) instance-for-instance — the
vectorized path is what production runs (the scalar loop was ~400 ms/frame
on 4K scenes)."""
import numpy as np

from webrender_tpu.frame.gpu import (CLIP_STRIDE, INST_CLIP_ADDR,
                                     INST_CLIP_COUNT, INST_FIELDS, INST_KIND,
                                     INST_PRIM_ADDR, INST_SPATIAL)
from webrender_tpu.ops.pallas.tile_raster import (_instance_supported,
                                                  _supported_vec,
                                                  pallas_supported_mask)


def _random_frame(rng, n_inst=64, n_nodes=6, nbuf=8192):
    f32 = rng.uniform(-4, 4, nbuf).astype(np.float32)
    # scatter plausible clip-kind values into the stride-14 slots
    for base in range(0, nbuf - CLIP_STRIDE, CLIP_STRIDE):
        f32[base + 14] = rng.choice([0.0, 1.0, 2.0, 3.0, 4.0])
        if rng.rand() < 0.5:  # axis-aligned clip transform rows
            f32[base + 96:base + 108] = 0.0
            f32[base + 96] = 1.0
            f32[base + 100] = 1.0
            f32[base + 104] = 1.0
    transforms = rng.uniform(-2, 2, (n_nodes, 12)).astype(np.float32)
    transforms[0] = [1, 0, 0, 0, 1, 0, 0, 0, 1, 1, 1, 0]  # identity
    transforms[1] = [2, 0, 0, 0, 2, 0, 0, 0, 1, 2, 2, 0]  # axis-aligned
    inst = np.zeros((n_inst, INST_FIELDS), np.int32)
    inst[:, INST_KIND] = rng.randint(0, 13, n_inst)
    inst[:, INST_SPATIAL] = rng.randint(0, n_nodes, n_inst)
    inst[:, INST_PRIM_ADDR] = rng.randint(0, nbuf - 64, n_inst)
    inst[:, INST_CLIP_ADDR] = (rng.randint(0, (nbuf - 4 * CLIP_STRIDE)
                                           // CLIP_STRIDE, n_inst)
                               * CLIP_STRIDE)
    inst[:, INST_CLIP_COUNT] = rng.randint(0, 4, n_inst)
    return f32, transforms, inst


def test_supported_vec_matches_scalar_spec():
    rng = np.random.RandomState(0)
    for trial in range(8):
        f32, transforms, inst = _random_frame(rng)
        vec = _supported_vec(inst, transforms, f32)
        ref = np.array([_instance_supported(inst[i], transforms, f32)
                        for i in range(inst.shape[0])])
        assert np.array_equal(vec, ref), \
            (trial, np.nonzero(vec != ref)[0][:10])


def test_tile_mask_folds_per_slot():
    rng = np.random.RandomState(1)
    f32, transforms, inst = _random_frame(rng)
    ok = _supported_vec(inst, transforms, f32)
    nt, slots = 7, 5
    tiles = rng.randint(-1, inst.shape[0], (nt, slots))
    mask = pallas_supported_mask(inst, tiles, transforms, f32)
    for t in range(nt):
        want = all(ok[i] for i in tiles[t] if i >= 0)
        assert mask[t] == want
