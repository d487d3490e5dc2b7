"""C++ data-path kernels vs numpy reference."""
import subprocess
import os

import numpy as np
import pytest

from waldo_tpu.data import native


@pytest.fixture(scope="module", autouse=True)
def build():
    if not native.available():
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(["bash", os.path.join(root, "scripts", "build_native.sh")],
                       check=True)
    assert native.available()


def test_layout_onehot_resize_matches_numpy():
    rng = np.random.RandomState(0)
    lyt = rng.randint(0, 8, (20, 40)).astype(np.int32)
    remap = [7, 3]
    out = native.layout_onehot_resize(lyt, 6, remap, top=2, left=4, ch=16, cw=32,
                                      out_h=8, out_w=16)
    assert out.shape == (8, 16, 6)
    # identity-size path (crop only, no resize) must be exact one-hot*10-5
    out2 = native.layout_onehot_resize(lyt, 6, remap, top=0, left=0, ch=20, cw=40,
                                       out_h=20, out_w=40)
    l2 = np.where(lyt == 7, 3, lyt)
    ref = np.zeros((20, 40, 6), np.float32)
    valid = l2 < 6
    np.put_along_axis(ref, np.clip(l2, 0, 5)[..., None], valid[..., None].astype(np.float32), -1)
    assert np.allclose(out2, 5 * (2 * ref - 1))


def test_flow_normalize_resize_matches_numpy():
    rng = np.random.RandomState(1)
    flow = rng.randn(16, 32, 2).astype(np.float32)
    out = native.flow_normalize_resize(flow, zoom=1.2, flip_x=True, flip_y=False,
                                       top=0, left=0, ch=16, cw=32, out_h=16, out_w=32)
    ref = flow * 1.2
    ref[..., 0] = -ref[..., 0]
    ref[..., 0] = 2 * ref[..., 0] / 32
    ref[..., 1] = 2 * ref[..., 1] / 16
    ref = ref[:, ::-1]
    assert np.allclose(out, ref, atol=1e-6), np.abs(out - ref).max()


def test_rgb_transform_matches_numpy():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (20, 30, 3)).astype(np.uint8)
    out = native.rgb_transform(img, top=0, left=0, ch=20, cw=30, out_h=20, out_w=30)
    ref = img.astype(np.float32) / 255 * 2 - 1
    assert np.allclose(out, ref, atol=1e-6)


def test_rgb_resize_matches_torch_bilinear():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    out = native.rgb_transform(img, top=0, left=0, ch=16, cw=24, out_h=8, out_w=12)
    x = torch.from_numpy(img.astype(np.float32) / 255).permute(2, 0, 1)[None]
    ref = F.interpolate(x, (8, 12), mode="bilinear").permute(0, 2, 3, 1)[0].numpy() * 2 - 1
    assert np.allclose(out, ref, atol=1e-5), np.abs(out - ref).max()
