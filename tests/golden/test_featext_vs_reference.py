"""Golden parity of the functional FeatExt U-Net vs the reference torch
architecture (my_utils.py:530-708). The pretrained vismvsnet.pt blob is
absent from the reference mount, so parity is checked structurally: build the
reference topology in torch, convert its random-initialized state dict, and
require identical outputs."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.golden.reference_harness import import_reference

import jax.numpy as jnp
from mvsdf_tpu.data import featext


@pytest.fixture(scope="module")
def torch_feat_ext():
    ref = import_reference()
    my = ref["my"]
    nn = torch.nn

    class TorchFeatExt(nn.Module):
        """FeatExt topology (my_utils.py:688-708) without the checkpoint
        load (the blob is missing from the mount)."""

        def __init__(self):
            super().__init__()
            self.init_conv = nn.Sequential(
                nn.Conv2d(3, 16, 5, 2, 2, bias=False),
                nn.BatchNorm2d(16), nn.ReLU())
            self.unet = my.UNet(16, 2, 1, 2, [], [32, 64, 128], [], "2d", 2)
            self.final_conv_1 = nn.Conv2d(128, 32, 3, 1, 1, bias=False)
            self.final_conv_2 = nn.Conv2d(64, 32, 3, 1, 1, bias=False)
            self.final_conv_3 = nn.Conv2d(32, 32, 3, 1, 1, bias=False)

        def forward(self, x):
            out = self.init_conv(x)
            o1, o2, o3 = self.unet(out, multi_scale=3)
            return (self.final_conv_1(o1), self.final_conv_2(o2),
                    self.final_conv_3(o3))

    torch.manual_seed(0)
    net = TorchFeatExt()
    # randomize BN running stats so eval-mode normalization is exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()
    return net


def test_feat_ext_output_parity(torch_feat_ext):
    sd = {k: v.numpy() for k, v in torch_feat_ext.state_dict().items()}
    params = featext.from_torch_state(sd)
    x = np.random.default_rng(1).normal(
        size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = torch_feat_ext(torch.from_numpy(x))
    ours = featext.feat_ext_apply(params, jnp.asarray(x))
    for i, (r, o) in enumerate(zip(ref_out, ours)):
        assert o.shape == tuple(r.shape), i
        np.testing.assert_allclose(np.asarray(o), r.numpy(),
                                   atol=1e-3, rtol=1e-3)


def test_feat_ext_shapes():
    params = featext.init_feat_ext(np.random.default_rng(0))
    x = jnp.zeros((1, 3, 96, 128))
    f8, f4, f2 = featext.feat_ext_apply(params, x)
    assert f8.shape == (1, 32, 12, 16)
    assert f4.shape == (1, 32, 24, 32)
    assert f2.shape == (1, 32, 48, 64)
