"""Harness for loading the PyTorch reference implementation on CPU for golden
(numerical-parity) tests.

The reference code at /root/reference hard-codes ``.cuda()`` everywhere; we
patch tensor/module ``.cuda`` to be a no-op so it runs on the CPU build of
torch. The reference modules are imported read-only for comparison — no
reference code is vendored into this repo.
"""
import sys

REF_CODE = "/root/reference/code"

_patched = False


def _stub_missing_modules():
    """The reference imports skimage at module level (rend_util.py:3) but
    only uses it for image loading, which the golden tests never exercise.
    Provide a minimal stub when skimage isn't installed."""
    import types
    try:
        import skimage  # noqa
    except ModuleNotFoundError:
        stub = types.ModuleType("skimage")
        stub.img_as_float32 = lambda x: x
        sys.modules["skimage"] = stub
    # numpy >= 2 removed numpy.lib.function_base (reference loss.py:1 does an
    # unused `from numpy.lib.function_base import diff`).
    try:
        import numpy.lib.function_base  # noqa
    except ModuleNotFoundError:
        import numpy as np
        stub = types.ModuleType("numpy.lib.function_base")
        stub.diff = np.diff
        sys.modules["numpy.lib.function_base"] = stub


def patch_torch_cpu():
    global _patched
    if _patched:
        return
    _stub_missing_modules()
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _real_tensor_cls = torch.Tensor

    class _FakeCudaTensorFactory:
        def __call__(self, *args, **kwargs):
            return torch.FloatTensor(*args, **kwargs)

    if not hasattr(torch.cuda, "FloatTensor"):
        torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.is_available = lambda: False
    _patched = True


def import_reference():
    """Returns the reference `model` + `utils` packages (CPU-patched)."""
    patch_torch_cpu()
    if REF_CODE not in sys.path:
        sys.path.insert(0, REF_CODE)
    import model.implicit_differentiable_renderer as ref_idr  # noqa
    import model.ray_tracing as ref_rt  # noqa
    import model.sample_network as ref_sn  # noqa
    import model.loss as ref_loss  # noqa
    import model.conf as ref_conf  # noqa
    import utils.rend_util as ref_rend  # noqa
    import utils.my_utils as ref_my  # noqa
    return dict(idr=ref_idr, rt=ref_rt, sn=ref_sn, loss=ref_loss,
                conf=ref_conf, rend=ref_rend, my=ref_my)


def torch_implicit_to_params(net):
    """Convert a reference ImplicitNetwork's weight-norm state into our param
    pytree (list of dicts with v/g/b, v transposed to (d_in, d_out))."""
    import jax.numpy as jnp
    params = []
    l = 0
    while hasattr(net, f"lin{l}"):
        lin = getattr(net, f"lin{l}")
        sd = lin.state_dict()
        if "weight_g" in sd or "parametrizations.weight.original0" in sd:
            if "weight_g" in sd:
                g = sd["weight_g"].detach().numpy().reshape(-1)
                v = sd["weight_v"].detach().numpy()
            else:  # torch >= 2.1 parametrize API
                g = sd["parametrizations.weight.original0"].detach().numpy().reshape(-1)
                v = sd["parametrizations.weight.original1"].detach().numpy()
            params.append({
                "v": jnp.asarray(v.T),
                "g": jnp.asarray(g),
                "b": jnp.asarray(sd["bias"].detach().numpy()),
            })
        else:
            params.append({
                "w": jnp.asarray(sd["weight"].detach().numpy().T),
                "b": jnp.asarray(sd["bias"].detach().numpy()),
            })
        l += 1
    return params
