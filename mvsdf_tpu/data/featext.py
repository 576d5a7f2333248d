"""Frozen VisMVSNet feature-extractor CNN (2-enc/1-dec residual U-Net),
functional JAX implementation.

Architecture parity target: ``code/utils/my_utils.py:530-708`` (BasicBlock /
UNet / FeatExt): 5x5 stride-2 stem -> encoder [32, 64, 128] (stride 1/2/2,
2 residual blocks each) -> 2 decoder stages (deconv + concat-skip + conv +
1 residual block) -> three 32-channel heads at 1/8, 1/4, 1/2 of the input
resolution. Only head [2] (half-res) is consumed by the dataset
(``scene_dataset.py:147``).

The network is inference-only (features are precomputed once per scene and
frozen, ``scene_dataset.py:138-149``); BatchNorm uses running statistics.
The pretrained weights come from the released ``vismvsnet.pt`` via
``load_torch_state`` (the blob is absent from this repo's reference mount —
``.MISSING_LARGE_BLOBS``; random init is provided for bring-up/tests and the
converter is exercised against a torch-built reference in the golden tests).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

BN_EPS = 1e-5
FILTERS = (32, 64, 128)


# ---------------------------------------------------------------------------
# primitives (NCHW, OIHW)
# ---------------------------------------------------------------------------

def conv2d(x, w, stride=1):
    """torch Conv2d(k, stride, padding=k//2) semantics: explicit symmetric
    padding (XLA "SAME" pads (0,1) at stride 2, torch pads (1,1))."""
    k = w.shape[-1]
    p = k // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=((p, p), (p, p)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def deconv2d(x, w, stride=2):
    """torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1): exact spatial
    doubling. w is torch-layout (in, out, kh, kw); implemented as an
    input-dilated correlation with the spatially-flipped kernel and padding
    (k-1-p, k-1-p+output_padding) = (1, 2)."""
    wt = jnp.flip(jnp.swapaxes(w, 0, 1), axis=(-2, -1))  # (out, in, kh, kw)
    return jax.lax.conv_general_dilated(
        x, wt, window_strides=(1, 1), padding=((1, 2), (1, 2)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def batchnorm(x, p):
    """Eval-mode BN with running stats; p: gamma/beta/mean/var (C,)."""
    shape = (1, -1, 1, 1)
    inv = jax.lax.rsqrt(p["var"].reshape(shape) + BN_EPS)
    return (x - p["mean"].reshape(shape)) * inv * \
        p["gamma"].reshape(shape) + p["beta"].reshape(shape)


def basic_block(x, p, stride=1):
    """Residual block (ref my_utils.py:530-578)."""
    out = conv2d(x, p["conv1"], stride)
    out = jax.nn.relu(batchnorm(out, p["bn1"]))
    out = batchnorm(conv2d(out, p["conv2"], 1), p["bn2"])
    if "down_conv" in p:
        res = batchnorm(conv2d(x, p["down_conv"], stride), p["down_bn"])
    else:
        res = x
    return jax.nn.relu(out + res)


def res_layer(x, p_blocks, stride):
    """_make_layer: first block carries the stride/downsample
    (ref my_utils.py:581-598)."""
    x = basic_block(x, p_blocks[0], stride)
    for p in p_blocks[1:]:
        x = basic_block(x, p, 1)
    return x


# ---------------------------------------------------------------------------
# FeatExt
# ---------------------------------------------------------------------------

def feat_ext_apply(params, x):
    """x (N, 3, H, W) ImageNet-normalized -> (f8, f4, f2), 32 channels each
    at 1/8, 1/4, 1/2 resolution (ref my_utils.py:705-708)."""
    out = conv2d(x, params["stem_conv"], 2)
    out = jax.nn.relu(batchnorm(out, params["stem_bn"]))

    enc_out = []
    for i, blocks in enumerate(params["enc"]):
        out = res_layer(out, blocks, 1 if i == 0 else 2)
        enc_out.append(out)

    dec_out = [out]
    for i, dec in enumerate(params["dec"]):
        out = deconv2d(out, dec["deconv"])
        out = jnp.concatenate([out, enc_out[-2 - i]], axis=1)
        out = conv2d(out, dec["post"], 1)
        out = res_layer(out, dec["res"], 1)
        dec_out.append(out)

    f8 = conv2d(dec_out[0], params["head1"], 1)
    f4 = conv2d(dec_out[1], params["head2"], 1)
    f2 = conv2d(dec_out[2], params["head3"], 1)
    return f8, f4, f2


def _bn_init(c, rng):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,)),
            "mean": jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32),
            "var": jnp.ones((c,))}


def _conv_init(rng, cout, cin, k):
    fan_in = cin * k * k
    bound = np.sqrt(1.0 / fan_in)
    return jnp.asarray(rng.uniform(-bound, bound, (cout, cin, k, k)),
                       jnp.float32)


def _block_init(rng, cin, cout, stride):
    p = {"conv1": _conv_init(rng, cout, cin, 3), "bn1": _bn_init(cout, rng),
         "conv2": _conv_init(rng, cout, cout, 3), "bn2": _bn_init(cout, rng)}
    if stride != 1 or cin != cout:
        p["down_conv"] = _conv_init(rng, cout, cin, 1)
        p["down_bn"] = _bn_init(cout, rng)
    return p


def init_feat_ext(rng: np.random.Generator):
    """Random-init params with the exact pretrained topology (for bring-up
    and converter tests; real use loads vismvsnet.pt)."""
    params = {
        "stem_conv": _conv_init(rng, 16, 3, 5),
        "stem_bn": _bn_init(16, rng),
    }
    enc = []
    prev = 16
    for i, f in enumerate(FILTERS):
        stride = 1 if i == 0 else 2
        enc.append([_block_init(rng, prev, f, stride),
                    _block_init(rng, f, f, 1)])
        prev = f
    params["enc"] = enc
    dec = []
    for f in FILTERS[-2::-1]:
        dec.append({
            # torch ConvTranspose2d weight layout: (in, out, kh, kw)
            "deconv": jnp.asarray(
                rng.uniform(-0.05, 0.05, (prev, f, 3, 3)), jnp.float32),
            "post": _conv_init(rng, f, 2 * f, 3),
            "res": [_block_init(rng, f, f, 1)],
        })
        prev = f
    params["dec"] = dec
    params["head1"] = _conv_init(rng, 32, 128, 3)
    params["head2"] = _conv_init(rng, 32, 64, 3)
    params["head3"] = _conv_init(rng, 32, 32, 3)
    return params


# ---------------------------------------------------------------------------
# torch weight conversion
# ---------------------------------------------------------------------------

def _t(a):
    return jnp.asarray(np.asarray(a, dtype=np.float32))


def _bn_from(sd, prefix):
    return {"gamma": _t(sd[prefix + ".weight"]),
            "beta": _t(sd[prefix + ".bias"]),
            "mean": _t(sd[prefix + ".running_mean"]),
            "var": _t(sd[prefix + ".running_var"])}


def _block_from(sd, prefix):
    p = {"conv1": _t(sd[prefix + ".conv1.weight"]),
         "bn1": _bn_from(sd, prefix + ".bn1"),
         "conv2": _t(sd[prefix + ".conv2.weight"]),
         "bn2": _bn_from(sd, prefix + ".bn2")}
    if prefix + ".downsample.0.weight" in sd:
        p["down_conv"] = _t(sd[prefix + ".downsample.0.weight"])
        p["down_bn"] = _bn_from(sd, prefix + ".downsample.1")
    return p


def from_torch_state(sd: dict):
    """Convert a FeatExt state dict (keys relative to the FeatExt module,
    e.g. 'init_conv.0.weight', 'unet.enc_blocks.2d2_0.0.conv1.weight')."""
    params = {
        "stem_conv": _t(sd["init_conv.0.weight"]),
        "stem_bn": _bn_from(sd, "init_conv.1"),
    }
    # UNet block names: enc '2d{scale}_{idx}' with scale 2,4,8 / idx 0,1,2;
    # dec '2d{scale}_{idx}' with scale 16,8 / idx 3,4 (my_utils.py:616-648).
    enc_names = ["2d2_0", "2d4_1", "2d8_2"]
    params["enc"] = [
        [_block_from(sd, f"unet.enc_blocks.{n}.{b}") for b in range(2)]
        for n in enc_names]
    dec_names = ["2d16_3", "2d8_4"]
    params["dec"] = [{
        "deconv": _t(sd[f"unet.dec_blocks.{n}.0.weight"]),
        "post": _t(sd[f"unet.dec_blocks.{n}.1.weight"]),
        "res": [_block_from(sd, f"unet.dec_blocks.{n}.2.0")],
    } for n in dec_names]
    params["head1"] = _t(sd["final_conv_1.weight"])
    params["head2"] = _t(sd["final_conv_2.weight"])
    params["head3"] = _t(sd["final_conv_3.weight"])
    return params


def load_torch_checkpoint(path: str):
    """Load vismvsnet.pt (full VisMVSNet checkpoint) and extract the
    feat_ext weights (ref my_utils.py:702)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    sub = {k[len("module.feat_ext."):]: v.numpy()
           for k, v in sd.items() if k.startswith("module.feat_ext.")}
    if not sub:
        sub = {k: np.asarray(v) for k, v in sd.items()}
    return from_torch_state(sub)


def extract_features(params, images, batch: int = 20):
    """images (N, 3, H, W) ImageNet-normalized -> half-res 32-ch features
    (N, 32, H//2, W//2) (head [2]; ref scene_dataset.py:138-149)."""
    outs = []
    for i in range(0, images.shape[0], batch):
        outs.append(feat_ext_apply(params, images[i:i + batch])[2])
    return jnp.concatenate(outs, axis=0)
