"""Weight-layout conversion parity: torch layer -> converted flax -> same output."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

import flax.linen as nn

from coocc_tpu.nn.layers import BatchNorm, Conv2d, Conv3d
from coocc_tpu.train.convert_torch import (
    conv2d_w, conv3d_w, deconv2d_w, linear_w, spconv_w,
)


def test_conv2d_weight_layout(rng):
    tconv = tnn.Conv2d(3, 5, 3, stride=2, padding=1)
    x = rng.randn(1, 3, 8, 10).astype(np.float32)
    ref = tconv(torch.from_numpy(x)).detach().numpy()

    m = Conv2d(5, (3, 3), (2, 2), 1)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.asarray(x.transpose(0, 2, 3, 1)))
    variables = {"params": {"conv": {
        "kernel": jnp.asarray(conv2d_w(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}}
    got = np.asarray(m.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_conv3d_weight_layout(rng):
    tconv = tnn.Conv3d(2, 4, 3, stride=2, padding=1)
    x = rng.randn(1, 2, 6, 8, 4).astype(np.float32)
    ref = tconv(torch.from_numpy(x)).detach().numpy()

    m = Conv3d(4, (3, 3, 3), (2, 2, 2), 1)
    variables = {"params": {"conv": {
        "kernel": jnp.asarray(conv3d_w(tconv.weight.detach().numpy())),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}}
    got = np.asarray(m.apply(variables,
                             jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), ref,
                               rtol=1e-4, atol=1e-5)


def test_deconv2d_weight_layout(rng):
    tconv = tnn.ConvTranspose2d(3, 5, 2, stride=2, bias=False)
    x = rng.randn(1, 3, 4, 6).astype(np.float32)
    ref = tconv(torch.from_numpy(x)).detach().numpy()

    m = nn.ConvTranspose(features=5, kernel_size=(2, 2), strides=(2, 2),
                         padding="VALID", use_bias=False,
                         transpose_kernel=True)
    variables = {"params": {
        "kernel": jnp.asarray(deconv2d_w(tconv.weight.detach().numpy()))}}
    got = np.asarray(m.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_batchnorm_parity(rng):
    tbn = tnn.BatchNorm2d(6, eps=1e-5)
    tbn.eval()
    with torch.no_grad():
        tbn.running_mean.copy_(torch.from_numpy(rng.randn(6).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(
            np.abs(rng.randn(6)).astype(np.float32) + 0.5))
        tbn.weight.copy_(torch.from_numpy(rng.randn(6).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.randn(6).astype(np.float32)))
    x = rng.randn(2, 6, 4, 4).astype(np.float32)
    ref = tbn(torch.from_numpy(x)).detach().numpy()

    m = BatchNorm(use_running_average=True)
    variables = {
        "params": {"bn": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                          "bias": jnp.asarray(tbn.bias.detach().numpy())}},
        "batch_stats": {"bn": {
            "mean": jnp.asarray(tbn.running_mean.numpy()),
            "var": jnp.asarray(tbn.running_var.numpy())}},
    }
    got = np.asarray(m.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_linear_layout(rng):
    tl = tnn.Linear(7, 3)
    x = rng.randn(5, 7).astype(np.float32)
    ref = tl(torch.from_numpy(x)).detach().numpy()
    got = x @ linear_w(tl.weight.detach().numpy()) + tl.bias.detach().numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_spconv_layout_shapes():
    w1 = np.zeros((3, 3, 3, 4, 8))   # spconv1 [kz,ky,kx,I,O]
    assert spconv_w(w1).shape == (27, 4, 8)
    w2 = np.zeros((8, 3, 3, 3, 4))   # spconv2 [O,kz,ky,kx,I]
    assert spconv_w(w2).shape == (27, 4, 8)
    # tap transposition: element at (kz=0,ky=1,kx=2) must land at our tap
    # index (tx=2, ty=1, tz=0) = (2*3+1)*3+0 = 21
    w = np.zeros((3, 3, 3, 1, 1))
    w[0, 1, 2, 0, 0] = 7.0
    out = spconv_w(w)
    assert out[21, 0, 0] == 7.0
