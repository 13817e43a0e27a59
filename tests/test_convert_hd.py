"""SparseEncoderHD converter: name-map structural parity with a flax init.

spconv isn't installed, so numerics of the sparse engine are covered by the
oracle tests (tests/test_sparse_conv.py) and the tap-order layout by
tests/test_convert.py::test_spconv_layout_shapes; this test certifies that
convert_sparse_encoder_hd produces EXACTLY the parameter tree that
nn.sparse_encoder_hd.SparseEncoderHD initializes — every leaf present, same
shape, nothing extra."""
import numpy as np
import jax
import jax.numpy as jnp

from coocc_tpu.nn.sparse_encoder_hd import SparseEncoderHD
from coocc_tpu.ops.sparse_conv import SparseTensor
from coocc_tpu.train.convert_torch import (ParamTreeBuilder,
                                           convert_sparse_encoder_hd)


def _leaf_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_leaf_shapes(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


def test_hd_converter_tree_matches_init(rng):
    chans = ((4, 8), (8, 8))
    mod = SparseEncoderHD(in_channels=3, base_channels=4, output_channels=8,
                          sparse_shape_xyz=(16, 16, 9),
                          encoder_channels=chans,
                          strided_paddings=((1, 1, 1),),
                          encoder_strides=(2, 1), capacity=64)
    ids = jnp.arange(64, dtype=jnp.int32)[None]
    sp = SparseTensor(ids=ids,
                      features=jnp.asarray(rng.randn(1, 64, 3),
                                           jnp.float32),
                      mask=jnp.ones((1, 64), bool))
    variables = mod.init(jax.random.PRNGKey(0), sp, train=False)
    want_p = _leaf_shapes(variables["params"])
    want_s = _leaf_shapes(variables["batch_stats"])

    # synth a torch-style state_dict with the reference key names; spconv1
    # stores [kz, ky, kx, I, O]
    sd = {}

    def spw(k, cin, cout):
        sd[f"m.{k}.weight"] = rng.randn(3, 3, 3, cin, cout).astype("f4") \
            if cout != -1 else None

    def bn(k, c):
        sd[f"m.{k}.weight"] = np.ones(c, "f4")
        sd[f"m.{k}.bias"] = np.zeros(c, "f4")
        sd[f"m.{k}.running_mean"] = np.zeros(c, "f4")
        sd[f"m.{k}.running_var"] = np.ones(c, "f4")

    spw("conv_input.0", 3, 4)
    bn("conv_input.1", 4)
    # stage 0: block0 basic(4), block1 strided 4->8
    for cj in ("conv1", "conv2"):
        sd[f"m.encoder_layers.encoder_layer1.0.{cj}.weight"] = \
            rng.randn(3, 3, 3, 4, 4).astype("f4")
    bn("encoder_layers.encoder_layer1.0.norm1", 4)
    bn("encoder_layers.encoder_layer1.0.norm2", 4)
    sd["m.encoder_layers.encoder_layer1.1.0.weight"] = \
        rng.randn(3, 3, 3, 4, 8).astype("f4")
    bn("encoder_layers.encoder_layer1.1.1", 8)
    # stage 1 (final): two basic blocks at 8
    for j in range(2):
        for cj in ("conv1", "conv2"):
            sd[f"m.encoder_layers.encoder_layer2.{j}.{cj}.weight"] = \
                rng.randn(3, 3, 3, 8, 8).astype("f4")
        bn(f"encoder_layers.encoder_layer2.{j}.norm1", 8)
        bn(f"encoder_layers.encoder_layer2.{j}.norm2", 8)
    sd["m.conv_out.0.weight"] = rng.randn(1, 1, 1, 8, 8).astype("f4")
    bn("conv_out.1", 8)

    b = ParamTreeBuilder()
    convert_sparse_encoder_hd(b, sd, "m", "m", encoder_channels=chans)
    got_p = _leaf_shapes(b.params["m"])
    got_s = _leaf_shapes(b.batch_stats["m"])
    assert got_p == want_p, (
        f"missing: {sorted(set(want_p) - set(got_p))}\n"
        f"extra: {sorted(set(got_p) - set(want_p))}\n"
        f"shape diffs: {[(k, got_p[k], want_p[k]) for k in got_p if k in want_p and got_p[k] != want_p[k]]}")
    assert got_s == want_s
