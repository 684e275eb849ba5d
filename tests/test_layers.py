"""Primitive op numerics vs straightforward numpy oracles."""

import jax.numpy as jnp
import numpy as np

from yolo_tensorflow_tpu.ops import layers as L


def test_leaky_relu():
    x = jnp.array([-2.0, -0.5, 0.0, 3.0])
    np.testing.assert_allclose(L.leaky_relu(x), [-0.2, -0.05, 0.0, 3.0],
                               atol=1e-7)


def _conv_ref(x, w, b, stride, pad):
    """Direct numpy convolution oracle (NHWC, HWIO)."""
    bsz, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (wd + 2 * pad - kw) // stride + 1
    out = np.zeros((bsz, oh, ow, cout), np.float32)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, i * stride:i * stride + kh, j * stride:j * stride + kw, :]
            out[:, i, j, :] = np.tensordot(patch, w, axes=([1, 2, 3], [0, 1, 2]))
    return out + b


def test_conv2d_matches_numpy(rng):
    x = rng.standard_normal((2, 9, 9, 4), dtype=np.float32)
    w = rng.standard_normal((3, 3, 4, 6), dtype=np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    for stride in (1, 2):
        got = np.asarray(L.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                  stride=stride))
        want = _conv_ref(x, w, b, stride, pad=1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_maxpool_valid(rng):
    x = rng.standard_normal((1, 4, 4, 2), dtype=np.float32)
    got = np.asarray(L.max_pool(jnp.asarray(x), 2, 2))
    want = x.reshape(1, 2, 2, 2, 2, 2).max(axis=(2, 4))
    np.testing.assert_allclose(got, want)


def test_maxpool_stride1_same(rng):
    # the tiny models' pool6: size 2, stride 1, SAME end-pad
    x = rng.standard_normal((1, 3, 3, 1), dtype=np.float32)
    got = np.asarray(L.max_pool(jnp.asarray(x), 2, 1))
    assert got.shape == (1, 3, 3, 1)
    xp = np.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=-np.inf)
    want = np.zeros_like(x)
    for i in range(3):
        for j in range(3):
            want[0, i, j, 0] = xp[0, i:i + 2, j:j + 2, 0].max()
    np.testing.assert_allclose(got, want)


def test_space_to_depth_tf_order(rng):
    # out[b,i,j,(di*2+dj)*C + c] = in[b, 2i+di, 2j+dj, c]
    x = rng.standard_normal((1, 4, 4, 3), dtype=np.float32)
    got = np.asarray(L.space_to_depth(jnp.asarray(x), 2))
    assert got.shape == (1, 2, 2, 12)
    for i in range(2):
        for j in range(2):
            for di in range(2):
                for dj in range(2):
                    for c in range(3):
                        assert got[0, i, j, (di * 2 + dj) * 3 + c] == \
                            x[0, 2 * i + di, 2 * j + dj, c]


def test_upsample_nearest(rng):
    x = rng.standard_normal((1, 2, 2, 3), dtype=np.float32)
    got = np.asarray(L.upsample_nearest(jnp.asarray(x)))
    want = x.repeat(2, axis=1).repeat(2, axis=2)
    np.testing.assert_allclose(got, want)


def test_bn_inference_matches_fold(rng):
    from yolo_tensorflow_tpu.io.weights import fold_bn
    x = rng.standard_normal((1, 5, 5, 4), dtype=np.float32)
    w = rng.standard_normal((3, 3, 4, 8), dtype=np.float32)
    gamma = rng.standard_normal(8).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32)
    mean = rng.standard_normal(8).astype(np.float32)
    var = rng.random(8).astype(np.float32) + 0.1
    eps = 1e-5
    y1 = L.batch_norm_inference(
        L.conv2d(jnp.asarray(x), jnp.asarray(w)), gamma, beta, mean, var, eps,
        formula="tf")
    wf, bf = fold_bn(w, gamma, beta, mean, var, eps, formula="tf")
    y2 = L.conv2d(jnp.asarray(x), jnp.asarray(wf), jnp.asarray(bf))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-3,
                               atol=1e-3)


def test_transpose_flatten():
    x = jnp.arange(1 * 2 * 2 * 3).reshape(1, 2, 2, 3).astype(jnp.float32)
    got = np.asarray(L.transpose_flatten(x))
    want = np.asarray(x).transpose(0, 3, 1, 2).reshape(1, -1)
    np.testing.assert_allclose(got, want)
