"""Weight-file utility gates — the darknet CLI's average / denormalize /
rgbgr / rescale commands (examples/darknet.c:425-499), transcription- and
round-trip-gated.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_tensorflow_tpu.io import netops, weights as W
from yolo_tensorflow_tpu.models import engine, specs as S
from yolo_tensorflow_tpu.models.specs import SpecBuilder


def _mixed_specs():
    """conv+BN, conv(no BN), flatten, dense+BN, Detect — covers every
    branch of the C's average/denormalize type dispatch."""
    b = SpecBuilder()
    b.conv(6, 3, stride=2)                    # BN conv
    b.conv(4, 1, bn=False, act="linear")      # bias conv
    b.add(S.TransposeFlatten())
    b.dense(5, bn=True)
    b.detect(())
    return b.specs()


def _runs(specs, n=3, size=8):
    runs = []
    rng = np.random.default_rng(11)
    for k in range(n):
        p, s = engine.init_params(specs, (1, size, size, 3),
                                  jax.random.PRNGKey(k), folded=False)
        # init gammas are all-ones: jitter every tensor per run so the
        # averaged-vs-kept distinction is observable
        p = jax.tree.map(lambda a: np.asarray(a)
                         + rng.normal(0, 0.01, a.shape).astype(np.float32),
                         p)
        s = jax.tree.map(lambda a: np.abs(np.asarray(a)) + 0.05
                         + rng.uniform(0, 0.1, a.shape).astype(np.float32),
                         s)
        runs.append((p, s))
    return runs


def test_average_c_type_rules():
    """CONVOLUTIONAL: everything averaged (weights, beta, gamma, rolling
    stats). CONNECTED: only weights + biases — a BN'd connected layer's
    gamma and rolling stats keep FILE 1's values (the C loop never adds
    them). Other layers untouched (examples/darknet.c:425-470)."""
    specs = _mixed_specs()
    runs = _runs(specs)
    avg_p, avg_s = netops.average_params(specs, runs)

    def mean(getter):
        return sum(np.asarray(getter(r)) for r in runs) / len(runs)

    k0, k1, k3 = (engine.layer_key(i) for i in (0, 1, 3))
    np.testing.assert_allclose(avg_p[k0]["w"],
                               mean(lambda r: r[0][k0]["w"]), rtol=1e-6)
    np.testing.assert_allclose(avg_p[k0]["gamma"],
                               mean(lambda r: r[0][k0]["gamma"]), rtol=1e-6)
    np.testing.assert_allclose(avg_s[k0]["var"],
                               mean(lambda r: r[1][k0]["var"]), rtol=1e-6)
    np.testing.assert_allclose(avg_p[k1]["b"],
                               mean(lambda r: r[0][k1]["b"]), rtol=1e-6)
    # dense: w and beta averaged...
    np.testing.assert_allclose(avg_p[k3]["w"],
                               mean(lambda r: r[0][k3]["w"]), rtol=1e-6)
    np.testing.assert_allclose(avg_p[k3]["beta"],
                               mean(lambda r: r[0][k3]["beta"]), rtol=1e-6)
    # ...but gamma and rolling stats are file 1's, NOT the mean (quirk)
    np.testing.assert_array_equal(avg_p[k3]["gamma"],
                                  runs[0][0][k3]["gamma"])
    np.testing.assert_array_equal(avg_s[k3]["mean"], runs[0][1][k3]["mean"])
    assert not np.allclose(avg_p[k3]["gamma"],
                           mean(lambda r: r[0][k3]["gamma"]))


def test_denormalize_math_and_forward():
    """Weight math == the C's denormalize_*_layer transcription (eps 1e-5
    conv / 1e-6 connected — NOT the runtime bn_eps); the denormalized
    net's forward stays close to the BN net (the eps mismatch is the C's
    own drift, sub-1e-3 on unit-scale stats)."""
    specs = _mixed_specs()
    (params, stats), = _runs(specs, n=1)
    new_specs, new_p = netops.denormalize(specs, params, stats)

    k0, k3 = engine.layer_key(0), engine.layer_key(3)
    sc = params[k0]["gamma"] / np.sqrt(stats[k0]["var"] + 1e-5)
    np.testing.assert_allclose(new_p[k0]["w"], params[k0]["w"] * sc,
                               rtol=1e-6)
    np.testing.assert_allclose(new_p[k0]["b"],
                               params[k0]["beta"] - stats[k0]["mean"] * sc,
                               rtol=1e-6)
    sd = params[k3]["gamma"] / np.sqrt(stats[k3]["var"] + 1e-6)
    np.testing.assert_allclose(new_p[k3]["w"], params[k3]["w"] * sd,
                               rtol=1e-6)
    assert not new_specs[0].bn and not new_specs[3].bn

    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (2, 8, 8, 3)).astype(np.float32))
    (a, _), = engine.apply(specs, params, x, batch_stats=stats)[0]
    (b, _), = engine.apply(new_specs, new_p, x)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_rgbgr_swaps_and_self_inverts():
    specs = _mixed_specs()
    (params, _), = _runs(specs, n=1)
    once = netops.rgbgr(specs, params)
    k0 = engine.layer_key(0)
    np.testing.assert_array_equal(np.asarray(once[k0]["w"]),
                                  np.asarray(params[k0]["w"])[:, :, ::-1])
    twice = netops.rgbgr(specs, once)
    np.testing.assert_array_equal(np.asarray(twice[k0]["w"]),
                                  np.asarray(params[k0]["w"]))


def test_rescale_transcription():
    """w *= scale; bias_i += trans * sum(SCALED filter i)
    (rescale_weights, src/convolutional_layer.c)."""
    specs = _mixed_specs()
    (params, _), = _runs(specs, n=1)
    k0 = engine.layer_key(0)
    out = netops.rescale(specs, params, scale=2.0, trans=-0.5)
    w2 = np.asarray(params[k0]["w"], np.float32) * 2.0
    np.testing.assert_allclose(np.asarray(out[k0]["w"]), w2, rtol=1e-6)
    want_b = (np.asarray(params[k0]["beta"], np.float32)
              - 0.5 * w2.sum(axis=(0, 1, 2)))
    np.testing.assert_allclose(np.asarray(out[k0]["beta"]), want_b,
                               rtol=1e-5)
    # second conv (not first) untouched
    k1 = engine.layer_key(1)
    np.testing.assert_array_equal(np.asarray(out[k1]["w"]),
                                  np.asarray(params[k1]["w"]))


def test_average_and_denormalize_through_cli(tmp_path, capsys):
    """`average` of two files == elementwise mean on reload; `denormalize`
    emits a (cfg, weights) pair that loads and runs BN-free."""
    from yolo_tensorflow_tpu.cli import main
    from tests.test_classifier_eval import TINY_CLS_CFG

    cfg_path = tmp_path / "t.cfg"
    cfg_path.write_text(TINY_CLS_CFG)
    from yolo_tensorflow_tpu.config import config_from_cfg
    cfg, specs = config_from_cfg(str(cfg_path))

    files = []
    saved = []
    for k in range(2):
        p, s = engine.init_params(specs, (1, 64, 64, 3),
                                  jax.random.PRNGKey(10 + k), folded=False)
        s = jax.tree.map(lambda a: np.abs(np.asarray(a)) + 0.1, s)
        f = tmp_path / f"w{k}.weights"
        W.save_darknet_weights(specs, 64, p, s, str(f), head=0)
        files.append(str(f))
        saved.append((jax.tree.map(np.asarray, p), s))

    out = tmp_path / "avg.weights"
    main(["average", "--cfg", str(cfg_path), "--out", str(out)] + files)
    pa, sa, _ = W.load_darknet_weights(specs, 64, str(out), fold=False)
    k0 = engine.layer_key(0)
    np.testing.assert_allclose(
        pa[k0]["w"],
        (saved[0][0][k0]["w"] + saved[1][0][k0]["w"]) / 2, atol=1e-6)

    dn = tmp_path / "plain.weights"
    main(["denormalize", "--cfg", str(cfg_path), "--weights", files[0],
          "--out", str(dn)])
    cfg2, specs2 = config_from_cfg(str(tmp_path / "plain.cfg"))
    p2, s2, _ = W.load_darknet_weights(specs2, 64, str(dn), fold=False)
    assert not any(getattr(sp, "bn", False) for sp in specs2)
    x = jnp.asarray(np.random.default_rng(1).integers(
        0, 255, (1, 64, 64, 3)).astype(np.float32) / 255.0)
    (probs_bn, _), = engine.apply(specs, saved[0][0], x,
                                  batch_stats=saved[0][1])[0]
    (probs_dn, _), = engine.apply(specs2, p2, x)[0]
    np.testing.assert_allclose(np.asarray(probs_bn), np.asarray(probs_dn),
                               atol=2e-3)


def test_reset_normalize_identity_slots():
    """`reset` = denormalize math, BN slots kept at identity; the forward
    differs from plain denormalize only by normalize_cpu's one-ppm
    sqrt(1)+1e-6 divisor (both nets serve, same cfg loads the reset
    file)."""
    specs = _mixed_specs()
    (params, stats), = _runs(specs, n=1)
    rp, rs = netops.reset_normalize(specs, params, stats)
    dn_specs, dp = netops.denormalize(specs, params, stats)
    k0 = engine.layer_key(0)
    np.testing.assert_allclose(rp[k0]["w"], dp[k0]["w"], rtol=1e-6)
    np.testing.assert_allclose(rp[k0]["beta"], dp[k0]["b"], rtol=1e-6)
    np.testing.assert_array_equal(rp[k0]["gamma"],
                                  np.ones_like(rp[k0]["gamma"]))
    np.testing.assert_array_equal(rs[k0]["var"], np.ones_like(rs[k0]["var"]))
    x = jnp.asarray(np.random.default_rng(2).normal(
        0, 1, (1, 8, 8, 3)).astype(np.float32))
    (a, _), = engine.apply(specs, rp, x, batch_stats=rs)[0]
    (b, _), = engine.apply(dn_specs, dp, x)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


def test_normalize_adds_zero_var_slots(tmp_path):
    """`normalize` converts bias-only layers to BN form with rolling var
    ZERO (the C callocs it — quirk kept) and the pair round-trips
    through .weights + emitted cfg."""
    specs = _mixed_specs()
    (params, stats), = _runs(specs, n=1)
    new_specs, np_, ns = netops.normalize(specs, params, stats)
    k1 = engine.layer_key(1)          # the bias-only conv
    assert new_specs[1].bn
    np.testing.assert_array_equal(np_[k1]["gamma"],
                                  np.ones_like(np_[k1]["gamma"]))
    np.testing.assert_array_equal(np_[k1]["beta"], params[k1]["b"])
    np.testing.assert_array_equal(ns[k1]["var"],
                                  np.zeros_like(ns[k1]["var"]))
    # already-BN layer untouched, stats pass through
    k0 = engine.layer_key(0)
    np.testing.assert_array_equal(np_[k0]["gamma"], params[k0]["gamma"])
    np.testing.assert_array_equal(ns[k0]["var"], stats[k0]["var"])
    # round-trip
    f = tmp_path / "n.weights"
    W.save_darknet_weights(new_specs, 8, np_, ns, str(f), head=0)
    p2, s2, _ = W.load_darknet_weights(new_specs, 8, str(f), fold=False)
    np.testing.assert_array_equal(p2[k1]["gamma"], np_[k1]["gamma"])
    np.testing.assert_array_equal(s2[k1]["var"], ns[k1]["var"])
