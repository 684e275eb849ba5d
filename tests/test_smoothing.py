"""Rolling prediction average gates — demo.c:31,67-78 (remember_network /
avg_predictions over demo_frame frames) as detect_batch_smoothed."""

import numpy as np
import pytest

import jax

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import engine
from yolo_tensorflow_tpu.pipeline import Detector


def _random_detector(name, size=64, **kw):
    cfg = C.get_config(name, input_size=size) if name != "yolov1-tiny" \
        else C.get_config(name)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(
        specs, (1, cfg.input_size, cfg.input_size, 3),
        jax.random.PRNGKey(0), folded=True)
    return Detector(cfg, params=params, specs=specs, num_candidates=32,
                    max_detections=5, conf_threshold=0.1, **kw)


def _frames(det, n, seed=0):
    rng = np.random.default_rng(seed)
    s = det.cfg.input_size
    return rng.integers(0, 255, (n, s, s, 3), dtype=np.uint8)


@pytest.mark.parametrize("name", ["yolov3-tiny", "yolov2-tiny-voc"])
def test_batched_smoothing_equals_frame_by_frame(name):
    """The sliding average must be independent of how frames are batched:
    two batches of 2 == four batches of 1 with state threaded through
    (the darknet demo is batch-1; batching is our addition and must not
    change the math)."""
    det = _random_detector(name)
    frames = _frames(det, 4)

    state = None
    seq = []
    for j in range(4):
        d, state = det.detect_batch_smoothed(frames[j:j + 1], state,
                                             avg_frames=3)
        d = jax.tree.map(np.asarray, d)
        seq.append((d.boxes[0], d.scores[0], d.classes[0], int(d.num[0])))

    state = None
    got = []
    for j in (0, 2):
        d, state = det.detect_batch_smoothed(frames[j:j + 2], state,
                                             avg_frames=3)
        d = jax.tree.map(np.asarray, d)
        for b in range(2):
            got.append((d.boxes[b], d.scores[b], d.classes[b],
                        int(d.num[b])))

    for (gb, gs, gc, gn), (sb, ss, sc, sn) in zip(got, seq):
        assert gn == sn
        np.testing.assert_allclose(gb[:gn], sb[:sn], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gs[:gn], ss[:sn], rtol=1e-5)
        np.testing.assert_array_equal(gc[:gn], sc[:sn])


def test_steady_state_equals_unsmoothed():
    """With identical consecutive frames, once the window is full the
    average IS the single-frame output — smoothing must then match
    detect_batch exactly (same decode+NMS on the same values)."""
    det = _random_detector("yolov3-tiny")
    frame = _frames(det, 1)[0]
    batch = np.stack([frame] * 4)   # window N=3 full from frame index 2
    plain = jax.tree.map(np.asarray, det.detect_batch(batch))
    sm, _ = det.detect_batch_smoothed(batch, None, avg_frames=3)
    sm = jax.tree.map(np.asarray, sm)
    b = 3  # past warmup
    assert int(sm.num[b]) == int(plain.num[b])
    n = int(sm.num[b])
    np.testing.assert_allclose(sm.boxes[b, :n], plain.boxes[b, :n],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sm.scores[b, :n], plain.scores[b, :n],
                               rtol=1e-5)
    # warmup frames average with zero tails -> attenuated objectness, like
    # darknet's calloc'd prediction buffers on startup
    assert int(sm.num[0]) <= int(plain.num[0])


def test_stream_detect_smoothing_smoke(tmp_path):
    """stream --avg-frames N end-to-end over an image directory."""
    import cv2
    from yolo_tensorflow_tpu.serving import stream_detect
    det = _random_detector("yolov2-tiny-voc")
    s = det.cfg.input_size
    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(3)
    for i in range(6):
        cv2.imwrite(str(d / f"f{i}.jpg"),
                    rng.integers(0, 255, (s, s, 3)).astype(np.uint8))
    seen = []
    frames, dt, fps = stream_detect(det, str(d), batch_size=2,
                                    avg_frames=3,
                                    on_batch=lambda dets, ims:
                                    seen.append(ims.shape[0]))
    assert frames == 6 and sum(seen) == 6
