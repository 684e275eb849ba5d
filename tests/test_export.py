"""Export artifact gates: serialize, reload in a consumer that knows nothing
about the model, compare against live outputs (the frozen-pb contract)."""

import numpy as np
import jax

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.export import LoadedArtifact, export_detector
from yolo_tensorflow_tpu.models import engine
from yolo_tensorflow_tpu.pipeline import Detector


def test_export_roundtrip(tmp_path):
    cfg = C.get_config("yolov2-tiny-voc", input_size=128)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, 128, 128, 3),
                                   jax.random.PRNGKey(0), folded=True)
    det = Detector("yolov2-tiny-voc", params=params, input_size=128,
                   num_candidates=32, max_detections=5)
    path = tmp_path / "model.ytt"
    export_detector(det, str(path), batch_size=2)

    art = LoadedArtifact(str(path))
    assert art.manifest["model"] == "yolov2-tiny-voc"
    assert art.input_shape == (2, 128, 128, 3)
    assert art.classes[6] == "car"

    imgs = np.random.default_rng(0).integers(0, 255, (2, 128, 128, 3),
                                             dtype=np.uint8)
    got = art(imgs)
    live = det.detect_batch(imgs)
    np.testing.assert_allclose(np.asarray(got["detected_scores"]),
                               np.asarray(live.scores), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got["detected_num"]),
                                  np.asarray(live.num))
    np.testing.assert_allclose(np.asarray(got["detected_boxes"]),
                               np.asarray(live.boxes), rtol=1e-5, atol=1e-6)
