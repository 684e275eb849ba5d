"""Geometry gates for the synthetic-shapes task generators (tools/).

The 12-class "hard" variant exists to measure the int8 mAP delta in a
non-saturated regime (VERDICT r2 weak #7); these tests pin that its ground
truth is trustworthy: every emitted box lies inside the image, has positive
extent, and — for the aspect-varying classes (ellipse/rect/semicircle) —
is TIGHT to the drawn pixels rather than the loose s-by-s square, since a
systematically loose gt box would depress every model's mAP identically
and mask the quantization delta the task is built to expose.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tools.synthetic_train_demo import (CLASSES, HARD_CLASSES, SIZE,
                                        make_batch, make_scene)


def test_easy_scene_unchanged():
    rng = np.random.default_rng(0)
    img, boxes = make_scene(rng)
    assert img.shape == (SIZE, SIZE, 3) and img.dtype == np.uint8
    assert boxes.shape[1] == 5
    assert set(boxes[:, 4].astype(int)) <= set(range(len(CLASSES)))


def test_hard_scene_boxes_valid_and_tight():
    rng = np.random.default_rng(1)
    seen_classes = set()
    for _ in range(300):
        img, boxes = make_scene(rng, hard=True)
        assert img.shape == (SIZE, SIZE, 3)
        cx, cy, w, h, cls = boxes.T
        seen_classes |= set(cls.astype(int))
        assert (cls >= 0).all() and (cls < len(HARD_CLASSES)).all()
        assert (w > 0).all() and (h > 0).all()
        # boxes stay inside the image (tiny slack for int rounding)
        assert (cx - w / 2 >= -1 / SIZE).all()
        assert (cy - h / 2 >= -1 / SIZE).all()
        assert (cx + w / 2 <= 1 + 1 / SIZE).all()
        assert (cy + h / 2 <= 1 + 1 / SIZE).all()
    # every one of the 12 classes occurs
    assert seen_classes == set(range(len(HARD_CLASSES)))


@pytest.mark.parametrize("cls_name", ["ellipse", "rect", "semicircle"])
def test_hard_tight_boxes_cover_drawn_pixels(cls_name):
    """For aspect-varying shapes the emitted box must match the drawn
    extent: re-derive the pixel bounding box of the single brightest shape
    on a clean canvas and require IoU > 0.8 with the ground-truth box."""
    from tools.synthetic_train_demo import _draw_shape
    cls = HARD_CLASSES.index(cls_name)
    rng = np.random.default_rng(2)
    for _ in range(50):
        img = np.zeros((SIZE, SIZE, 3), np.uint8)
        s = int(rng.integers(20, 56))
        cx = int(rng.integers(s // 2 + 2, SIZE - s // 2 - 2))
        cy = int(rng.integers(s // 2 + 2, SIZE - s // 2 - 2))
        tight = _draw_shape(cv2, img, cls, cx, cy, s, (255, 255, 255), rng)
        assert tight is not None
        ys, xs = np.nonzero(img[..., 0])
        px = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
        gt = tight
        ix = max(0, min(px[2], gt[2]) - max(px[0], gt[0]))
        iy = max(0, min(px[3], gt[3]) - max(px[1], gt[1]))
        inter = ix * iy
        a = (px[2] - px[0]) * (px[3] - px[1])
        b = (gt[2] - gt[0]) * (gt[3] - gt[1])
        iou = inter / (a + b - inter)
        assert iou > 0.8, (cls_name, px, gt, iou)


def test_hard_batch_padding():
    rng = np.random.default_rng(3)
    imgs, tr = make_batch(rng, 4, max_boxes=8, hard=True)
    assert imgs.shape == (4, SIZE, SIZE, 3)
    assert tr.shape == (4, 8, 5)
    # padded rows are all-zero
    for i in range(4):
        nz = np.any(tr[i] != 0, axis=1)
        if not nz.all():
            assert not np.any(tr[i][~nz])
