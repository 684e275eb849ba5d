"""Darknet ``.cfg`` emitter: layer specs -> the INI format src/parser.c:730
consumes.

Interop counterpart to the .weights writer: together they export any model
in this framework to a fully darknet-loadable (cfg, weights) pair — and they
power the C-oracle parity harness (tests load the emitted pair into the
*reference's own* compiled darknet and diff raw activations against ours).

Index mapping: every spec maps 1:1 to a darknet section except
TransposeFlatten (implicit in darknet — its connected layer already consumes
CHW-flattened input, which is exactly why the spec exists on our NHWC side).
Detect markers become [yolo]/[region]/[detection] sections (they ARE layers
in darknet).
"""

from __future__ import annotations

from typing import List, Optional

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import specs as S


def specs_to_cfg(cfg: C.ModelConfig, specs=None, *, batch: int = 1) -> str:
    specs = C.build_specs(cfg) if specs is None else specs
    out: List[str] = []
    out.append("[net]")
    out.append(f"batch={batch}")
    out.append("subdivisions=1")
    out.append(f"height={cfg.input_size}")
    out.append(f"width={cfg.input_size}")
    out.append("channels=3")
    out.append("momentum=0.9\ndecay=0.0005")
    out.append("learning_rate=0.001\nburn_in=1000\nmax_batches=500200")
    out.append("policy=steps\nsteps=400000,450000\nscales=.1,.1")
    out.append("")

    # spec index -> darknet layer index (TransposeFlatten emits no section)
    dk_index: List[Optional[int]] = []
    n_emitted = 0

    def ref_to_dk(ref, i):
        r = S.resolve_ref(ref, i)
        if r == S.INPUT:
            raise ValueError("cfg cannot route to the input")
        d = dk_index[r]
        if d is None:  # points at a TransposeFlatten; use its predecessor
            d = dk_index[r - 1]
        return d

    anchors_flat = ",".join(
        f"{a[0]:g},{a[1]:g}" for a in cfg.anchors) if cfg.anchors else ""

    for i, spec in enumerate(specs):
        emitted = True
        if isinstance(spec, S.Conv):
            out.append("[convolutional]")
            if spec.bn:
                out.append("batch_normalize=1")
            out.append(f"filters={spec.filters}")
            out.append(f"size={spec.size}")
            out.append(f"stride={spec.stride}")
            out.append("pad=1")
            out.append(f"activation={'leaky' if spec.act == 'leaky' else 'linear'}")
        elif isinstance(spec, S.MaxPool):
            out.append("[maxpool]")
            out.append(f"size={spec.size}")
            out.append(f"stride={spec.stride}")
        elif isinstance(spec, S.Route):
            out.append("[route]")
            cur_dk = n_emitted  # index this section will get
            rels = [ref_to_dk(r, i) - cur_dk for r in spec.refs]
            out.append("layers=" + ",".join(str(r) for r in rels))
        elif isinstance(spec, S.Shortcut):
            out.append("[shortcut]")
            out.append(f"from={ref_to_dk(spec.ref, i) - n_emitted}")
            out.append("activation=linear")
        elif isinstance(spec, S.Reorg):
            out.append("[reorg]")
            out.append(f"stride={spec.stride}")
        elif isinstance(spec, S.Upsample):
            out.append("[upsample]")
            out.append(f"stride={spec.factor}")
        elif isinstance(spec, S.Dense):
            out.append("[connected]")
            out.append(f"output={spec.units}")
            out.append(f"activation={'leaky' if spec.act == 'leaky' else 'linear'}")
        elif isinstance(spec, S.Dropout):
            out.append("[dropout]")
            out.append(f"probability={spec.rate}")
        elif isinstance(spec, S.Detect):
            if cfg.head == 3:
                out.append("[yolo]")
                out.append("mask=" + ",".join(str(m) for m in spec.anchor_mask))
                out.append(f"anchors={anchors_flat}")
                out.append(f"classes={cfg.num_classes}")
                out.append(f"num={cfg.num_anchors}")
                out.append("jitter=.3\nignore_thresh=.5\ntruth_thresh=1\nrandom=0")
            elif cfg.head == 2:
                out.append("[region]")
                out.append(f"anchors={anchors_flat}")
                out.append(f"bias_match=1\nclasses={cfg.num_classes}")
                out.append(f"coords=4\nnum={cfg.num_anchors}")
                out.append("softmax=1\njitter=.3\nrescore=1")
                out.append("object_scale=5\nnoobject_scale=1\nclass_scale=1"
                           "\ncoord_scale=1\nabsolute=1\nthresh=.6\nrandom=0")
            else:
                out.append("[detection]")
                out.append(f"classes={cfg.num_classes}")
                out.append(f"coords=4\nrescore=1\nside={cfg.grid}")
                out.append(f"num={cfg.boxes_per_cell}")
                out.append("softmax=0\nsqrt=1\njitter=.2")
                out.append("object_scale=1\nnoobject_scale=.5"
                           "\nclass_scale=1\ncoord_scale=5")
        elif isinstance(spec, S.TransposeFlatten):
            emitted = False
        else:  # pragma: no cover
            raise TypeError(f"cannot emit {spec!r}")
        if emitted:
            dk_index.append(n_emitted)
            n_emitted += 1
            out.append("")
        else:
            dk_index.append(None)
    return "\n".join(out)
