"""Model summary table — the layer listing darknet prints at cfg parse
(captured in the reference as yolov1.txt/yolov2.txt/yolov3.txt) and the
print_activations shape dumps (model_darknet19_slim.py:109)."""

from __future__ import annotations

from yolo_tensorflow_tpu import config as C
from yolo_tensorflow_tpu.models import engine, specs as S


def summarize(cfg: C.ModelConfig, specs=None, input_size=None,
              in_channels: int = 3) -> str:
    specs = C.build_specs(cfg) if specs is None else specs
    size = input_size or cfg.input_size
    inp = (1, size, size, in_channels)
    shapes = engine.infer_shapes(specs, inp)
    lines = [f"{cfg.name}  input {size}x{size}x{in_channels}",
             f"{'#':>3} {'layer':<14} {'params':>12} {'BFLOPs':>8}  output"]
    prev = inp
    total_f = total_p = 0.0
    for i, spec in enumerate(specs):
        shape = shapes[i]
        flops = params = 0
        if isinstance(spec, S.Conv):
            _, oh, ow, co = shape
            ci = prev[3]
            params = co * (ci * spec.size ** 2 + (4 if spec.bn else 1))
            flops = 2.0 * oh * ow * co * ci * spec.size ** 2
            desc = f"conv {spec.filters} {spec.size}x{spec.size}/{spec.stride}"
        elif isinstance(spec, S.Dense):
            params = prev[1] * spec.units \
                + spec.units * (4 if spec.bn else 1)
            flops = 2.0 * prev[1] * spec.units
            desc = f"connected {spec.units}"
        elif isinstance(spec, S.MaxPool):
            desc = f"max {spec.size}x{spec.size}/{spec.stride}"
        elif isinstance(spec, S.Route):
            desc = "route " + ",".join(str(S.resolve_ref(r, i))
                                       for r in spec.refs)
        elif isinstance(spec, S.Shortcut):
            desc = f"shortcut {S.resolve_ref(spec.ref, i)}"
        elif isinstance(spec, S.Reorg):
            desc = f"reorg /{spec.stride} ({spec.mode})"
        elif isinstance(spec, S.Upsample):
            desc = f"upsample x{spec.factor}"
        elif isinstance(spec, S.TransposeFlatten):
            desc = "flatten (CHW)"
        elif isinstance(spec, S.Dropout):
            desc = f"dropout {spec.rate}"
        elif isinstance(spec, S.GlobalAvgPool):
            desc = "avgpool (global)"
        elif isinstance(spec, S.Softmax):
            desc = "softmax"
        elif isinstance(spec, S.Detect):
            desc = f"detect v{cfg.head} mask={spec.anchor_mask}"
        elif isinstance(spec, S.RECURRENT):
            in_dim = prev[1] if len(prev) == 2 else 0
            in_c = prev[3] if len(prev) == 4 else 0
            per_unit = 4 if spec.bn else 1
            for _, kind, fan_in, units in S.recurrent_plan(spec, in_dim,
                                                           in_c):
                mul = 9 if kind == "conv" else 1
                params += units * per_unit + fan_in * units * mul
                if kind == "conv":
                    _, oh, ow, _ = shape
                    flops += 2.0 * oh * ow * 9 * fan_in * units
                else:
                    flops += 2.0 * fan_in * units
            names = {S.Rnn: "rnn", S.Gru: "gru", S.Lstm: "lstm",
                     S.Crnn: "crnn"}
            out_n = spec.output_filters if isinstance(spec, S.Crnn) \
                else spec.output
            desc = f"{names[type(spec)]} {out_n}"
        else:
            desc = type(spec).__name__
        total_f += flops
        total_p += params
        shp = "x".join(str(d) for d in shape[1:])
        lines.append(f"{i:>3} {desc:<14} {params:>12,} {flops/1e9:>8.3f}  {shp}")
        prev = shape
    lines.append(f"total params {total_p/1e6:.2f}M   total {total_f/1e9:.1f} BFLOPs")
    return "\n".join(lines)
