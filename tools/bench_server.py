"""serve-http latency on the real chip: p50/p95 end-to-end.

Stands up the production HTTP micro-batching server (server.serve_http)
over an int8 yolov3-416 fused-letterbox Detector — the shipped serving
combination — and measures client-observed latency for real JPEG POSTs:

  - sequential p50/p95 (single in-flight request: batcher coalescing
    cannot help, so this is the honest per-request floor incl. decode,
    letterbox canvas staging, device dispatch and host readback);
  - concurrent p50/p95 + throughput (6 threads x 10 requests: micro-
    batching amortizes dispatches across requesters).

Through this harness's remote-TPU tunnel each dispatch carries ~0.3-2 s
of RTT that a co-located chip does not pay; the JSON line reports the
tunnel-including numbers plus the device-only batch-1 latency from
bench.py (batch1_device_latency_ms) for the subtraction.

Run on the real chip:  python tools/bench_server.py
Results go to bench.py extras / README.
"""

import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import cv2
    import jax
    from yolo_tensorflow_tpu import config as C
    from yolo_tensorflow_tpu.models import engine
    from yolo_tensorflow_tpu.ops import quant as Q
    from yolo_tensorflow_tpu.pipeline import Detector
    from yolo_tensorflow_tpu.server import serve_http

    size = int(os.environ.get("BENCH_SERVER_SIZE", "416"))
    cfg = C.get_config("yolov3", input_size=size)
    specs = C.build_specs(cfg)
    params, _ = engine.init_params(specs, (1, size, size, 3),
                                   jax.random.PRNGKey(0), folded=True)
    params = jax.tree.map(np.asarray, params)
    scales = {engine.layer_key(i): 0.05 for i, sp in enumerate(specs)
              if hasattr(sp, "filters")}
    qparams = Q.quantize_params(specs, params, scales)
    det = Detector(cfg, params=qparams, specs=specs, letterbox=True,
                   fused=True, conf_threshold=0.3, max_detections=20)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    # compile the canvas-bucket executable BEFORE serving: the first jit
    # of yolov3-416 takes 1-2 min through the tunnel, far past the
    # batcher's 30 s per-request deadline (the server would 503 it). The
    # batcher always pads the canvas to batch_size rows, so ONE call at
    # the 640-px bucket covers every occupancy.
    from yolo_tensorflow_tpu.pipeline import canvas_side
    side = canvas_side(640, 416)
    canvas = np.zeros((8, side, side, 3), np.uint8)
    canvas[:, :480, :640] = img
    sizes = np.full((8, 2), (480, 640), np.int32)
    t0 = time.time()
    det.detect_batch_fused(canvas, sizes)
    print(f"warmed the {side}px canvas bucket in {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)

    ready = threading.Event()
    httpd, batcher = serve_http(det, host="127.0.0.1", port=0,
                                batch_size=8, max_wait_ms=3.0,
                                model_name="yolov3-int8",
                                ready_event=ready)
    ready.wait(10)
    url = f"http://127.0.0.1:{httpd.server_address[1]}/detect"

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    body = buf.tobytes()

    def post():
        t0 = time.perf_counter()
        req = urllib.request.Request(url, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert "detections" in out, out
        return (time.perf_counter() - t0) * 1e3

    try:
        for _ in range(3):          # warm: compile the canvas bucket
            post()

        seq = [post() for _ in range(40)]

        lats, errs = [], []

        def client(n):
            for _ in range(n):
                try:
                    lats.append(post())
                except Exception as e:  # pragma: no cover
                    errs.append(repr(e))

        threads = [threading.Thread(target=client, args=(10,))
                   for _ in range(6)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        assert not errs, errs[:3]
        snap = batcher.snapshot()
    finally:
        httpd.shutdown()
        batcher.close()

    print(json.dumps({
        "serve_http_seq_p50_ms": round(float(np.percentile(seq, 50)), 1),
        "serve_http_seq_p95_ms": round(float(np.percentile(seq, 95)), 1),
        "serve_http_conc6_p50_ms": round(float(np.percentile(lats, 50)), 1),
        "serve_http_conc6_p95_ms": round(float(np.percentile(lats, 95)), 1),
        "serve_http_conc6_images_per_sec": round(len(lats) / wall, 1),
        "mean_batch_occupancy": round(snap["mean_batch_occupancy"], 2),
        "requests": snap["requests"], "errors": snap["errors"],
        "note": "through the remote-TPU tunnel (per-dispatch RTT "
                "included); device-only batch-1 latency is bench.py's "
                "batch1_device_latency_ms_int8",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
