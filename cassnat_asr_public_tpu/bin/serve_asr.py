"""Online ASR serving: HTTP front end + dynamic micro-batching.

The reference has NO serving layer — "inference" is offline batch decoding
to text files (SURVEY.md §1; reference: src/bin/decode_asr.py). This driver
is the TPU-native deployment surface on top of the same task layer:

  * requests (raw PCM/WAV or precomputed fbank features) are featurized
    with the in-framework frontend (ops/frontend.py — the Kaldi make_fbank
    replacement) + CMVN + splice/skip, exactly like the offline pipeline
    (data/datasets.py:load_item);
  * a single batcher thread micro-batches requests while the chip is busy
    (collect up to --max_batch or --batch_timeout_ms), pads them onto a
    small static (batch, frames) bucket grid so XLA compiles a bounded set
    of programs (first hit per bucket compiles, then the persistent compile
    cache serves it);
  * each micro-batch runs through CassNATTask.decode_batch — the exact
    code path the offline WER numbers are scored with (esa_att/ctc_only/
    ctc_att per --decode_type, including LM ranking if configured).

Usage:
  python -m cassnat_asr_public_tpu.bin.serve_asr \
      --test_config conf/cassnat_decode.yaml --data_config conf/data.yaml \
      --task cassnat --resume_model exp/cassnat/averaged.ckpt \
      --port 8077 [--max_batch 8] [--batch_timeout_ms 15] [--warmup]

  POST /recognize   body: {"pcm": [...], "sample_rate": 16000}
                      or  {"feats": [[...80 floats...], ...]}  (raw fbank
                          frames, pre-CMVN)
                      or  audio/wav bytes (PCM16/32 RIFF)
                    -> {"text": ..., "latency_ms": ...}
  GET  /healthz     -> {"status": "ok", "model": ..., "requests": N}
"""

import io
import json
import queue
import threading
import time
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from cassnat_asr_public_tpu.bin.parser import decode_parser
from cassnat_asr_public_tpu.data.feat_op import context_feat, skip_feat
from cassnat_asr_public_tpu.data.vocab import pieces_to_text
from cassnat_asr_public_tpu.data.kaldi_io import load_cmvn_stats
from cassnat_asr_public_tpu.utils.config import merge_configs

DEFAULT_FRAME_BUCKETS = (64, 128, 192, 256, 384, 512, 768, 1024)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class _Pending:
    __slots__ = ("feats", "event", "text", "error", "t0")

    def __init__(self, feats):
        self.feats = feats
        self.event = threading.Event()
        self.text = None
        self.error = None
        self.t0 = time.time()


class AsrServer:
    """Micro-batching decode service around a test-mode task."""

    def __init__(self, task, cfg):
        self.task = task
        self.cfg = cfg
        self.num_bins = int(getattr(cfg, "fbank_bins", 80))
        self.window = getattr(cfg, "fbank_window", "hamming")
        self.sample_rate = int(getattr(cfg, "sample_rate", 16000))
        self.left_ctx = int(getattr(cfg, "left_ctx", 0))
        self.right_ctx = int(getattr(cfg, "right_ctx", 0))
        self.skip_frame = int(getattr(cfg, "skip_frame", 1))
        self.mean = self.std = None
        if getattr(cfg, "use_cmvn", False) and \
                getattr(cfg, "global_cmvn", None):
            self.mean, self.std = load_cmvn_stats(cfg.global_cmvn)
        self.frame_buckets = tuple(
            getattr(cfg, "serve_frame_buckets", None)
            or DEFAULT_FRAME_BUCKETS)
        self.max_batch = int(getattr(cfg, "serve_max_batch", 8))
        self.timeout_s = float(getattr(cfg, "serve_batch_timeout_ms", 15)) \
            / 1000.0
        self.max_frames = int(getattr(cfg, "filter_max", 3000))
        import jax
        self.rng = jax.random.PRNGKey(getattr(cfg, "seed", 0))
        self.queue: "queue.Queue[_Pending]" = queue.Queue()
        self.n_served = 0
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._batch_loop, daemon=True)
        self._worker.start()

    # ---- feature pipeline (mirrors data/datasets.py:load_item) ----
    def featurize_pcm(self, pcm: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        from cassnat_asr_public_tpu.ops.frontend import log_mel_fbank
        pcm = np.asarray(pcm, np.float32).reshape(1, -1)
        feat = np.asarray(log_mel_fbank(
            jnp.asarray(pcm), num_bins=self.num_bins,
            sample_rate=self.sample_rate, window_type=self.window))[0]
        return self.process_feats(feat)

    def process_feats(self, feat: np.ndarray) -> np.ndarray:
        feat = np.asarray(feat, np.float32)
        if self.mean is not None:
            feat = (feat - self.mean) / self.std
        if feat.shape[0] % self.skip_frame != 0:
            pad = self.skip_frame - feat.shape[0] % self.skip_frame
            feat = np.vstack(
                [feat, np.zeros((pad, feat.shape[1]), np.float32)])
        feat = skip_feat(context_feat(feat, self.left_ctx, self.right_ctx),
                         self.skip_frame)
        return feat.astype(np.float32)

    # ---- request path ----
    def submit_feats(self, feat: np.ndarray, timeout: float = 120.0) -> str:
        """Enqueue processed features; blocks until the micro-batch that
        contains them is decoded."""
        if feat.shape[0] > self.max_frames:
            raise ValueError(
                f"utterance too long: {feat.shape[0]} frames "
                f"(limit {self.max_frames})")
        p = _Pending(feat)
        self.queue.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError("decode timed out")
        if p.error is not None:
            raise RuntimeError(p.error)
        return p.text

    # ---- batcher ----
    def _collect(self):
        first = self.queue.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.time() + self.timeout_s
        while len(batch) < self.max_batch:
            rest = deadline - time.time()
            if rest <= 0:
                break
            try:
                nxt = self.queue.get(timeout=rest)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _batch_loop(self):
        while not self._stop.is_set():
            batch = self._collect()
            if batch is None:
                return
            try:
                self._decode(batch)
            except Exception as e:  # report, don't kill the loop
                for p in batch:
                    p.error = f"{type(e).__name__}: {e}"
                    p.event.set()

    def _decode(self, batch):
        tmax = _bucket(max(p.feats.shape[0] for p in batch),
                       self.frame_buckets)
        b_real = len(batch)
        b_pad = 1
        while b_pad < b_real:
            b_pad *= 2
        dim = batch[0].feats.shape[1]
        feats = np.zeros((b_pad, tmax, dim), np.float32)
        mask = np.zeros((b_pad, tmax), bool)
        for i, p in enumerate(batch):
            t = min(p.feats.shape[0], tmax)
            feats[i, :t] = p.feats[:t]
            mask[i, :t] = True
        # padding rows repeat row 0 so every slot is a valid utterance
        for i in range(b_real, b_pad):
            feats[i] = feats[0]
            mask[i] = mask[0]
        bd = self.task.shard_decode_batch(
            {"feats": feats, "src_mask": mask})
        out, self.rng = self.task.decode_batch(self.cfg, bd, self.rng)
        toks = np.asarray(out["tokens"])
        if "lengths" in out:  # AR beam output is eos-terminated, no lengths
            lens = np.asarray(out["lengths"])
        else:
            lens = np.full((toks.shape[0],), toks.shape[1], np.int32)
        for i, p in enumerate(batch):
            hyp = [int(t) for t in toks[i, :lens[i]] if t > 2]
            p.text = pieces_to_text(self.task.vocab.decode(hyp))
            self.n_served += 1
            p.event.set()

    def warmup(self, tmax: int = None):
        """Pre-compile the primary bucket so the first request is fast."""
        tmax = tmax or self.frame_buckets[0]
        feat = np.zeros((tmax, self.feat_dim()), np.float32)
        self.submit_feats(feat)

    def feat_dim(self) -> int:
        return self.num_bins * (1 + self.left_ctx + self.right_ctx)

    def shutdown(self):
        self._stop.set()
        self.queue.put(None)
        self._worker.join(timeout=5)


class _Handler(BaseHTTPRequestHandler):
    server_version = "cassnat-tpu-serve/1.0"
    asr: AsrServer = None  # installed by serve()

    def log_message(self, fmt, *a):  # quiet access log
        pass

    def _json(self, code, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._json(200, {"status": "ok",
                             "model": self.asr.task.model_name,
                             "requests": self.asr.n_served})
        else:
            self._json(404, {"error": "not found"})

    def do_POST(self):
        if self.path != "/recognize":
            self._json(404, {"error": "not found"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            ctype = self.headers.get("Content-Type", "application/json")
            t0 = time.time()
            if ctype.startswith("audio/") or \
                    ctype == "application/octet-stream":
                with wave.open(io.BytesIO(raw), "rb") as w:
                    sw = w.getsampwidth()
                    data = w.readframes(w.getnframes())
                    dt = {2: np.int16, 4: np.int32}[sw]
                    pcm = np.frombuffer(data, dt).astype(np.float32) \
                        / float(np.iinfo(dt).max)
                    if w.getnchannels() > 1:
                        pcm = pcm.reshape(-1, w.getnchannels()).mean(1)
                feat = self.asr.featurize_pcm(pcm)
            else:
                req = json.loads(raw.decode())
                if "feats" in req:
                    feat = self.asr.process_feats(
                        np.asarray(req["feats"], np.float32))
                elif "pcm" in req:
                    feat = self.asr.featurize_pcm(
                        np.asarray(req["pcm"], np.float32))
                else:
                    self._json(400, {"error": "need 'pcm' or 'feats'"})
                    return
            text = self.asr.submit_feats(feat)
            self._json(200, {"text": text,
                             "latency_ms": round(
                                 (time.time() - t0) * 1000, 2)})
        except Exception as e:
            self._json(400, {"error": f"{type(e).__name__}: {e}"})


def build_server(cfg, host: str = "127.0.0.1", port: int = 8077):
    """Construct (http_server, asr_server) — split out for tests."""
    from cassnat_asr_public_tpu.tasks import TASKS
    if not getattr(cfg, "test_paths", None):
        cfg.test_paths = []  # serving needs no offline test set
    task = TASKS[cfg.task]("test", cfg)
    if getattr(cfg, "rank_model", "none") not in ("none", "") or \
            getattr(cfg, "lm_weight", 0.0):
        task.load_lm_model(cfg)
    asr = AsrServer(task, cfg)
    handler = type("BoundHandler", (_Handler,), {"asr": asr})
    httpd = ThreadingHTTPServer((host, port), handler)
    return httpd, asr


def main(argv=None):
    p = decode_parser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8077)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--batch_timeout_ms", type=float, default=15.0)
    p.add_argument("--warmup", action="store_true")
    args = p.parse_args(argv)
    cfg = merge_configs(args, args.test_config, args.data_config)
    if args.decode_type:
        cfg.decode_type = args.decode_type
    cfg.serve_max_batch = args.max_batch
    cfg.serve_batch_timeout_ms = args.batch_timeout_ms

    httpd, asr = build_server(cfg, args.host, args.port)
    if args.warmup:
        t0 = time.time()
        asr.warmup()
        print(f"warmup decode compiled in {time.time() - t0:.1f}s",
              flush=True)
    print(f"serving {cfg.task} ({getattr(cfg, 'decode_type', 'esa_att')}) "
          f"on {args.host}:{args.port}", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        asr.shutdown()
        httpd.server_close()


if __name__ == "__main__":
    main()
