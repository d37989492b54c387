"""Serving latency/throughput characterization (VERDICT r3 item 9).

Drives the real HTTP serving stack (bin/serve_asr.py: ThreadingHTTPServer
-> featurize -> dynamic micro-batcher -> CassNATTask.decode_batch) with
closed-loop concurrent clients at several load levels and reports
p50/p95/p99 latency + throughput. The model is the trained synth-parity
CASS-NAT (egs/synth/exp/cassnat) decoding the shipped WER-validated
primary config (esa_att sample_num=50 thr=0.9 esa_topk=8 + small-4L-LM
rank — see bench.py / WER_PARITY.md); requests replay REAL test-set
fbank features, perturbed per request so the tunnel result-cache cannot
fire (CLAUDE.md benchmarking note).

Run on the TPU from the repo root:
    python benchmarks/serve_bench.py [--loads 1,4,16] [--secs 20]
Writes SERVING.md and prints one JSON line.
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
SYNTH = os.path.join(REPO, "egs", "synth")

# synth test utts span 95-393 frames: two buckets keep the compiled-shape
# grid small (2 buckets x 4 padded batch sizes = 8 decode programs)
FRAME_BUCKETS = [256, 416]
MAX_BATCH = 8


def load_cfg():
    from cassnat_asr_public_tpu.utils.config import merge_configs
    cfg = merge_configs(None, f"{SYNTH}/conf/cassnat_train.yaml",
                        f"{SYNTH}/conf/data.yaml")
    for p in ("train_paths", "dev_paths", "test_paths"):
        for d in getattr(cfg, p):
            for k in d:
                if k != "name":
                    d[k] = os.path.join(SYNTH, d[k])
    cfg.vocab_file = os.path.join(SYNTH, cfg.vocab_file)
    cfg.global_cmvn = os.path.join(SYNTH, cfg.global_cmvn)
    cfg.exp_dir = os.path.join(SYNTH, "exp", "cassnat")
    cfg.resume_model = os.path.join(cfg.exp_dir, "best_model.ckpt")
    cfg.task = "cassnat"
    cfg.dropout = 0.0
    cfg.use_specaug = False
    # the shipped WER-validated primary decode (bench.py)
    cfg.decode_type = "esa_att"
    cfg.sample_num = 50
    cfg.threshold = 0.9
    cfg.esa_topk = 8
    cfg.rank_model = "lm"
    cfg.lm_config = f"{SYNTH}/conf/lm_small4.yaml"
    cfg.rnnlm = f"{SYNTH}/exp/lm_small4/best_model.ckpt"
    cfg.serve_max_batch = MAX_BATCH
    cfg.serve_batch_timeout_ms = 10.0
    cfg.serve_frame_buckets = FRAME_BUCKETS
    return cfg


def test_feats(n=64):
    """Real test-set fbank features (post-CMVN handled server-side? No:
    /recognize {"feats": ...} expects raw pre-CMVN fbank frames — feed the
    raw features exactly as the offline loader reads them)."""
    from cassnat_asr_public_tpu.data.kaldi_io import read_matrix, read_scp
    scp = read_scp(f"{SYNTH}/data/fbank/test/feats.scp")
    feats = []
    for utt, (path, off) in list(scp.items())[:n]:
        feats.append(read_matrix(path, off))
    return feats


def run_level(port, feats, conc, secs):
    lat, errs = [], [0]
    stop = time.time() + secs
    rng_lock = threading.Lock()
    counter = [0]

    def client(tid):
        rng = np.random.default_rng(tid)
        while time.time() < stop:
            with rng_lock:
                i = counter[0] % len(feats)
                counter[0] += 1
            f = feats[i] + rng.normal(scale=1e-4, size=feats[i].shape)
            body = json.dumps({"feats": f.tolist()}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/recognize", data=body,
                headers={"Content-Type": "application/json"}, method="POST")
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    json.loads(r.read().decode())
                lat.append((time.perf_counter() - t0) * 1000)
            except Exception:
                errs[0] += 1

    threads = [threading.Thread(target=client, args=(t,)) for t in
               range(conc)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    a = np.asarray(lat)
    return {
        "concurrency": conc, "n": len(lat), "errors": errs[0],
        "rps": round(len(lat) / dt, 2),
        "p50_ms": round(float(np.percentile(a, 50)), 1),
        "p95_ms": round(float(np.percentile(a, 95)), 1),
        "p99_ms": round(float(np.percentile(a, 99)), 1),
        "mean_ms": round(float(a.mean()), 1),
    }


def warm_grid(asr, dim):
    """Full bucket-grid warmup: every (frame bucket x padded batch) shape
    the batcher can emit gets compiled before measurement."""
    t0 = time.time()
    for tmax in FRAME_BUCKETS:
        b = 1
        while b <= MAX_BATCH:
            ths = []
            for _ in range(b):
                f = np.zeros((tmax, dim), np.float32)
                ths.append(threading.Thread(target=asr.submit_feats,
                                            args=(f,)))
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            b *= 2
    print(f"bucket-grid warmup ({len(FRAME_BUCKETS)} buckets x "
          f"{int(np.log2(MAX_BATCH)) + 1} batch shapes) in "
          f"{time.time() - t0:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loads", default="1,4,16")
    ap.add_argument("--secs", type=float, default=20.0)
    args = ap.parse_args()

    from cassnat_asr_public_tpu.bin.serve_asr import build_server
    cfg = load_cfg()
    httpd, asr = build_server(cfg, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    feats = test_feats()
    warm_grid(asr, feats[0].shape[1])

    levels = []
    for conc in [int(x) for x in args.loads.split(",")]:
        lv = run_level(port, feats, conc, args.secs)
        print(json.dumps(lv), flush=True)
        levels.append(lv)
    httpd.shutdown()
    asr.shutdown()

    mean_dur_s = float(np.mean([f.shape[0] for f in feats])) * 0.01
    md = ["# Serving latency characterization\n",
          f"Model: trained synth-parity CASS-NAT, shipped WER-validated "
          f"primary decode (esa_att s=50 thr=0.9 topk8 + small-4L-LM "
          f"rank), real TPU via the axon tunnel (~25 ms/call overhead "
          f"included in every number).",
          f"Requests replay the {len(feats)}-utt test set "
          f"(mean {mean_dur_s:.2f}s audio), perturbed per request; "
          f"micro-batcher max_batch={MAX_BATCH}, "
          f"timeout={cfg.serve_batch_timeout_ms}ms, frame buckets "
          f"{FRAME_BUCKETS}; full bucket-grid warmup before measurement.",
          "", "| concurrency | rps | p50 ms | p95 ms | p99 ms | mean ms "
          "| errors |", "|---|---|---|---|---|---|---|"]
    for lv in levels:
        md.append(f"| {lv['concurrency']} | {lv['rps']} | {lv['p50_ms']} "
                  f"| {lv['p95_ms']} | {lv['p99_ms']} | {lv['mean_ms']} "
                  f"| {lv['errors']} |")
    rtf = (1000 / levels[-1]["rps"]) / (mean_dur_s * 1000) \
        if levels[-1]["rps"] else None
    md.append("")
    if rtf:
        md.append(f"Peak throughput {levels[-1]['rps']} req/s = "
                  f"server RTF {rtf:.2e} at concurrency "
                  f"{levels[-1]['concurrency']}.")
    with open(os.path.join(REPO, "SERVING.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({"metric": "serve_p50_ms_at_conc4",
                      "levels": levels}))


if __name__ == "__main__":
    main()
