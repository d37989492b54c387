"""Serving driver tests (bin/serve_asr.py): HTTP + micro-batching around
the task decode_batch path. The reference has no serving layer (SURVEY.md
§1) — this is TPU-native deployment surface, so the tests pin down:
  * request -> featurize -> bucket-pad -> decode -> detokenized text,
  * the served result equals the offline decode_batch result,
  * concurrent requests are micro-batched and all answered,
  * WAV / JSON-pcm / JSON-feats payloads all decode.
"""

import io
import json
import threading
import urllib.request
import wave

import numpy as np
import pytest

from cassnat_asr_public_tpu.utils.config import Config


def _mk_cfg(tmp_path, **over):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(f"tok{i}" for i in range(12)) + "\n")
    cfg = Config(
        task="cassnat", vocab_file=str(vocab), input_size=20,
        vocab_size=16, N_enc=1, N_extra=1, N_self_dec=1, N_mix_dec=1,
        d_model=16, d_ff=32, d_encff=32, d_decff=32, n_head=2,
        dropout=0.0, ctc_alpha=1.0, interctc_alpha=0.0, interctc_layer=0,
        label_smooth=0.1, padding_idx=0, use_conv_enc=False,
        use_conv_dec=False, pos_type="absolute", share_ff=False,
        use_trigger=True, src_trigger=False, use_unimask=False,
        use_best_path=True, decode_type="ctc_only",
        exp_dir=str(tmp_path), test_paths=[], use_cmvn=False,
        left_ctx=0, right_ctx=0, skip_frame=1, seed=0,
        serve_max_batch=4, serve_batch_timeout_ms=40,
        serve_frame_buckets=[32, 64, 128], filter_max=1000,
        fbank_bins=20,
    )
    cfg.update(over)
    return cfg


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from cassnat_asr_public_tpu.bin.serve_asr import build_server
    tmp = tmp_path_factory.mktemp("serve")
    cfg = _mk_cfg(tmp)
    httpd, asr = build_server(cfg, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd, asr, cfg
    httpd.shutdown()
    asr.shutdown()
    httpd.server_close()


def _post(port, payload, ctype="application/json"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/recognize", data=payload,
        headers={"Content-Type": ctype}, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read().decode())


def test_served_text_matches_offline_decode(served):
    """One request == the offline decode_batch on the same padded batch."""
    httpd, asr, cfg = served
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(50, 20)).astype(np.float32)
    text = asr.submit_feats(feat)
    assert isinstance(text, str)

    # replicate the server's single-request padding (bucket 64, b_pad 1)
    import jax
    from cassnat_asr_public_tpu.data.vocab import pieces_to_text
    feats = np.zeros((1, 64, 20), np.float32)
    mask = np.zeros((1, 64), bool)
    feats[0, :50] = feat
    mask[0, :50] = True
    bd = asr.task.shard_decode_batch({"feats": feats, "src_mask": mask})
    out, _ = asr.task.decode_batch(cfg, bd, jax.random.PRNGKey(0))
    toks = np.asarray(out["tokens"])
    lens = np.asarray(out["lengths"])
    hyp = [int(t) for t in toks[0, :lens[0]] if t > 2]
    assert text == pieces_to_text(asr.task.vocab.decode(hyp))

    # determinism across dispatches (greedy decode)
    assert asr.submit_feats(feat) == text


def test_http_json_feats_and_healthz(served):
    httpd, asr, cfg = served
    port = httpd.server_address[1]
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(30, 20)).astype(np.float32).tolist()
    res = _post(port, json.dumps({"feats": feat}).encode())
    assert "text" in res and "latency_ms" in res

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        h = json.loads(r.read().decode())
    assert h["status"] == "ok" and h["requests"] >= 1


def test_http_wav_and_pcm_payloads(served):
    httpd, asr, cfg = served
    port = httpd.server_address[1]
    rng = np.random.default_rng(2)
    pcm = (rng.normal(size=8000) * 0.1).clip(-1, 1)

    res_json = _post(port, json.dumps({"pcm": pcm.tolist()}).encode())
    assert "text" in res_json

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((pcm * 32767).astype(np.int16).tobytes())
    res_wav = _post(port, buf.getvalue(), ctype="audio/wav")
    assert "text" in res_wav
    # same audio, same featurization -> same hypothesis (PCM16 rounding is
    # below decision thresholds for a greedy decode on 1e-1-scale noise)
    assert res_wav["text"] == res_json["text"]


def test_concurrent_requests_micro_batched(served):
    httpd, asr, cfg = served
    port = httpd.server_address[1]
    rng = np.random.default_rng(3)
    feat = rng.normal(size=(40, 20)).astype(np.float32).tolist()
    results = [None] * 4

    def post(i):
        results[i] = _post(port, json.dumps({"feats": feat}).encode())

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert all(r is not None and "text" in r for r in results)
    # identical inputs must produce identical outputs regardless of how
    # the batcher grouped them (incl. padded-batch slots)
    assert len({r["text"] for r in results}) == 1


def test_bad_payloads_rejected(served):
    httpd, asr, cfg = served
    port = httpd.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/recognize", data=b"{}",
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # over-long utterance
    feat = np.zeros((2000, 20), np.float32)
    with pytest.raises(ValueError):
        asr.submit_feats(feat)
