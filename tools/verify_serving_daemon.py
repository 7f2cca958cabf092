"""Drive the online serving daemon on the REAL TPU: HTTP requests through the
micro-batcher into the shipped bf16+Pallas serving path, plus mixed-duration
audio exactness. Used by .claude/skills/verify."""
import io
import json
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_deepfake_detection_tpu.models.heads import arcface_init, xception_lstm_init
from multimodal_deepfake_detection_tpu.models.serve import AudioScorer, VisualScorer
from multimodal_deepfake_detection_tpu.serving import MicroBatcher, ServingDaemon, VisualAdapter

print("devices:", jax.devices())
RNG = np.random.default_rng(0)

params, bn = xception_lstm_init(jax.random.PRNGKey(0), 8)
params["arcface"] = arcface_init(jax.random.PRNGKey(1), 8, 2)
scorer = VisualScorer(params, bn, buckets=(4,))  # shipped default path: bf16 + Pallas pos middle
mb = MicroBatcher(VisualAdapter(scorer), max_batch=4, max_wait_ms=40, batch_buckets=(1, 4))

with ServingDaemon({"visual": mb}, port=0) as d:
    print("daemon at", d.url)
    d.warmup("visual", frames=np.zeros((3, 256, 256, 3), np.uint8))
    print("warmup done; programs compiled:", scorer._score._cache_size())

    clips = [RNG.integers(0, 255, (t, 256, 256, 3), np.uint8) for t in (2, 3, 4, 3, 2)]
    results = [None] * len(clips)

    def post(i):
        buf = io.BytesIO(); np.savez(buf, frames=clips[i])
        req = urllib.request.Request(d.url + "/v1/score/visual", buf.getvalue(),
                                     {"Content-Type": "application/x-npz"})
        with urllib.request.urlopen(req, timeout=600) as r:
            results[i] = json.loads(r.read())

    ts = [threading.Thread(target=post, args=(i,)) for i in range(len(clips))]
    [t.start() for t in ts]; [t.join() for t in ts]
    for i, r in enumerate(results):
        assert r is not None and 0.0 <= r["score"] <= 1.0, r
    solo = scorer.score(clips[0][None])[0]
    assert abs(results[0]["score"] - solo) < 5e-3, (results[0]["score"], solo)
    with urllib.request.urlopen(d.url + "/v1/stats", timeout=60) as r:
        st = json.loads(r.read())["engines"]["visual"]
    print("stats:", st)
    assert st["scored"] == len(clips) + sum((1, 4)) and st["errors"] == 0
    assert scorer._score._cache_size() <= 2, scorer._score._cache_size()
print("VISUAL DAEMON OK — scores", [round(r["score"], 4) for r in results])

# mixed-duration audio exactness on the real chip
ap, abn = xception_lstm_init(jax.random.PRNGKey(2), 8)
aud = AudioScorer(ap, abn, sample_buckets=(4800,))
lens = [2400, 3200, 4000]
waves = [RNG.normal(0, 0.1, (L,)).astype(np.float32) for L in lens]
batch = np.zeros((len(waves), max(lens)), np.float32)
for i, w in enumerate(waves):
    batch[i, : len(w)] = w
got = aud.score(batch, sample_lengths=np.array(lens))
ref = np.array([aud.score(w[None])[0] for w in waves])
print("audio mixed:", got, "solo:", ref)
assert np.allclose(got, ref, atol=5e-3), (got, ref)
print("AUDIO sample_lengths OK")
print("ALL VERIFY CHECKS PASSED")
