"""End-to-end AUC parity between the PyTorch reference semantics and this stack.

BASELINE.json north-star #2: "FakeAVCeleb AV eval AUC within +/-0.5% of the
PyTorch reference". Per-module logit parity exists elsewhere
(tests/test_import_torch.py, tests/test_xception.py); this harness closes the
loop END TO END: one set of weights is imported into both stacks, the same
synthetic eval set is scored through

* a torch eval loop reproducing the reference semantics verbatim
  (/root/reference/test_visual.py:572-646: pad-to-batch-max collate, backbone
  -> LSTM last step -> margin-free ArcFace -> softmax[:, 1]; and
  /root/reference/XceptionLSTMA.py:39-59 + test-loop sigmoid for audio), and
* this repo's own CLIs (cli/test_visual.py, cli/test_av_fused.py) in fidelity
  mode (--mask_padding false),

then per-clip scores and the AUC each stack computes with its own metric code
are compared: |dAUC| <= 0.005 and per-clip agreement at fp32 tolerance.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from multimodal_deepfake_detection_tpu.cli import import_torch, test_av_fused, test_visual  # noqa: E402
from torch_mirror import MirrorXception  # noqa: E402

pytestmark = pytest.mark.slow  # torch-mirror AUC parity e2e

HIDDEN = 8
BATCH = 2
AUC_TOL = 0.005  # the +/-0.5% north-star


class _TorchVisualRef(torch.nn.Module):
    """Reference XceptionLSTMV key layout (feature_extractor/lstm/fc_layers/
    fc_out) — only the backbone+LSTM embedding feeds ArcFace in the live eval
    (/root/reference/train_visual.py:568-569)."""

    def __init__(self, hidden=HIDDEN):
        super().__init__()
        self.feature_extractor = MirrorXception(num_classes=None)
        self.lstm = torch.nn.LSTM(2048, hidden, batch_first=True)
        layers = []
        dims = [hidden, 1024, 1024, 1024, 1024]
        for a, b in zip(dims[:-1], dims[1:]):
            layers += [torch.nn.Linear(a, b), torch.nn.ReLU(), torch.nn.Dropout(0.3)]
        self.fc_layers = torch.nn.Sequential(*layers)
        self.fc_out = torch.nn.Linear(1024, 1)

    def embed(self, frames_bt):  # (B, T, 3, H, W) -> (B, hidden)
        B, T = frames_bt.shape[:2]
        feats = self.feature_extractor(frames_bt.reshape((B * T,) + frames_bt.shape[2:]))
        out, _ = self.lstm(feats.reshape(B, T, -1))
        return out[:, -1]  # the reference's pad-consuming last step

    def score_audio(self, mfcc_bt):  # (B, T, 3, 13) -> (B,) sigmoid probs
        B, T = mfcc_bt.shape[:2]
        x = mfcc_bt.reshape(B * T, 3, 13, 1)
        x = torch.nn.functional.interpolate(x, size=(64, 64), mode="bilinear", align_corners=False)
        feats = self.feature_extractor(x)
        out, _ = self.lstm(feats.reshape(B, T, -1))
        h = self.fc_layers(out[:, -1])
        return torch.sigmoid(self.fc_out(h))[:, 0]


def _arcface_probs(emb: torch.Tensor, w: torch.Tensor, s: float = 30.0) -> torch.Tensor:
    """Margin-free ArcFace logits -> softmax fake prob (test_visual.py:620-624)."""
    x = emb / emb.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    wn = w / w.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    return torch.softmax(s * (x @ wn.T), dim=-1)[:, 1]


def _make_eval_tree(root, *, n_clips=8, size=32, seed=0):
    """Face npys with MIXED lengths so pad-to-batch-max semantics are exercised."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    lengths = [2, 3, 4, 3, 2, 4, 3, 2][:n_clips]
    for i, T in enumerate(lengths):
        label = i % 2
        base = rng.uniform(0.25, 0.45) + 0.35 * label + rng.normal(0, 0.05)
        vid = np.clip(rng.normal(base, 0.12, (T, size, size, 3)), 0, 1)
        name = f"{'real' if label == 0 else 'fake'}_{i:03d}.npy"
        np.save(os.path.join(root, name), (vid * 255).astype(np.uint8))
    return root


def _make_audio_tree(root, *, n_clips=8, frames=6, seed=1):
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n_clips):
        label = i % 2
        mfcc = rng.normal(0.8 * label, 1.0, (frames, 13)).astype(np.float32)
        name = f"{'real' if label == 0 else 'fake'}_{i:03d}.npy"
        np.save(os.path.join(root, name), mfcc)
    return root


def _load_sorted(folder, transform):
    files = sorted(f for f in os.listdir(folder) if f.endswith(".npy"))
    items = [transform(np.load(os.path.join(folder, f))) for f in files]
    labels = np.asarray([0 if f.startswith("real_") else 1 for f in files])
    return files, items, labels


def _torch_visual_scores(model, w, folder):
    """The reference eval loop: sorted order, batches of BATCH, zero-pad to
    batch max, embed -> ArcFace -> softmax (/root/reference/test_visual.py:572-646
    + video_dataloader.py:53-67)."""
    _files, clips, labels = _load_sorted(folder, lambda a: a.astype(np.float32) / 255.0)
    probs = []
    with torch.no_grad():
        for i in range(0, len(clips), BATCH):
            chunk = clips[i : i + BATCH]
            Tm = max(c.shape[0] for c in chunk)
            batch = np.zeros((len(chunk), Tm) + chunk[0].shape[1:], np.float32)
            for j, c in enumerate(chunk):
                batch[j, : c.shape[0]] = c
            x = torch.from_numpy(batch).permute(0, 1, 4, 2, 3).contiguous()
            probs.extend(_arcface_probs(model.embed(x), w).numpy().tolist())
    return np.asarray(probs), labels


def _torch_audio_scores(model, folder):
    _files, clips, labels = _load_sorted(folder, lambda a: a.astype(np.float32))
    probs = []
    with torch.no_grad():
        for i in range(0, len(clips), BATCH):
            chunk = clips[i : i + BATCH]
            Tm = max(c.shape[0] for c in chunk)
            batch = np.zeros((len(chunk), Tm, 13), np.float32)
            for j, c in enumerate(chunk):
                batch[j, : c.shape[0]] = c
            x = torch.from_numpy(batch)[:, :, None, :].repeat(1, 1, 3, 1)  # channel x3
            probs.extend(model.score_audio(x).numpy().tolist())
    return np.asarray(probs), labels


def _sklearn_auc(y, s):
    from sklearn.metrics import roc_auc_score

    return float(roc_auc_score(y, s))


@pytest.fixture(scope="module")
def stacks(tmp_path_factory):
    """One weight set in both stacks + paired synthetic eval trees."""
    td = tmp_path_factory.mktemp("parity")
    torch.manual_seed(0)
    model = _TorchVisualRef().eval()
    af_w = torch.randn(2, HIDDEN)
    src = str(td / "ref.pth")
    torch.save({"model": model.state_dict(), "arcface": {"weight": af_w}}, src)
    bundle = str(td / "ref.npz")
    import_torch.main(["--src", src, "--dst", bundle], log=lambda s: None)

    faces = _make_eval_tree(str(td / "faces"))
    auds = _make_audio_tree(str(td / "audio"))
    return model, af_w, bundle, faces, auds, td


def test_visual_auc_parity_end_to_end(stacks):
    model, af_w, bundle, faces, _auds, td = stacks
    t_probs, t_labels = _torch_visual_scores(model, af_w, faces)
    t_auc = _sklearn_auc(t_labels, t_probs)

    scores_path = str(td / "scores_v.npz")
    results = test_visual.main(
        [
            "--test_folder", faces,
            "--ckpt_path", bundle,
            "--hidden_dim", str(HIDDEN),
            "--batch_size", str(BATCH),
            "--max_frames", "4",
            "--buckets", "4",
            "--compute_dtype", "float32",
            "--mask_padding", "false",  # fidelity: the reference's pad-consuming eval
            "--save_scores", scores_path,
        ],
        log=lambda s: None,
    )
    z = np.load(scores_path)
    # the loaders see the same sorted stems -> same clip order
    np.testing.assert_array_equal(z["labels"], t_labels)
    np.testing.assert_allclose(z["scores"], t_probs, rtol=1e-3, atol=1e-4)
    assert abs(results["AUC"] - t_auc) <= AUC_TOL
    # sanity: the synthetic signal is learnable-from-noise (non-degenerate ranking)
    assert np.std(t_probs) > 1e-4


def test_av_fused_auc_parity_end_to_end(stacks):
    model, af_w, bundle, faces, auds, td = stacks
    tv, labels = _torch_visual_scores(model, af_w, faces)
    ta, labels_a = _torch_audio_scores(model, auds)
    np.testing.assert_array_equal(labels, labels_a)
    fused = 0.5 * tv + 0.5 * ta
    t_auc = _sklearn_auc(labels, fused)

    scores_path = str(td / "scores_av.npz")
    results = test_av_fused.main(
        [
            "--video_folder", faces,
            "--audio_folder", auds,
            "--visual_ckpt", bundle,
            "--audio_ckpt", bundle,  # same skeleton bundle serves both heads
            "--visual_hidden", str(HIDDEN),
            "--audio_hidden", str(HIDDEN),
            "--batch_size", str(BATCH),
            "--max_frames", "4",
            "--video_buckets", "4",
            "--audio_buckets", "6",
            "--compute_dtype", "float32",
            "--mask_padding", "false",
            "--save_scores", scores_path,
        ],
        log=lambda s: None,
    )
    z = np.load(scores_path)
    np.testing.assert_array_equal(z["labels"], labels)
    np.testing.assert_allclose(z["visual"], tv, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(z["audio"], ta, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(z["fused"], fused, rtol=1e-3, atol=1e-4)
    assert abs(results["fused"]["AUC"] - t_auc) <= AUC_TOL
    assert abs(results["visual"]["AUC"] - _sklearn_auc(labels, tv)) <= AUC_TOL
    assert abs(results["audio"]["AUC"] - _sklearn_auc(labels, ta)) <= AUC_TOL
